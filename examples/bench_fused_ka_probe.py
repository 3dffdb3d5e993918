"""Probe: can a VMEM-resident fused KA-LM kernel beat the XLA row gather?

VERDICT round-1 weak item #4 asked to COST the higher-arithmetic-intensity
reformulation of the KA solver: a Pallas kernel that keeps one problem's
patches resident in VMEM across ALL LM iterations (grid over problems),
instead of the lock-stepped XLA program that re-gathers every keypoint's
4-row bicubic window from HBM each iteration (~100 MB/iter at bench shapes,
~0.24 ms of the 0.63 ms iteration).

The kernel-side unknown is the per-problem interpolation cost: with the
whole [K, ps, ps, C] patch stack in VMEM, each keypoint's bicubic eval is a
block-diagonal contraction (per-k [2,16]x[16,W*C] matmuls) that has no
MXU-efficient shape, and problems are SERIALIZED over the grid (one
TensorCore). Break-even is ~5 us per problem-iteration:

    XLA path:   0.63 ms / 128 problems  = 4.9 us per problem-iteration
    kernel:     interp(t?) + assembly ~0.5 + CG ~2.4 + LM ~0.5 us

This probe measures exactly that unknown: a kernel with one problem's
patches in VMEM runs T interpolation iterations (dense-tap row+column
mixes, the same math as base.interpolation._bicubic_full) over K keypoints
whose positions change every iteration (so nothing hoists), and reports
us / (problem * iteration). Compare against the XLA row-gather figure
(0.24 ms / 128 = 1.9 us interp-only, 4.9 us full-iteration).

Run on the TPU:  python examples/bench_fused_ka_probe.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_probe(P, K, ps, C, T, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(kp_ref, patches_ref, out_ref):
        patch = patches_ref[0]                       # [K, ps, ps, C]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)

        def dense_taps(x):
            base = jnp.floor(x)
            t = x - base
            t2 = t * t
            t3 = t2 * t
            w4 = jnp.stack([-0.5 * t3 + t2 - 0.5 * t,
                            1.5 * t3 - 2.5 * t2 + 1.0,
                            -1.5 * t3 + 2.0 * t2 + 0.5 * t,
                            0.5 * t3 - 0.5 * t2], axis=-1)
            dw4 = jnp.stack([-1.5 * t2 + 2.0 * t - 0.5,
                             4.5 * t2 - 5.0 * t,
                             -4.5 * t2 + 4.0 * t + 0.5,
                             1.5 * t2 - t], axis=-1)
            basei = base.astype(jnp.int32)
            w = jnp.zeros((K, ps), jnp.float32)
            dw = jnp.zeros((K, ps), jnp.float32)
            for k in range(4):
                idx = jnp.clip(basei + (k - 1), 0, ps - 1)[:, None]
                hit = iota_w == idx
                w = w + jnp.where(hit, w4[:, k:k + 1], 0.0)
                dw = dw + jnp.where(hit, dw4[:, k:k + 1], 0.0)
            return w, dw

        def body(i, acc):
            kp = kp_ref[0] + 0.003 * i               # [K, 2] moving queries
            wc, dwc = dense_taps(kp[:, 0])
            wr, dwr = dense_taps(kp[:, 1])
            p32 = patch.astype(jnp.float32).reshape(K, ps, ps * C)
            # slice-free batched MXU matmuls (einsum/sliced reductions hit
            # Mosaic layout restrictions under shape_invariant_numerics)
            # lhs needs a (unit) non-contracting dim: Mosaic's batched dot
            # rejects pure batched mat-vec shapes
            dims2 = (((2,), (1,)), ((0,), (0,)))

            def rowmix(w):       # [K, 1, ps] x [K, ps, ps*C] -> [K, ps, C]
                out = jax.lax.dot_general(
                    w[:, None, :], p32, dims2,
                    preferred_element_type=jnp.float32)
                return out.reshape(K, ps, C)

            rm_wr = rowmix(wr)
            rm_dwr = rowmix(dwr)

            def mixc(w, rm):     # [K, 1, ps] x [K, ps, C] -> [K, C]
                return jax.lax.dot_general(
                    w[:, None, :], rm, dims2,
                    preferred_element_type=jnp.float32).reshape(K, C)

            f = mixc(wc, rm_wr)
            dfdc = mixc(dwc, rm_wr)
            dfdr = mixc(wc, rm_dwr)
            # L2 + chain rule (the real hot path applies it every eval)
            inv = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(f * f, axis=-1, keepdims=True), 1e-24))
            fn = f * inv
            dfdr = dfdr * inv
            dfdr = dfdr - jnp.sum(fn * dfdr, -1, keepdims=True) * fn
            dfdc = dfdc * inv
            dfdc = dfdc - jnp.sum(fn * dfdc, -1, keepdims=True) * fn
            return acc + jnp.sum(fn) + jnp.sum(dfdr) + jnp.sum(dfdc)

        acc = jax.lax.fori_loop(0, T, body, jnp.float32(0))
        out_ref[0] = jnp.full((8, 128), acc, jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, K, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, ps, ps, C), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 8, 128), jnp.float32),
    )
    return call


def main():
    P, K, ps, C, T = 32, 48, 16, 128, 50
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    kp = jnp.asarray(rng.uniform(5.0, 9.0, (P, K, 2)).astype(np.float32))
    patches = jnp.asarray(
        rng.normal(0, 1, (P, K, ps, ps, C)).astype(np.float32)).astype(dt)

    call = jax.jit(make_probe(P, K, ps, C, T, dt))
    t0 = time.time()
    out = call(kp, patches)
    out.block_until_ready()
    _ = float(np.asarray(out)[0, 0, 0])
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    best = None
    for _ in range(5):
        t0 = time.time()
        o = None
        for _ in range(4):
            o = call(kp, patches)
        _ = float(np.asarray(o)[0, 0, 0])
        dt_run = (time.time() - t0) / 4
        best = dt_run if best is None else min(best, dt_run)
    per = best / (P * T) * 1e6
    print(f"fused interp probe: {best * 1e3:.2f} ms for P={P} T={T} "
          f"-> {per:.2f} us / problem-iteration "
          f"(XLA row-gather interp-only reference: ~1.9 us; "
          f"full-iteration budget: ~4.9 us)")


if __name__ == "__main__":
    main()
