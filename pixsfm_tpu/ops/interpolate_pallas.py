"""Pallas TPU kernel: fused gather + bicubic interpolation + L2 normalization.

The XLA path (base/interpolation.py) first materializes the gathered patch batch
``patches[rows] -> [B, ps, ps, C]`` in HBM and then contracts it — every LM
iteration re-reads ~64KB per keypoint twice. This kernel fuses the two: each
grid step DMAs its patch row directly from HBM into VMEM (row index via scalar
prefetch), builds the dense Catmull-Rom weight vectors in-register, runs the
separable contractions on the MXU, applies the L2 chain rule, and writes only
the ``[B, C] x 3`` outputs — the direct analogue of the reference's fused AVX2
``CubicHermiteSplineSIMD`` path (cubic_hermite_spline_simd.h:56-193), one level
up the memory hierarchy.

Use :func:`interpolate_batch` — it dispatches to the kernel on TPU and falls
back to the reference jnp implementation elsewhere (and in interpret mode for
tests).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..base.interpolation import InterpolationConfig, interpolate_with_grad

__all__ = ["interpolate_batch", "pallas_available"]


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _weights4(t):
    t2 = t * t
    t3 = t2 * t
    w = jnp.stack([
        -0.5 * t3 + t2 - 0.5 * t,
        1.5 * t3 - 2.5 * t2 + 1.0,
        -1.5 * t3 + 2.0 * t2 + 0.5 * t,
        0.5 * t3 - 0.5 * t2,
    ])
    dw = jnp.stack([
        -1.5 * t2 + 2.0 * t - 0.5,
        4.5 * t2 - 5.0 * t,
        -4.5 * t2 + 4.0 * t + 0.5,
        1.5 * t2 - t,
    ])
    return w, dw


def _dense_weights(x, size, w4):
    """Scatter 4 taps at clamped positions into a dense [1, size] row vector."""
    base = jnp.floor(x).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1)
    out = jnp.zeros((1, size), jnp.float32)
    for k in range(4):
        idx = jnp.clip(base + (k - 1), 0, size - 1)
        out = out + jnp.where(iota == idx, w4[k], 0.0)
    return out


def _make_kernel(ps: int, C: int, l2_normalize: bool, block_b: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(rows_ref, wr_ref, dwr_ref, wc_ref, dwc_ref, patches_hbm,
               f_ref, dfdr_ref, dfdc_ref, scratch, sem):
        b0 = pl.program_id(0) * block_b

        def start_dma(i, _):
            row = rows_ref[b0 + i]
            pltpu.make_async_copy(patches_hbm.at[row], scratch.at[i],
                                  sem.at[i]).start()
            return 0

        jax.lax.fori_loop(0, block_b, start_dma, 0)

        def compute(i, _):
            row = rows_ref[b0 + i]
            pltpu.make_async_copy(patches_hbm.at[row], scratch.at[i],
                                  sem.at[i]).wait()
            patch = scratch[i].astype(jnp.float32).reshape(ps, ps * C)
            wr = wr_ref[i, :].reshape(1, ps)
            dwr = dwr_ref[i, :].reshape(1, ps)
            wc = wc_ref[i, :].reshape(1, ps)
            dwc = dwc_ref[i, :].reshape(1, ps)

            def contract(wrow, wcol):
                rowmix = jnp.dot(wrow, patch,
                                 preferred_element_type=jnp.float32)
                return jnp.dot(wcol, rowmix.reshape(ps, C),
                               preferred_element_type=jnp.float32)[0]

            f = contract(wr, wc)
            dr = contract(dwr, wc)
            dc = contract(wr, dwc)
            if l2_normalize:
                inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(f * f), 1e-24))
                fn = f * inv
                dr = dr * inv
                dr = dr - jnp.sum(fn * dr) * fn
                dc = dc * inv
                dc = dc - jnp.sum(fn * dc) * fn
                f = fn
            f_ref[i, :] = f
            dfdr_ref[i, :] = dr
            dfdc_ref[i, :] = dc
            return 0

        jax.lax.fori_loop(0, block_b, compute, 0)

    return kernel


def _dense_weights_batch(x, size):
    """[B] coords -> ([B, size] weights, [B, size] d/dx weights), clamped taps."""
    t = x - jnp.floor(x)
    w4, dw4 = jax.vmap(_weights4)(t)          # [B, 4] each
    base = jnp.floor(x).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1)
    w = jnp.zeros((x.shape[0], size), jnp.float32)
    dw = jnp.zeros((x.shape[0], size), jnp.float32)
    for k in range(4):
        idx = jnp.clip(base + (k - 1), 0, size - 1)[:, None]
        hit = (iota == idx)
        w = w + jnp.where(hit, w4[:, k:k + 1], 0.0)
        dw = dw + jnp.where(hit, dw4[:, k:k + 1], 0.0)
    return w, dw


def _pallas_interpolate(patches, rows, r, c, config: InterpolationConfig,
                        block_b: int = 8, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, ps, ps2, C = patches.shape
    B = rows.shape[0]
    assert B % block_b == 0, "pad batch to a multiple of block_b"

    # dense Catmull-Rom weights precomputed by XLA (tiny); the kernel is pure
    # DMA + MXU contractions + normalization
    wr, dwr = _dense_weights_batch(r.astype(jnp.float32), ps)
    wc, dwc = _dense_weights_batch(c.astype(jnp.float32), ps)

    kernel = _make_kernel(ps, C, config.l2_normalize, block_b)

    def blk(i, *_):  # index_map also receives the scalar-prefetch refs
        return (i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, ps), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ps), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ps), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ps), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # patches stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((block_b, C), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, C), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, C), blk, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, ps, ps, C), patches.dtype),
            pltpu.SemaphoreType.DMA((block_b,)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((B, C), jnp.float32)] * 3
    f, dfdr, dfdc = pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret)(rows.astype(jnp.int32), wr, dwr, wc, dwc,
                             patches)
    return f, dfdr, dfdc


def interpolate_batch(patches, rows, r, c,
                      config: Optional[InterpolationConfig] = None,
                      use_pallas: Optional[bool] = None,
                      interpret: bool = False):
    """Batched (f, dfdr, dfdc) at patch-pixel coords for ``rows`` of a packed
    ``[N, ps, ps, C]`` array. Pallas-fused on TPU, jnp fallback elsewhere."""
    config = config or InterpolationConfig()
    if use_pallas is None:
        use_pallas = (pallas_available() and config.mode == "BICUBIC"
                      and not config.ncc_normalize)
    elif use_pallas and not pallas_available():
        use_pallas = False  # CPU/tests: transparent fallback
    if use_pallas or interpret:
        return _pallas_interpolate(patches, rows, r, c, config,
                                   interpret=interpret)

    gathered = patches[rows]

    def one(p, rr, cc):
        return interpolate_with_grad(p, rr, cc, config)

    return jax.vmap(one)(gathered, r, c)
