"""Probe 2: the fused chunked Schur matvec (everything VMEM-resident per
T-aligned obs chunk) vs the current full-array formulation's 13 ms.

Chunks of CH observations with CH % T == 0 in grid order contain complete
tracks, so the point reduce/broadcast stays chunk-local. Per-chunk work:
one-hot expand rows -> B^T -> grid-reduce -> Vinv -> broadcast -> B ->
one-hot reduce. HBM traffic per matvec ~= one Bt pass + Vinv slices.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def chain_ms(make_loop, label, lo=2, hi=12):
    ts = {}
    for n in (lo, hi):
        fn = make_loop(n)
        jax.block_until_ready(fn())
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best or 9e9, time.perf_counter() - t0)
        ts[n] = best
    ms = (ts[hi] - ts[lo]) / (hi - lo) * 1e3
    print(f"{label:44s} {ms:8.2f} ms/iter", flush=True)
    return ms


def main(I=200, Np=500_000, T=4, NR=10, CH=65536):
    O = Np * T
    nch = (O + CH - 1) // CH
    pad_O = nch * CH
    npc = CH // T
    pad_pts = nch * npc
    rng = np.random.default_rng(0)
    img_np = ((rng.integers(0, I, Np)[:, None] + np.arange(T)[None]) % I
              ).astype(np.int32).reshape(-1)
    img_pad = np.concatenate([img_np, img_np[:pad_O - O]])
    img_idx = jnp.asarray(img_pad)
    # Bt zero-padded on the padding tail (padded obs contribute nothing)
    Bt_np = rng.normal(size=(NR * 3, O)).astype(np.float32)
    Bt = jnp.asarray(np.concatenate(
        [Bt_np, np.zeros((NR * 3, pad_O - O), np.float32)], axis=1))
    Vinv_np = rng.normal(size=(3, 3, Np)).astype(np.float32) * 0.1
    Vinv = jnp.asarray(np.concatenate(
        [Vinv_np, Vinv_np[:, :, :pad_pts - Np]], axis=2))
    vp0 = jnp.asarray(rng.normal(size=(I, 6)).astype(np.float32))
    # pretend intrinsics rows ride along: vfull [I, NR] (6 pose + 4 "cam")
    vf0 = jnp.asarray(rng.normal(size=(I, NR)).astype(np.float32))

    HI = jax.lax.Precision.HIGHEST
    idxc = img_idx.reshape(nch, CH)
    Btc = jnp.moveaxis(Bt.reshape(NR * 3, nch, CH), 1, 0)   # [nch, 30, CH]

    def mk(stage_fn, v0):
        """stage_fn(v, ops) with the big operands passed as jit ARGUMENTS
        (closing over them bakes ~300 MB of consts into the program, which
        the remote compile endpoint rejects with HTTP 413)."""
        big_ops = dict(Bt=Bt, Btc=Btc, idxc=idxc, Vinv=Vinv,
                       img_idx=img_idx)

        def make(n):
            @jax.jit
            def run(ops):
                def body(i, carry):
                    v, acc = carry
                    out = stage_fn(v, ops)
                    s = jnp.sum(out)
                    return (v + 1e-30 * s, acc + s)
                _, acc = jax.lax.fori_loop(0, n, body, (v0, 0.0))
                return acc
            return lambda: run(big_ops)
        return make

    def fused_matvec(vf, ops):
        """u[I, NR] = sum_o rows_o -> B^T -> grid reduce -> Vinv ->
        broadcast -> B -> reduce rows; chunk-local except Vinv slices."""
        def chunk(acc, inp):
            ic, bc, ci = inp                        # [CH], [30, CH], []
            oh = (ic[None, :] == jnp.arange(I, dtype=jnp.int32)[:, None]
                  ).astype(jnp.float32)             # [I, CH]
            rows = jnp.dot(vf.T, oh, preferred_element_type=jnp.float32,
                           precision=HI)            # [NR, CH]
            b = bc.reshape(NR, 3, CH)
            s = jnp.einsum("aco,ao->co", b, rows)   # [3, CH]
            t = s.reshape(3, npc, T).sum(-1)        # [3, npc]
            vi = jax.lax.dynamic_slice(ops["Vinv"], (0, 0, ci * npc),
                                       (3, 3, npc))
            w = jnp.einsum("abp,bp->ap", vi, t)     # [3, npc]
            wl = jnp.broadcast_to(w[:, :, None],
                                  (3, npc, T)).reshape(3, CH)
            u = jnp.einsum("aco,co->ao", b, wl)     # [NR, CH]
            return acc + jnp.dot(u, oh.T, preferred_element_type=jnp.float32,
                                 precision=HI).T, None
        acc, _ = jax.lax.scan(
            chunk, jnp.zeros((I, NR), jnp.float32),
            (ops["idxc"], ops["Btc"], jnp.arange(nch, dtype=jnp.int32)))
        return acc

    chain_ms(mk(fused_matvec, vf0), "fused chunked matvec (full, T-local pt)")

    def einsum_matvec(vf, ops):
        """Same math on full arrays with reshape-einsum instead of the
        static row-slice loops (isolates the slicing tax)."""
        oh = (ops["img_idx"][None, :]
              == jnp.arange(I, dtype=jnp.int32)[:, None]).astype(jnp.float32)
        rows = jnp.dot(vf.T, oh, preferred_element_type=jnp.float32,
                       precision=HI)                # [NR, pad_O]
        b = ops["Bt"].reshape(NR, 3, pad_O)
        s = jnp.einsum("aco,ao->co", b, rows)
        t = s[:, :O].reshape(3, Np, T).sum(-1)
        w = jnp.einsum("abp,bp->ap", ops["Vinv"][:, :, :Np], t)
        wl = jnp.broadcast_to(w[:, :, None], (3, Np, T)).reshape(3, O)
        wl = jnp.concatenate(
            [wl, jnp.zeros((3, pad_O - O), jnp.float32)], axis=1)
        u = jnp.einsum("aco,co->ao", b, wl)
        return jnp.dot(u, oh.T, preferred_element_type=jnp.float32,
                       precision=HI).T

    chain_ms(mk(einsum_matvec, vf0), "full-array einsum matvec (no chunking)")

    def bt_einsum_only(vp, ops):
        rows = jnp.broadcast_to(vp[0, :, None], (6, pad_O)) + 1.0
        rows = jnp.concatenate([rows, rows[:4]], axis=0)
        b = ops["Bt"].reshape(NR, 3, pad_O)
        s = jnp.einsum("aco,ao->co", b, rows)
        u = jnp.einsum("aco,co->ao", b, s)
        return u

    chain_ms(mk(bt_einsum_only, vp0), "bt 2x pass via reshape-einsum")


if __name__ == "__main__":
    main()
