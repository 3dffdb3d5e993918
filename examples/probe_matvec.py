"""Micro-probe: per-component cost of the transposed-regime CG Schur matvec
at the 2M-obs / 500k-pt bench shape (I=200, NR=10).

Each component is timed as a dependent chain inside one jitted fori_loop
(see profile_ba_large.py's methodology note — independent dispatches overlap
on the axon backend, so only chained evaluations measure latency).

Components probed:
  oh_expand   [I,6] -> [6,O] fused one-hot matmul (idx_expand_t direction)
  oh_reduce   [6,O] -> [I,6] fused one-hot matmul (_seg_mm_t direction)
  oh_pair     both directions back-to-back (shared one-hot subexpression?)
  bt_read     B_apply_T + B_apply (two full Bt passes) without expansions
  lane_gather [3,O] minor-axis permutation gather (image-grid alternative)
  row_gather  [O,8] row gather (row-major alternative)
  grid_reduce [3,O] -> [3,Np] reshape-sum + broadcast back
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
    print(f"{label:40s} {ms:8.2f} ms/iter", flush=True)
    return ms


def main(I=200, Np=500_000, T=4, NR=10):
    O = Np * T
    rng = np.random.default_rng(0)
    img_idx = jnp.asarray(
        ((rng.integers(0, I, Np)[:, None] + np.arange(T)[None]) % I)
        .astype(np.int32).reshape(-1))
    perm = jnp.asarray(rng.permutation(O).astype(np.int32))
    Bt = jnp.asarray(rng.normal(size=(NR * 3, O)).astype(np.float32))
    vp0 = jnp.asarray(rng.normal(size=(I, 6)).astype(np.float32))

    HI = jax.lax.Precision.HIGHEST

    def mk(stage_fn):
        def make(n):
            @jax.jit
            def run():
                def body(i, carry):
                    vp, acc = carry
                    out = stage_fn(vp)
                    s = jnp.sum(out)
                    return (vp + 1e-30 * s, acc + s)
                _, acc = jax.lax.fori_loop(0, n, body, (vp0, 0.0))
                return acc
            return run
        return make

    def oh_expand(vp):
        oh = (img_idx[None, :] == jnp.arange(I, dtype=jnp.int32)[:, None]
              ).astype(jnp.float32)
        return jnp.dot(vp.T, oh, preferred_element_type=jnp.float32,
                       precision=HI)

    chain_ms(mk(oh_expand), "oh_expand [6,O] (HIGHEST)")

    def oh_expand_def(vp):
        oh = (img_idx[None, :] == jnp.arange(I, dtype=jnp.int32)[:, None]
              ).astype(jnp.float32)
        return jnp.dot(vp.T, oh, preferred_element_type=jnp.float32)

    chain_ms(mk(oh_expand_def), "oh_expand [6,O] (default prec)")

    def oh_reduce(vp):
        rows = jnp.broadcast_to(vp[0, :, None], (6, O))
        oh = (img_idx[:, None] == jnp.arange(I, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)
        return jnp.dot(rows, oh, preferred_element_type=jnp.float32,
                       precision=HI)

    chain_ms(mk(oh_reduce), "oh_reduce [I,6] (HIGHEST)")

    def bt_read(vp):
        w = jnp.broadcast_to(vp[0, 0], (3, O)) + 1.0
        s = None
        for a in range(NR):
            term = Bt[3 * a:3 * a + 3] * w
            s = term if s is None else s + term
        # second pass: stack-apply
        u = jnp.stack([jnp.sum(Bt[3 * a:3 * a + 3] * s, axis=0)
                       for a in range(NR)], axis=0)
        return u

    chain_ms(mk(bt_read), "bt 2x full read + mults")

    def lane_gather(vp):
        y = jnp.broadcast_to(vp[0, :3, None], (3, O)) + 1.0
        return y[:, perm]

    chain_ms(mk(lane_gather), "lane permute-gather [3,O]")

    def lane_gather8(vp):
        y = jnp.broadcast_to(vp[0, :, None], (6, O)) + 1.0
        y = jnp.concatenate([y, y[:2]], axis=0)
        return y[:, perm]

    chain_ms(mk(lane_gather8), "lane permute-gather [8,O]")

    def row_gather(vp):
        y = jnp.broadcast_to(vp[0, :, None], (6, O)) + 1.0
        yr = jnp.concatenate([y, y[:2]], axis=0).T        # [O, 8]
        return yr[perm].T

    chain_ms(mk(row_gather), "row permute-gather [O,8]")

    def grid_reduce(vp):
        y = jnp.broadcast_to(vp[0, :3, None], (3, O)) + 1.0
        t = y.reshape(3, Np, T).sum(-1)
        return jnp.broadcast_to(t[:, :, None], (3, Np, T)).reshape(3, O)

    chain_ms(mk(grid_reduce), "grid reduce+broadcast [3,O]")

    def oh_expand_chunked(vp):
        # scan over O-chunks so the one-hot stays VMEM-resident
        CH = 65536
        nch = O // CH
        idxc = img_idx.reshape(nch, CH)

        def chunk(c, ic):
            oh = (ic[None, :] == jnp.arange(I, dtype=jnp.int32)[:, None]
                  ).astype(jnp.float32)
            y = jnp.dot(vp.T, oh, preferred_element_type=jnp.float32,
                        precision=HI)
            return c, y
        _, ys = jax.lax.scan(chunk, 0.0, idxc)       # [nch, 6, CH]
        return jnp.moveaxis(ys, 0, 1).reshape(6, O)

    chain_ms(mk(oh_expand_chunked), "oh_expand chunked-scan [6,O] (HIGHEST)")

    def oh_reduce_chunked(vp):
        CH = 65536
        nch = O // CH
        idxc = img_idx.reshape(nch, CH)
        rows = jnp.broadcast_to(vp[0, :, None], (6, O)).reshape(6, nch, CH)

        def chunk(acc, inp):
            ic, rc = inp
            oh = (ic[:, None] == jnp.arange(I, dtype=jnp.int32)[None, :]
                  ).astype(jnp.float32)
            return acc + jnp.dot(rc, oh, preferred_element_type=jnp.float32,
                                 precision=HI), None
        acc, _ = jax.lax.scan(chunk, jnp.zeros((6, I), jnp.float32),
                              (idxc, jnp.moveaxis(rows, 1, 0)))
        return acc

    chain_ms(mk(oh_reduce_chunked), "oh_reduce chunked-scan [I,6] (HIGHEST)")

    def matvec_like_chunked(vp):
        """Full Schur-term matvec shaped like s_matvec but with ONE fused
        chunk scan: expand rows, B^T, (grid-reduce+broadcast elided to keep
        chunk-local), B, reduce back — all per 65536-chunk."""
        CH = 65536
        nch = O // CH
        idxc = img_idx.reshape(nch, CH)
        Btc = Bt.reshape(NR * 3, nch, CH)

        def chunk(acc, inp):
            ic, bc = inp                              # [CH], [NR*3, CH]
            oh = (ic[None, :] == jnp.arange(I, dtype=jnp.int32)[:, None]
                  ).astype(jnp.float32)               # [I, CH]
            rows = jnp.dot(vp.T, oh, preferred_element_type=jnp.float32,
                           precision=HI)              # [6, CH]
            s = None
            for a in range(6):
                term = rows[a][None, :] * bc[3 * a:3 * a + 3]
                s = term if s is None else s + term   # [3, CH]
            u = jnp.stack([jnp.sum(bc[3 * a:3 * a + 3] * s, axis=0)
                           for a in range(6)], axis=0)  # [6, CH]
            return acc + jnp.dot(u, oh.T,
                                 preferred_element_type=jnp.float32,
                                 precision=HI), None
        acc, _ = jax.lax.scan(chunk, jnp.zeros((6, I), jnp.float32),
                              (idxc, jnp.moveaxis(Btc, 1, 0)))
        return acc

    chain_ms(mk(matvec_like_chunked), "fused chunked matvec (no pt step)")

    def vgather_table(vp):
        # expansion via per-slot [Np] gathers: vp.T[:, img_idx] done as T
        # gathers of [6, Np] — same bytes, sublane-friendlier?
        img2 = img_idx.reshape(Np, T)
        outs = [vp.T[:, img2[:, t]] for t in range(T)]
        return jnp.stack(outs, -1).reshape(6, O)

    chain_ms(mk(vgather_table), "expand via T lane gathers [6,Np]")


if __name__ == "__main__":
    main()
