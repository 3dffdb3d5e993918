"""Probe 3: fused chunked Schur matvec variants — static-loop (VPU)
contractions vs einsum, one-hot precision (HIGHEST / default / hi-lo split),
and chunk-size sweep."""

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
    print(f"{label:52s} {ms:8.2f} ms/iter", flush=True)
    return ms


HI = jax.lax.Precision.HIGHEST


def oh_dot(vT, idx, S, mode):
    """[d, S-table] expansion dot: rows = vT @ onehot(idx). modes:
    'highest' exact 3-pass; 'default' bf16 1-pass; 'split' 2-pass hi/lo
    (exact to ~1e-7: the one-hot is exact in bf16, v split into bf16 parts)."""
    oh = (idx[None, :] == jnp.arange(S, dtype=jnp.int32)[:, None]
          ).astype(jnp.float32)
    if mode == "highest":
        return jnp.dot(vT, oh, preferred_element_type=jnp.float32,
                       precision=HI)
    if mode == "default":
        return jnp.dot(vT, oh, preferred_element_type=jnp.float32)
    hi = jax.lax.convert_element_type(
        jax.lax.convert_element_type(vT, jnp.bfloat16), jnp.float32)
    lo = vT - hi
    return (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
            + jnp.dot(lo, oh, preferred_element_type=jnp.float32))


def oh_dot_r(u, idx, S, mode):
    """[d, n] -> [S, d] reduction dot through the transposed one-hot."""
    oh = (idx[:, None] == jnp.arange(S, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)
    if mode == "highest":
        return jnp.dot(u, oh, preferred_element_type=jnp.float32,
                       precision=HI).T
    if mode == "default":
        return jnp.dot(u, oh, preferred_element_type=jnp.float32).T
    hi = jax.lax.convert_element_type(
        jax.lax.convert_element_type(u, jnp.bfloat16), jnp.float32)
    lo = u - hi
    return (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
            + jnp.dot(lo, oh, preferred_element_type=jnp.float32)).T


def main(I=200, Np=500_000, T=4, NR=10):
    O = Np * T
    rng = np.random.default_rng(0)
    img_np = ((rng.integers(0, I, Np)[:, None] + np.arange(T)[None]) % I
              ).astype(np.int32).reshape(-1)
    Bt_np = rng.normal(size=(NR * 3, O)).astype(np.float32)
    Vinv_np = (rng.normal(size=(3, 3, Np)) * 0.1).astype(np.float32)
    vf0 = jnp.asarray(rng.normal(size=(I, NR)).astype(np.float32))

    def build(CH):
        nch = (O + CH - 1) // CH
        pad_O = nch * CH
        npc = CH // T
        pad_pts = nch * npc
        img_pad = np.concatenate([img_np, img_np[:pad_O - O]])
        Bt = np.concatenate(
            [Bt_np, np.zeros((NR * 3, pad_O - O), np.float32)], axis=1)
        Vinv = np.concatenate([Vinv_np, Vinv_np[:, :, :pad_pts - Np]],
                              axis=2)
        return dict(
            idxc=jnp.asarray(img_pad.reshape(nch, CH)),
            Btc=jnp.asarray(np.moveaxis(
                Bt.reshape(NR * 3, nch, CH), 1, 0)),
            Vinv=jnp.asarray(Vinv)), nch, npc, CH

    def mk(stage_fn, ops):
        def make(n):
            @jax.jit
            def run(ops):
                def body(i, carry):
                    v, acc = carry
                    s = jnp.sum(stage_fn(v, ops))
                    return (v + 1e-30 * s, acc + s)
                _, acc = jax.lax.fori_loop(0, n, body, (vf0, 0.0))
                return acc
            return lambda: run(ops)
        return make

    def fused(mode, nch, npc, CH, loops=True):
        def matvec(vf, ops):
            def chunk(acc, inp):
                ic, bc, ci = inp
                rows = oh_dot(vf.T, ic, I, mode)          # [NR, CH]
                b = bc.reshape(NR, 3, CH)
                if loops:
                    s = None
                    for a in range(NR):
                        t_ = b[a] * rows[a][None, :]
                        s = t_ if s is None else s + t_   # [3, CH]
                else:
                    s = jnp.einsum("aco,ao->co", b, rows)
                t = s.reshape(3, npc, T).sum(-1)
                vi = jax.lax.dynamic_slice(
                    ops["Vinv"], (0, 0, ci * npc), (3, 3, npc))
                w = jnp.einsum("abp,bp->ap", vi, t)
                wl = jnp.broadcast_to(w[:, :, None],
                                      (3, npc, T)).reshape(3, CH)
                if loops:
                    u = jnp.concatenate(
                        [jnp.sum(b[a] * wl, axis=0, keepdims=True)
                         for a in range(NR)], axis=0)     # [NR, CH]
                else:
                    u = jnp.einsum("aco,co->ao", b, wl)
                return acc + oh_dot_r(u, ic, I, mode), None
            acc, _ = jax.lax.scan(
                chunk, jnp.zeros((I, NR), jnp.float32),
                (ops["idxc"], ops["Btc"],
                 jnp.arange(nch, dtype=jnp.int32)))
            return acc
        return matvec

    ops, nch, npc, CH = build(65536)
    for mode in ("highest", "split", "default"):
        chain_ms(mk(fused(mode, nch, npc, CH), ops),
                 f"fused loops CH=65536 oh={mode}")
    chain_ms(mk(fused("highest", nch, npc, CH, loops=False), ops),
             "fused einsum CH=65536 oh=highest")
    for CH2 in (32768, 131072, 262144):
        ops2, nch2, npc2, _ = build(CH2)
        chain_ms(mk(fused("split", nch2, npc2, CH2), ops2),
                 f"fused loops CH={CH2} oh=split")


if __name__ == "__main__":
    main()
