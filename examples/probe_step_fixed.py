"""Probe 3: fixed (CG-count-independent) costs inside schur_step_t at the
2M-obs bench shape — batched small inverses, the jax.scipy CG plumbing with
a free matvec, _inv3x3_t on 500k planes, and the pred reduction."""

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


def main(I=200, Np=500_000, T=4, NR=10):
    O = Np * T
    rng = np.random.default_rng(0)
    H0 = rng.normal(size=(I, 6, 6)).astype(np.float32)
    H0 = H0 @ H0.transpose(0, 2, 1) + 6 * np.eye(6, dtype=np.float32)
    Hpp = jnp.asarray(H0)
    Vt0 = rng.normal(size=(3, 3, Np)).astype(np.float32)
    Vt0 = (np.einsum("abp,cbp->acp", Vt0, Vt0)
           + 3 * np.eye(3, dtype=np.float32)[:, :, None]).astype(np.float32)
    Vt = jnp.asarray(Vt0)
    gxt = jnp.asarray(rng.normal(size=(3, Np)).astype(np.float32))

    def mk(stage_fn, v0):
        def make(n):
            @jax.jit
            def run():
                def body(i, carry):
                    v, acc = carry
                    s = jnp.sum(stage_fn(v))
                    return (v + 1e-30 * s, acc + s)
                _, acc = jax.lax.fori_loop(0, n, body, (v0, 0.0))
                return acc
            return run
        return make

    chain_ms(mk(lambda H: jnp.linalg.inv(H), Hpp),
             "jnp.linalg.inv [200,6,6]")
    def inv3x3_t(At):
        a, b, c = At[0, 0], At[0, 1], At[0, 2]
        d, e, f = At[1, 0], At[1, 1], At[1, 2]
        g, h, i = At[2, 0], At[2, 1], At[2, 2]
        A11 = e * i - f * h
        A12 = c * h - b * i
        A13 = b * f - c * e
        A21 = f * g - d * i
        A22 = a * i - c * g
        A23 = c * d - a * f
        A31 = d * h - e * g
        A32 = b * g - a * h
        A33 = a * e - b * d
        det = a * A11 + b * A21 + c * A31
        inv_det = 1.0 / det
        return jnp.stack([
            jnp.stack([A11, A12, A13]),
            jnp.stack([A21, A22, A23]),
            jnp.stack([A31, A32, A33])]) * inv_det[None, None, :]

    chain_ms(mk(inv3x3_t, Vt), "_inv3x3_t [3,3,500k]")

    def pred_like(g):
        d = g * 2.0
        g_all = jnp.concatenate([jnp.ones(1206), jnp.ones(4),
                                 g.T.reshape(-1)])
        d_all = jnp.concatenate([jnp.ones(1206), jnp.ones(4),
                                 d.T.reshape(-1)])
        return 0.5 * jnp.sum(d_all * (1e-4 * d_all - g_all))

    chain_ms(mk(pred_like, gxt), "pred concat+reduce (incl [3,Np].T)")

    from jax.scipy.sparse.linalg import cg as _cg

    def cg_free(g):
        vp = jnp.broadcast_to(g[0, :6], (I, 6))
        vc = jnp.ones((1, 4), jnp.float32)

        def mv(v):
            a, b = v
            return (a * 1.001, b * 1.001)
        (dp, dc), _ = _cg(mv, (vp, vc), maxiter=25, tol=0.1)
        return dp

    chain_ms(mk(cg_free, gxt), "jax cg plumbing, 25 iters, free matvec")


if __name__ == "__main__":
    main()
