"""Micro-profile the KA system evaluation pieces on the current backend.

Each stage runs LOOPED (lax.fori_loop, 20 steps, output feeding back into the
input) inside a single jitted program, so per-dispatch overhead and the remote
backend's async completion semantics don't distort the numbers. All arrays are
jit ARGUMENTS (closed-over device constants get embedded into the compile
request, which the remote-compile tunnel rejects at ~MB sizes).
Not part of the test suite; run manually:  python examples/profile_ka.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _enable_compile_cache, build_workload

LOOP = 500


def _sync(out):
    # axon (remote TPU) resolves buffer handles asynchronously;
    # block_until_ready returns early. A host readback is the only
    # reliable fence.
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]


_RTT = None


def timeit(fn, *args, repeats=3):
    global _RTT
    if _RTT is None:  # tunnel readback roundtrip baseline
        z = jnp.zeros(8)
        _sync((z,))
        t0 = time.perf_counter()
        for _ in range(5):
            _sync((z + 1.0,))
        _RTT = (time.perf_counter() - t0) / 5
        print(f"[readback RTT: {_RTT*1e3:.1f} ms]", flush=True)
    _sync(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - _RTT, 0.0) / LOOP


def main():
    _enable_compile_cache()
    P, K, E, C, ps = 128, 48, 96, 128, 16
    problems, patches = build_workload(P=P, K=K, E=E, C=C, ps=ps)

    from pixsfm_tpu.base.interpolation import (InterpolationConfig,
                                               bicubic_window_eval,
                                               l2_normalize_with_grad)
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.keypoint_adjustment.solver import make_ka_system
    from pixsfm_tpu.ops.lm import LMOptions, _masked_solve

    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
    loss = RobustLoss("cauchy", [0.25])

    patches_pk = jnp.asarray(
        np.asarray(patches)[problems.patch_row.reshape(-1)]
        .reshape(P, K, ps, ps, C))
    jax.block_until_ready(patches_pk)
    data = tuple(jnp.asarray(a) for a in (
        problems.patch_row, problems.corner, problems.scale, problems.ups,
        problems.edge_i, problems.edge_j, problems.edge_w))
    x0 = jnp.asarray(problems.kp0.reshape(P, K * 2))

    # 1. full system eval, looped
    @jax.jit
    def sys_loop(x, patches_pk, data):
        sysf, _ = make_ka_system(patches_pk, interp, loss, K,
                                 pregathered=True)

        def body(i, x):
            cost, H, g = sysf(x, data)
            return x + 1e-9 * g

        return jax.lax.fori_loop(0, LOOP, body, x)

    t = timeit(sys_loop, x0, patches_pk, data)
    print(f"system_fn:            {t*1e3:8.3f} ms/call", flush=True)

    # 2. cost only, looped
    @jax.jit
    def cost_loop(x, patches_pk, data):
        _, costf = make_ka_system(patches_pk, interp, loss, K,
                                  pregathered=True)

        def body(i, x):
            c = costf(x, data)
            return x + 1e-12 * c[:, None]

        return jax.lax.fori_loop(0, LOOP, body, x)

    t = timeit(cost_loop, x0, patches_pk, data)
    print(f"cost_fn:              {t*1e3:8.3f} ms/call", flush=True)

    # 3. interpolation alone, looped
    @jax.jit
    def interp_loop(x, patches_pk, corner, scale, ups):
        def body(i, x):
            kp = x.reshape(P, K, 2)
            uv = (kp * scale - 0.5 - corner) * ups[..., None]
            f, dr, dc = bicubic_window_eval(
                patches_pk.reshape(P * K, ps, ps, C),
                uv[..., 1].reshape(-1), uv[..., 0].reshape(-1))
            f, (dr, dc) = l2_normalize_with_grad(f, (dr, dc))
            return x + 1e-12 * jnp.sum(f) + 1e-12 * jnp.sum(dr)

        return jax.lax.fori_loop(0, LOOP, body, x)

    t = timeit(interp_loop, x0, patches_pk, data[1], data[2], data[3])
    print(f"interp+l2:            {t*1e3:8.3f} ms/call", flush=True)

    # 4. H/g assembly alone, looped (fixed f/df, perturbed by output)
    @jax.jit
    def interp_once(x, patches_pk, corner, scale, ups):
        kp = x.reshape(P, K, 2)
        uv = (kp * scale - 0.5 - corner) * ups[..., None]
        f, dr, dc = bicubic_window_eval(
            patches_pk.reshape(P * K, ps, ps, C),
            uv[..., 1].reshape(-1), uv[..., 0].reshape(-1))
        f, (dr, dc) = l2_normalize_with_grad(f, (dr, dc))
        return (f.reshape(P, K, C), dr.reshape(P, K, C), dc.reshape(P, K, C))

    f0, dr0, dc0 = interp_once(x0, patches_pk, data[1], data[2], data[3])

    @jax.jit
    def assembly_loop(f, dfdx, dfdy, edge_i, edge_j, edge_w):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
        Si = (edge_i[..., None] == iota).astype(jnp.float32)
        Sj = (edge_j[..., None] == iota).astype(jnp.float32)

        def one(f):
            r = jnp.einsum("pek,pkc->pec", Si - Sj, f)
            s = jnp.sum(r * r, axis=-1)
            cost = 0.5 * jnp.sum(edge_w * loss(s), axis=1)
            w = edge_w * loss.weight(s)
            df = jnp.stack([dfdx, dfdy], axis=-1)
            Ji = jnp.einsum("pek,pkca->peca", Si, df)
            Jj = jnp.einsum("pek,pkca->peca", Sj, df)
            Aii = jnp.einsum("peca,pecb->peab", Ji, Ji)
            Ajj = jnp.einsum("peca,pecb->peab", Jj, Jj)
            Aij = -jnp.einsum("peca,pecb->peab", Ji, Jj)
            gi_blk = jnp.einsum("peca,pec->pea", Ji, r)
            gj_blk = -jnp.einsum("peca,pec->pea", Jj, r)

            def blocks(Sa, Sb, A):
                return jnp.einsum("pek,peab,pel->pkalb", Sa,
                                  w[..., None, None] * A, Sb)

            Hb = (blocks(Si, Si, Aii) + blocks(Sj, Sj, Ajj)
                  + blocks(Si, Sj, Aij)
                  + blocks(Sj, Si, jnp.swapaxes(Aij, -1, -2)))
            H = Hb.reshape(P, 2 * K, 2 * K)
            g = (jnp.einsum("pek,pea->pka", Si, w[..., None] * gi_blk)
                 + jnp.einsum("pek,pea->pka", Sj, w[..., None] * gj_blk)
                 ).reshape(P, 2 * K)
            return cost, H, g

        def body(i, f):
            cost, H, g = one(f)
            return f + 1e-12 * g.reshape(P, K, 2)[..., :1]

        return jax.lax.fori_loop(0, LOOP, body, f)

    t = timeit(assembly_loop, f0, dc0, dr0, data[4], data[5], data[6])
    print(f"H/g assembly:         {t*1e3:8.3f} ms/call", flush=True)

    # 5. linear solves, looped
    @jax.jit
    def sys_once(x, patches_pk, data):
        sysf, _ = make_ka_system(patches_pk, interp, loss, K,
                                 pregathered=True)
        return sysf(x, data)

    _, H0, g0 = sys_once(x0, patches_pk, data)
    lam = jnp.full((P,), 1e-4, jnp.float32)
    pmask = jnp.ones((P, 2 * K), bool)

    def solve_loop_factory(opts):
        @jax.jit
        def run(H, g, lam, pmask):
            def body(i, g):
                dx, _ = _masked_solve(H, g, lam, pmask, opts)
                return g + 1e-9 * dx

            return jax.lax.fori_loop(0, LOOP, body, g)

        return run

    t = timeit(solve_loop_factory(LMOptions(linear_solver="cholesky")),
               H0, g0, lam, pmask)
    print(f"cholesky solve:       {t*1e3:8.3f} ms/call", flush=True)
    t = timeit(solve_loop_factory(LMOptions(linear_solver="cg")),
               H0, g0, lam, pmask)
    print(f"cg solve (25 it):     {t*1e3:8.3f} ms/call", flush=True)

    print("\nplatform:", jax.devices()[0].platform, jax.devices()[0])


if __name__ == "__main__":
    main()
