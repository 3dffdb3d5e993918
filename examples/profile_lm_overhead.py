"""Isolate the LM loop's per-iteration overhead from system-eval and solve.

Times three nested variants of the KA chunk solve at bench shapes:
  A. full lm_solve (production path)
  B. lm_solve with a STUB system_fn returning precomputed (cost, H, g)
     (measures solve + LM bookkeeping without interpolation/assembly)
  C. _masked_solve alone in a fori_loop (solve only)
Per-iteration overhead = (A - B) system eval; (B - C) LM bookkeeping.
Run manually: python examples/profile_lm_overhead.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import _enable_compile_cache, build_workload

ITERS = 100


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.keypoint_adjustment.solver import make_ka_system
    from pixsfm_tpu.ops.lm import LMOptions, _masked_solve, lm_solve

    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
    loss = RobustLoss("cauchy", [0.25])
    P, K, ps, C = 128, 48, 16, 128
    problems, _ = build_workload(P=P, K=K, make_patches=False)
    opts = LMOptions(max_iterations=ITERS, parameter_tolerance=0.0)

    @jax.jit
    def synth(key):
        field = jax.random.normal(key, (ps, ps, C))
        noise = 0.05 * jax.random.normal(jax.random.fold_in(key, 1),
                                         (P * K, ps, ps, C))
        return (field[None] + noise).astype(jnp.bfloat16)

    staged = synth(jax.random.PRNGKey(0))
    staged.block_until_ready()

    x0 = jnp.asarray(problems.kp0.reshape(P, K * 2).astype(np.float32))
    data = tuple(jnp.asarray(a) for a in (
        problems.patch_row, problems.corner, problems.scale, problems.ups,
        problems.edge_i, problems.edge_j, problems.edge_w))
    kp_free = jnp.asarray(problems.kp_free)
    mask = jnp.repeat(kp_free, 2, axis=1)
    lower = jnp.asarray(np.nan_to_num(problems.lower, neginf=-1e30)
                        .astype(np.float32).reshape(P, K * 2))
    upper = jnp.asarray(np.nan_to_num(problems.upper, posinf=1e30)
                        .astype(np.float32).reshape(P, K * 2))
    pmask = jnp.asarray(np.ones(P, bool))

    def sync(out):
        return float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])

    def measure_rtt():
        z = jnp.zeros(8)
        sync((z,))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync((z + 1.0,))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def timeit(fn, *args):
        sync(fn(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(*args))
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - measure_rtt(), 0.0) / ITERS

    # A. full production solve
    @jax.jit
    def full(staged, x0, data, mask, lower, upper, pmask):
        n, psz, _, c = staged.shape
        rows = staged.reshape(n * psz, psz, c)
        system_fn, cost_fn = make_ka_system(None, interp, loss, K,
                                            rows_spec=(rows, psz, c))
        return lm_solve(lambda x: system_fn(x, data),
                        lambda x: cost_fn(x, data), x0,
                        param_mask=mask, problem_mask=pmask,
                        lower=lower, upper=upper, opts=opts)

    t = timeit(full, staged, x0, data, mask, lower, upper, pmask)
    print(f"A full lm_solve:       {t*1e3:8.3f} ms/iter", flush=True)

    # precompute one system
    @jax.jit
    def sys_once(staged, x0, data):
        n, psz, _, c = staged.shape
        rows = staged.reshape(n * psz, psz, c)
        system_fn, _ = make_ka_system(None, interp, loss, K,
                                      rows_spec=(rows, psz, c))
        return system_fn(x0, data)

    cost0, H0, g0 = sys_once(staged, x0, data)
    jax.block_until_ready(H0)

    # B. stubbed system_fn (adds x-dependence so nothing folds away)
    @jax.jit
    def stubbed(cost0, H0, g0, x0, mask, lower, upper, pmask):
        def system_fn(x):
            bump = jnp.sum(x, axis=1) * 1e-20
            return cost0 + bump, H0, g0 + bump[:, None]

        def cost_fn(x):
            return cost0 + jnp.sum(x, axis=1) * 1e-20

        return lm_solve(system_fn, cost_fn, x0, param_mask=mask,
                        problem_mask=pmask, lower=lower, upper=upper,
                        opts=opts)

    t = timeit(stubbed, cost0, H0, g0, x0, mask, lower, upper, pmask)
    print(f"B stub-system lm_solve:{t*1e3:8.3f} ms/iter", flush=True)

    # C. masked solve alone
    @jax.jit
    def solve_loop(H0, g0, mask):
        lam = jnp.full((P,), 1e-4, jnp.float32)

        def body(i, g):
            dx, _ = _masked_solve(H0, g, lam, mask, opts)
            return g + 1e-9 * dx

        return jax.lax.fori_loop(0, ITERS, body, g0)

    t = timeit(solve_loop, H0, g0, mask)
    print(f"C _masked_solve loop:  {t*1e3:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
