"""A/B the KA chunk solver: XLA windowed-gather path vs fused Pallas kernel.

Run manually on TPU: python examples/bench_pallas_ab.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache, build_workload

    _enable_compile_cache()
    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.keypoint_adjustment.solver import (_compiled_ka_chunk,
                                                       _interp_key)
    from pixsfm_tpu.ops.lm import LMOptions

    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
    loss = RobustLoss("cauchy", [0.25])
    ITERS = 100
    P, K, ps = 128, 48, 16
    problems, _ = build_workload(P=P, K=K, make_patches=False)

    @jax.jit
    def synth(key):
        field = jax.random.normal(key, (ps, ps, 128))
        noise = 0.05 * jax.random.normal(jax.random.fold_in(key, 1),
                                         (P * K, ps, ps, 128))
        return (field[None] + noise).astype(jnp.bfloat16)

    staged = synth(jax.random.PRNGKey(0))
    staged.block_until_ready()

    x0 = jnp.asarray(problems.kp0.reshape(P, K * 2).astype(np.float32))
    data = tuple(jnp.asarray(a) for a in (
        problems.patch_row, problems.corner, problems.scale, problems.ups,
        problems.edge_i, problems.edge_j, problems.edge_w))
    kp_free = jnp.asarray(problems.kp_free)
    lower = jnp.asarray(np.nan_to_num(problems.lower, neginf=-1e30)
                        .astype(np.float32))
    upper = jnp.asarray(np.nan_to_num(problems.upper, posinf=1e30)
                        .astype(np.float32))
    pmask = jnp.asarray(np.ones(P, bool))
    args = (staged, x0, data, kp_free, lower, upper, pmask)

    def sync(out):
        return float(np.asarray(out[0])[0, 0])

    results = {}
    for use_pallas in (False, True):
        run = _compiled_ka_chunk(
            _interp_key(interp), (loss.name, tuple(loss.params), loss.scale),
            LMOptions(max_iterations=ITERS, parameter_tolerance=1e-5), K,
            use_pallas)
        t0 = time.time()
        out = run(*args)
        final_kp = np.asarray(out[0])
        print(f"pallas={use_pallas}: first run (incl compile) "
              f"{time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        sync((x0,))
        rtt = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            o = None
            for _ in range(4):
                o = run(*args)
            sync(o)
            best = min(best, (time.time() - t0 - rtt) / 4)
        rate = P * K * ITERS / best
        results[use_pallas] = (best, final_kp)
        print(f"pallas={use_pallas}: {best:7.3f}s/solve  "
              f"{rate/1e6:8.2f}M kp-iters/s", flush=True)

    d = np.abs(results[True][1] - results[False][1])
    print(f"kp agreement: max |diff| = {d.max():.5f} px "
          f"(mean {d.mean():.6f})", flush=True)


if __name__ == "__main__":
    main()
