"""Compare KA LM linear-solver variants on device (tunnel-safe timing).

Times the jitted chunk solver at several LMOptions settings; one readback
fences `queue` back-to-back executions. Run manually:
    python examples/bench_lm_variants.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import _enable_compile_cache, build_workload


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    P, K = 128, 48
    problems, patches = build_workload(P=P, K=K)

    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.keypoint_adjustment.solver import (_compiled_ka_chunk,
                                                       _interp_key)
    from pixsfm_tpu.ops.lm import LMOptions

    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
    loss = RobustLoss("cauchy", [0.25])
    loss_key = (loss.name, tuple(loss.params), loss.scale)

    staged = jnp.asarray(patches)
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

    def measure(tag, opts, queue=4, repeats=3):
        run = _compiled_ka_chunk(_interp_key(interp), loss_key, opts, K)
        t0 = time.time()
        x, s = run(*args)
        sync((x,))
        t_first = time.time() - t0
        t0 = time.time()
        sync((x0,))
        rtt = time.time() - t0
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            out = None
            for _ in range(queue):
                out = run(*args)
            sync(out)
            ts.append((time.time() - t0 - rtt) / queue)
        it = int(np.max(np.asarray(s.iterations)))
        print(f"{tag:34s} {min(ts)*1e3:8.1f} ms/solve "
              f"({min(ts)/opts.max_iterations*1e3:6.3f} ms/iter cap, "
              f"max_used={it}, first={t_first:.1f}s)", flush=True)
        return min(ts)

    base = dict(max_iterations=100, parameter_tolerance=1e-5)
    measure("cg25 (current default)", LMOptions(**base, linear_solver="cg",
                                                cg_iterations=25))
    measure("cg12", LMOptions(**base, linear_solver="cg", cg_iterations=12))
    measure("cg6", LMOptions(**base, linear_solver="cg", cg_iterations=6))
    measure("cholesky", LMOptions(**base, linear_solver="cholesky"))
    measure("cg25 200it", LMOptions(max_iterations=200,
                                    parameter_tolerance=1e-5,
                                    linear_solver="cg", cg_iterations=25))
    measure("cg25 50it", LMOptions(max_iterations=50,
                                   parameter_tolerance=1e-5,
                                   linear_solver="cg", cg_iterations=25))


if __name__ == "__main__":
    main()
