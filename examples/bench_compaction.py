"""Measure KA convergence-compaction on a mixed-difficulty workload.

1024 problems: 3/4 have smooth (bilinearly-upsampled) patches whose LM
converges well before the 100-iteration cap, 1/4 have rough random patches
that run to the cap. Without compaction every chunk runs as long as its
slowest problem; with compaction converged problems are dropped between
25-iteration segments. Run manually on TPU:
    python examples/bench_compaction.py
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
    from pixsfm_tpu.keypoint_adjustment.solver import solve_ka_problems
    from pixsfm_tpu.ops.lm import LMOptions

    P, K, ps, C = 1024, 48, 16, 128
    problems, _ = build_workload(P=P, K=K, make_patches=False)

    @jax.jit
    def synth(key):
        n = P * K
        rough = jax.random.normal(key, (n, ps, ps, C))
        coarse = jax.random.normal(jax.random.fold_in(key, 1), (n, 4, 4, C))
        smooth = jax.image.resize(coarse, (n, ps, ps, C), "linear")
        # problem p is "hard" iff p % 4 == 0 (1/4 of problems)
        pidx = (jnp.arange(n) // K) % 4
        hard = (pidx == 0)[:, None, None, None]
        base = jax.random.normal(jax.random.fold_in(key, 2), (ps, ps, C))
        mix = jnp.where(hard, rough, 0.15 * smooth)
        return (base[None] + mix).astype(jnp.bfloat16)

    patches = synth(jax.random.PRNGKey(0))
    patches.block_until_ready()

    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
    loss = RobustLoss("cauchy", [0.25])
    opts = LMOptions(max_iterations=100, parameter_tolerance=1e-5)

    for seg, label in ((0, "no compaction"), (25, "compact every 25")):
        # warm (compile both segment programs)
        solve_ka_problems(problems, patches, interp, loss, opts, chunk=128,
                          compaction_segment=seg)
        t0 = time.time()
        kp, tot = solve_ka_problems(problems, patches, interp, loss, opts,
                                    chunk=128, compaction_segment=seg)
        dt = time.time() - t0
        print(f"{label:18s}: {dt:7.3f}s  final_cost {tot['final_cost']:.2f} "
              f"max_iters {tot['iterations']}", flush=True)


if __name__ == "__main__":
    main()
