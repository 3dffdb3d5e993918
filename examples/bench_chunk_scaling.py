"""Measure KA solver throughput vs chunk size (P) on the current backend.

The batched LM amortizes fixed per-iteration costs (dispatch, small-op latency,
partially-filled MXU tiles) over the problem axis; this sweep finds the
throughput-optimal chunk so the production default can match it.
Run manually: python examples/bench_chunk_scaling.py [P ...]
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
    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.keypoint_adjustment.solver import (_compiled_ka_chunk,
                                                       _interp_key)
    from pixsfm_tpu.ops.lm import LMOptions

    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
    loss = RobustLoss("cauchy", [0.25])
    ITERS = 100
    K = 48

    Ps = [int(a) for a in sys.argv[1:]] or [128, 256, 512, 1024]
    for P in Ps:
        # problem metadata is tiny and comes from the host; the patch array
        # (GBs at P>=512) is synthesized ON DEVICE — the tunnel serializes
        # host->device transfers at ~1 MB/s, so shipping it would dominate
        problems, _ = build_workload(P=P, K=K, make_patches=False)
        run = _compiled_ka_chunk(
            _interp_key(interp), (loss.name, tuple(loss.params), loss.scale),
            LMOptions(max_iterations=ITERS, parameter_tolerance=1e-5), K)

        @jax.jit
        def synth_patches(key):
            field = jax.random.normal(key, (ps_const, ps_const, 128))
            noise = 0.05 * jax.random.normal(
                jax.random.fold_in(key, 1), (P * K, ps_const, ps_const, 128))
            return (field[None] + noise).astype(jnp.bfloat16)

        ps_const = 16
        staged = synth_patches(jax.random.PRNGKey(0))
        staged.block_until_ready()
        x0 = jnp.asarray(problems.kp0.reshape(P, K * 2).astype(np.float32))
        data = tuple(jnp.asarray(a) for a in (
            problems.patch_row, problems.corner, problems.scale,
            problems.ups, problems.edge_i, problems.edge_j, problems.edge_w))
        kp_free = jnp.asarray(problems.kp_free)
        lower = jnp.asarray(np.nan_to_num(problems.lower, neginf=-1e30)
                            .astype(np.float32))
        upper = jnp.asarray(np.nan_to_num(problems.upper, posinf=1e30)
                            .astype(np.float32))
        pmask = jnp.asarray(np.ones(P, bool))
        args = (staged, x0, data, kp_free, lower, upper, pmask)

        def sync(out):
            return float(np.asarray(out[0])[0, 0])

        t0 = time.time()
        sync(run(*args))
        print(f"P={P:5d}  first (incl compile): {time.time() - t0:6.1f}s",
              flush=True)
        # RTT fence
        t0 = time.time()
        sync((x0,))
        rtt = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = None
            for _ in range(4):
                out = run(*args)
            sync(out)
            best = min(best, (time.time() - t0 - rtt) / 4)
        rate = P * K * ITERS / best
        print(f"P={P:5d}  {best:7.3f}s/solve   {rate/1e6:8.2f}M kp-iters/s",
              flush=True)


if __name__ == "__main__":
    main()
