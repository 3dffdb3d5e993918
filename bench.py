"""Benchmark: featuremetric KA solver throughput on the TPU.

Workload: a synthetic batch of KA subproblems shaped like an ETH3D scene slice
(problems of <=48 keypoints, 128-channel bf16 patches, bicubic interpolation,
Cauchy loss, bounded LM) — the reference's hottest path
(featuremetric_keypoint_optimizer.h + Ceres autodiff + AVX2 spline; the
published pipeline spends most of its refinement time here).

Metric: keypoints refined per second (full LM solve to the default 100-iteration
cap / convergence). ``vs_baseline`` compares against the same program run on the
host CPU (single process, all cores) — the stand-in for the reference's CPU
solver stack, measured fresh on this machine each run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-ever bench run pays the
    (multi-minute, remote-tunnel) compiles; subsequent runs load from disk."""
    import jax
    cache_dir = os.environ.get("PIXSFM_JAX_CACHE",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)), ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache unsupported on this backend: proceed
        print(f"[bench] compilation cache unavailable: {e}",
              file=__import__("sys").stderr)


def build_workload(P=192, K=48, E=96, C=128, ps=16, seed=0,
                   make_patches=True):
    """Synthetic padded KA problems + packed patches.

    ``make_patches=False`` skips the (large) patch array — callers that
    synthesize patches on device (multi-GB at P >= 512; the remote tunnel
    serializes host->device transfers far too slowly) only need the
    problem metadata."""
    rng = np.random.default_rng(seed)
    n_patches = P * K
    patches = None
    if make_patches:
        field = rng.normal(0, 1, (ps, ps, C)).astype(np.float32)
        patches = (field[None] + 0.05 * rng.normal(
            0, 1, (n_patches, ps, ps, C))).astype("bfloat16")

    from pixsfm_tpu.keypoint_adjustment.solver import KAProblems

    kp0 = rng.uniform(6.0, 10.0, (P, K, 2)).astype(np.float32)
    corner = np.zeros((P, K, 2), np.float32)
    scale = np.ones((P, K, 2), np.float32)
    ups = np.ones((P, K), np.float32)
    kp_free = np.ones((P, K), bool)
    kp_free[:, 0] = False  # roots constant
    kp_valid = np.ones((P, K), bool)
    edge_i = rng.integers(0, K, (P, E)).astype(np.int32)
    edge_j = ((edge_i + rng.integers(1, K, (P, E))) % K).astype(np.int32)
    edge_w = np.ones((P, E), np.float32)
    patch_row = np.arange(n_patches, dtype=np.int32).reshape(P, K)
    lower = kp0 - 4.0
    upper = kp0 + 4.0
    problems = KAProblems(kp0, patch_row, corner, scale, ups, kp_free,
                          kp_valid, edge_i, edge_j, edge_w, lower, upper,
                          np.zeros(1, np.int64), np.zeros(1, np.int64),
                          np.zeros(1, np.int64))
    return problems, patches


def bench_backend(problems, patches, chunk, repeats=3, iters=100,
                  warmup_iters=2, queue=4):
    """Time the jitted KA chunk solver itself: all inputs staged on device
    once, ``queue`` solver executions enqueued back-to-back, ONE host
    readback at the end as the fence.

    Rationale: this machine reaches its TPU through a high-latency tunnel
    (~100 ms per host readback / dispatch round-trip). The production
    pipeline keeps features and problem arrays resident on device across
    KA levels, so per-call host round-trips are an artifact of the tunnel,
    not of the solver; a naive per-call timing measures mostly RTT.
    """
    import sys

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.keypoint_adjustment.solver import (_compiled_ka_chunk,
                                                       _interp_key)
    from pixsfm_tpu.ops.lm import LMOptions

    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
    loss = RobustLoss("cauchy", [0.25])
    P, K, _ = problems.kp0.shape
    assert chunk == P, "bench stages exactly one chunk"

    def run_for(max_iters):
        opts = LMOptions(max_iterations=max_iters, parameter_tolerance=1e-5)
        return _compiled_ka_chunk(
            _interp_key(interp), (loss.name, tuple(loss.params), loss.scale),
            opts, K)

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
        # block_until_ready returns early on the remote (axon) backend; a
        # host readback is the only reliable fence.
        return float(np.asarray(out[0])[0, 0])

    t0 = time.time()
    sync(run_for(warmup_iters)(*args))
    print(f"[bench] warmup+compile ({warmup_iters} iters): "
          f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    run = run_for(iters)
    t0 = time.time()
    sync(run(*args))
    print(f"[bench] first timed run ({iters} iters incl. compile): "
          f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    # measure the readback fence alone, then amortize it over `queue`
    # back-to-back executions
    t0 = time.time()
    sync((x0,))
    rtt = time.time() - t0
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = None
        for _ in range(queue):
            out = run(*args)
        sync(out)
        times.append((time.time() - t0 - rtt) / queue)
    print(f"[bench] steady-state: {min(times):.3f}s/solve "
          f"(readback fence {rtt * 1e3:.0f} ms amortized over {queue})",
          file=sys.stderr, flush=True)
    return max(min(times), 1e-9)


def main():
    import jax

    _enable_compile_cache()
    ITERS = 100
    P, K = 128, 48
    problems, patches = build_workload(P=P, K=K)
    n_kps = int(problems.kp_valid.sum())

    # TPU (default backend); single chunk per run
    t_tpu = bench_backend(problems, patches, chunk=P, iters=ITERS)
    tpu_rate = n_kps * ITERS / t_tpu  # keypoint-iterations / s

    # CPU baseline: small slice, few iterations, same per-iteration metric
    cpu_P, cpu_iters = 8, 10
    sub, _ = build_workload(P=cpu_P, K=K)
    sub_patches = patches[:cpu_P * K]
    cpu_dev = jax.devices("cpu")[0]
    with jax.default_device(cpu_dev):
        t_cpu = bench_backend(sub, sub_patches, chunk=cpu_P, repeats=1,
                              iters=cpu_iters, warmup_iters=cpu_iters)
    cpu_rate = int(sub.kp_valid.sum()) * cpu_iters / t_cpu

    print(json.dumps({
        "metric": "ka_featuremetric_keypoint_iterations_per_s",
        "value": round(tpu_rate, 1),
        "unit": "keypoint-LM-iterations/s (K=%d,C=128,ps=16,bf16)" % K,
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
