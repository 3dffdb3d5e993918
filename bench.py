"""Benchmark suite: one JSON line with the framework's four hot-path metrics.

Headline (metric/value/unit/vs_baseline): featuremetric KA solver throughput —
a synthetic batch of KA subproblems shaped like an ETH3D scene slice
(problems of <=48 keypoints, 128-channel bf16 patches, bicubic interpolation,
Cauchy loss, bounded LM), the reference's hottest path
(featuremetric_keypoint_optimizer.h + Ceres autodiff + AVX2 spline).
``vs_baseline`` compares against the same program run on the host CPU
(single process, all cores) — the stand-in for the reference's CPU solver
stack, measured fresh on this machine each run.

Extra keys (same line, so the driver's BENCH_r*.json can regression-check
them; added per round-1 review):

- ``ba_lm_ms_per_iter_80k_obs``: geometric BA LM iteration, 40 images /
  2000 points / 80k observations, SIMPLE_RADIAL, iterative (CG) Schur,
  analytic-Jacobian residual path (the production configuration).
- ``fm_ba_lm_ms_per_iter_20k_obs_c128``: featuremetric (feature-reference)
  BA LM iteration, 20 images / 1000 points / 20k observations, C=128 bf16
  patches, windowed bicubic + L2, analytic-Jacobian path.
- ``extract_imgs_per_s``: S2DNet (1-level) dense-feature forward at 480x640
  in bf16.
- ``qloc_queries_per_s``: end-to-end query localization (QKA -> PnP
  LO-RANSAC -> QBA, robust_mean references, ~50 correspondences, C=8
  patches) — the serving-path metric; includes all host work.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-ever bench run pays the
    (multi-minute, remote-tunnel) compiles; subsequent runs load from disk.

    The cache is MACHINE-SPECIFIC: XLA:CPU entries are AOT executables
    compiled for this host's CPU features. A cache carried over from a
    different host loads with mismatched features ("could lead to execution
    errors such as SIGILL", cpu_aot_loader — observed in bench_err.log r03),
    so the dir is stamped with the host CPU identity and purged on mismatch."""
    import hashlib
    import shutil

    import jax
    cache_dir = os.environ.get("PIXSFM_JAX_CACHE",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)), ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        host_id = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        host_id = hashlib.sha256(
                            line.encode()).hexdigest()[:16]
                        break
        except OSError:
            pass
        stamp = os.path.join(cache_dir, ".host_id")
        prev = None
        if os.path.exists(stamp):
            with open(stamp) as f:
                prev = f.read().strip()
        if prev is not None and prev != host_id:
            print(f"[bench] purging stale compile cache (host {prev} -> "
                  f"{host_id})", file=sys.stderr)
            shutil.rmtree(cache_dir, ignore_errors=True)
            os.makedirs(cache_dir, exist_ok=True)
        with open(stamp, "w") as f:
            f.write(host_id)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache unsupported on this backend: proceed
        print(f"[bench] compilation cache unavailable: {e}", file=sys.stderr)


def _sync(x):
    """Host readback fence (block_until_ready returns early on the remote
    axon backend; a readback is the only reliable fence)."""
    import jax
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


# ---------------------------------------------------------------------------
# KA headline
# ---------------------------------------------------------------------------

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
    readback at the end as the fence (the tunnel costs ~100 ms per
    dispatch/readback round-trip; the production pipeline keeps arrays
    device-resident across KA levels, so per-call RTT is an artifact)."""
    import jax
    import jax.numpy as jnp

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


# ---------------------------------------------------------------------------
# BA benches (per-LM-iteration cost via the (t12 - t2) / 10 difference,
# which cancels dispatch overhead and the initial system evaluation)
# ---------------------------------------------------------------------------

def _ring_scene(I, Np, seed=0):
    """Cameras on a ring looking at a unit-box point cloud; SIMPLE_RADIAL."""
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-1, 1, (Np, 3)).astype(np.float32)
    qvecs, tvecs = [], []
    for a in np.linspace(0, 2 * np.pi, I, endpoint=False):
        c = np.array([4 * np.cos(a), 0.4 * np.sin(3 * a), 4 * np.sin(a)])
        z = -c / np.linalg.norm(c)
        x = np.cross(np.array([0, 1.0, 0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        qw = np.sqrt(max(1 + np.trace(R), 1e-12)) / 2
        qvecs.append([qw, (R[2, 1] - R[1, 2]) / (4 * qw),
                      (R[0, 2] - R[2, 0]) / (4 * qw),
                      (R[1, 0] - R[0, 1]) / (4 * qw)])
        tvecs.append(-R @ c)
    qvec = np.asarray(qvecs, np.float32)
    tvec = np.asarray(tvecs, np.float32)
    cams = np.asarray([[1000.0, 512.0, 384.0, 0.01]], np.float32)

    def proj(qv, tv, X):
        w, x, y, z = qv
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
        xc = X @ R.T + tv
        uv = xc[:, :2] / xc[:, 2:3]
        d = 1 + cams[0, 3] * (uv ** 2).sum(1, keepdims=True)
        return cams[0, 0] * uv * d + cams[0, 1:3]

    xy = np.concatenate([proj(qvec[i], tvec[i], xyz) for i in range(I)])
    return qvec, tvec, cams, xyz, xy.astype(np.float32), rng


def _ba_gauge_args(I, Np, k):
    import jax.numpy as jnp
    pose_free = np.ones(I, bool)
    pose_free[0] = False
    tvec_free = np.ones((I, 3), bool)
    tvec_free[1, 0] = False
    return (jnp.asarray(pose_free), jnp.asarray(tvec_free),
            jnp.ones((1, k), bool), jnp.ones(Np, bool))


def _per_iter_ms(make_run, state0, obs, ctx=None):
    """Steady-state (t_12iters - t_2iters)/10 in ms; each variant timed on
    its second call (first pays compile)."""
    ts = {}
    for iters in (2, 12):
        run = make_run(iters)
        args = (state0, obs) if ctx is None else (state0, obs, ctx)
        t0 = time.time()
        st, summ = run(*args)
        c0, c1 = float(summ["initial_cost"]), float(summ["final_cost"])
        t_first = time.time() - t0
        best = None
        for _ in range(2):
            t0 = time.time()
            st, summ = run(*args)
            _sync(summ["final_cost"])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        ts[iters] = best
        print(f"[bench] ba iters={iters}: first={t_first:.1f}s "
              f"steady={ts[iters]:.3f}s cost {c0:.1f}->{c1:.4g}",
              file=sys.stderr, flush=True)
    return max((ts[12] - ts[2]) / 10 * 1e3, 1e-6)


def bench_ba_geometric(I=40, Np=2000):
    """Geometric BA per-LM-iteration at 80k observations (production path:
    analytic-Jacobian residual, CG Schur)."""
    import jax
    import jax.numpy as jnp

    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.bundle_adjustment.main import (_RESIDUAL_BUILDERS,
                                                   _RESIDUAL_JAC_BUILDERS)
    from pixsfm_tpu.ops.schur import BAObservations, BAOptions, BAState, \
        ba_solve

    qvec, tvec, cams, xyz, xy, rng = _ring_scene(I, Np)
    model = "SIMPLE_RADIAL"
    O = I * Np
    xy = xy + rng.normal(0, 0.5, xy.shape).astype(np.float32)
    rfn = _RESIDUAL_BUILDERS["geometric"]((model,))
    jfn = _RESIDUAL_JAC_BUILDERS["geometric"]((model,))

    state0 = BAState(
        jnp.asarray(qvec),
        jnp.asarray(tvec + rng.normal(0, 0.02, tvec.shape).astype(np.float32)),
        jnp.asarray(cams),
        jnp.asarray(xyz + rng.normal(0, 0.02, xyz.shape).astype(np.float32)))
    obs = BAObservations(
        img_idx=jnp.asarray(np.repeat(np.arange(I, dtype=np.int32), Np)),
        cam_idx=jnp.asarray(np.zeros(O, np.int32)),
        pt_idx=jnp.asarray(np.tile(np.arange(Np, dtype=np.int32), I)),
        obs_data=jnp.asarray(xy), valid=jnp.ones((O,), bool),
        pair_o1=jnp.zeros(4, jnp.int32) + O,
        pair_o2=jnp.zeros(4, jnp.int32) + O)
    loss = RobustLoss("trivial")
    args = _ba_gauge_args(I, Np, 4)

    def make_run(iters):
        opts = BAOptions(max_iterations=iters, linear_solver="cg",
                         obs_chunk=8192, max_linear_solver_iterations=50)
        return jax.jit(lambda s, o: ba_solve(
            rfn, s, o, loss, *args, opts=opts, residual_jac_fn=jfn))

    return _per_iter_ms(make_run, state0, obs)


def bench_ba_featuremetric(I=20, Np=1000, ps=16, C=128):
    """Feature-reference BA per-LM-iteration at 20k obs, C=128 bf16 patches
    (production path: windowed bicubic + L2, analytic Jacobian)."""
    import jax
    import jax.numpy as jnp

    from pixsfm_tpu.base.interpolation import InterpolationConfig, interpolate
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.bundle_adjustment.main import (_RESIDUAL_BUILDERS,
                                                   _RESIDUAL_JAC_BUILDERS)
    from pixsfm_tpu.ops.schur import BAObservations, BAOptions, BAState, \
        ba_solve
    from pixsfm_tpu.util.jit_cache import interp_static_key

    qvec, tvec, cams, xyz, xy_gt, rng = _ring_scene(I, Np, seed=1)
    model = "SIMPLE_RADIAL"
    O = I * Np
    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
    ikey = interp_static_key(interp)
    rfn = _RESIDUAL_BUILDERS["feature_reference"](model, ikey)
    jfn = _RESIDUAL_JAC_BUILDERS["feature_reference"](model, ikey)

    # patches synthesized ON DEVICE (1.3 GB would crawl through the tunnel)
    @jax.jit
    def synth(key):
        field = jax.random.normal(key, (ps, ps, C))
        noise = 0.05 * jax.random.normal(jax.random.fold_in(key, 1),
                                         (O, ps, ps, C))
        return (field[None] + noise).astype(jnp.bfloat16)

    patches = synth(jax.random.PRNGKey(0))
    patches.block_until_ready()
    # featuremap scale + perturbation sized so reprojections stay ON the
    # ps=16 patches (f=1000, depth~4: 0.002 noise -> ~0.5 px -> ~1 patch px)
    scales = np.full((O, 2), 2.0, np.float32)
    ups = np.ones(O, np.float32)
    corners = (xy_gt * scales - ps / 2).astype(np.float32)
    rows = np.arange(O, dtype=np.int32)
    scales_j = jnp.asarray(scales)
    corners_j = jnp.asarray(corners)
    xy_gt_j = jnp.asarray(xy_gt)

    @jax.jit
    def targets_of(patches):
        def one(row, xy):
            pc = (xy * scales_j[row] - 0.5 - corners_j[row])
            return interpolate(patches[row], pc[1], pc[0], interp)
        return jax.vmap(one)(jnp.asarray(rows), xy_gt_j)

    targets = targets_of(patches)
    targets.block_until_ready()

    ctx = (patches, corners_j, scales_j, jnp.asarray(ups))
    state0 = BAState(
        jnp.asarray(qvec),
        jnp.asarray(tvec + rng.normal(0, 0.002, tvec.shape)
                    .astype(np.float32)),
        jnp.asarray(cams),
        jnp.asarray(xyz + rng.normal(0, 0.002, xyz.shape)
                    .astype(np.float32)))
    obs = BAObservations(
        img_idx=jnp.asarray(np.repeat(np.arange(I, dtype=np.int32), Np)),
        cam_idx=jnp.asarray(np.zeros(O, np.int32)),
        pt_idx=jnp.asarray(np.tile(np.arange(Np, dtype=np.int32), I)),
        obs_data=(jnp.asarray(rows), targets), valid=jnp.ones((O,), bool),
        pair_o1=jnp.zeros(4, jnp.int32) + O,
        pair_o2=jnp.zeros(4, jnp.int32) + O)
    loss = RobustLoss("cauchy", [0.25])
    args = _ba_gauge_args(I, Np, 4)

    def make_run(iters):
        opts = BAOptions(max_iterations=iters, linear_solver="cg",
                         obs_chunk=4096, max_linear_solver_iterations=50)
        return jax.jit(lambda s, o, c: ba_solve(
            rfn, s, o, loss, *args, opts=opts, ctx=c, residual_jac_fn=jfn))

    return _per_iter_ms(make_run, state0, obs, ctx)


def ba_large_problem(I=200, Np=500_000, track=4):
    """Build the 2M-obs geometric BA problem (shared with
    examples/profile_ba_large.py). Returns (rfn, jfn, state0, obs, args)."""
    import jax
    import jax.numpy as jnp

    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.bundle_adjustment.main import (_RESIDUAL_BUILDERS,
                                                   _RESIDUAL_JAC_BUILDERS)
    from pixsfm_tpu.ops.schur import (BAObservations, BAOptions, BAState,
                                      ba_solve)

    rng = np.random.default_rng(7)
    O = Np * track
    xyz = rng.uniform(-1, 1, (Np, 3)).astype(np.float32)
    # camera ring (reuse the small-scene generator's poses)
    qvec, tvec, cams, _, _, _ = _ring_scene(I, 4)
    # each point seen by `track` consecutive cameras starting at a random slot
    start = rng.integers(0, I, Np)
    img_of = ((start[:, None] + np.arange(track)[None]) % I).astype(np.int32)
    img_idx = img_of.reshape(-1)                      # [O] point-major order
    pt_idx = np.repeat(np.arange(Np, dtype=np.int32), track)

    # project on host (numpy, exact same model as _ring_scene.proj)
    def rot(qv):
        w, x, y, z = qv
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
    xy = np.empty((O, 2), np.float32)
    for i in range(I):
        m = img_idx == i
        xc = xyz[pt_idx[m]] @ rot(qvec[i]).T + tvec[i]
        uv = xc[:, :2] / xc[:, 2:3]
        d = 1 + cams[0, 3] * (uv ** 2).sum(1, keepdims=True)
        xy[m] = cams[0, 0] * uv * d + cams[0, 1:3]
    xy += rng.normal(0, 0.5, xy.shape).astype(np.float32)

    model = "SIMPLE_RADIAL"
    rfn = _RESIDUAL_BUILDERS["geometric"]((model,))
    jfn = _RESIDUAL_JAC_BUILDERS["geometric"]((model,))
    state0 = BAState(
        jnp.asarray(qvec),
        jnp.asarray(tvec + rng.normal(0, 0.01, tvec.shape).astype(np.float32)),
        jnp.asarray(cams),
        jnp.asarray(xyz + rng.normal(0, 0.01, xyz.shape).astype(np.float32)))
    # the synthetic scene is already point-major with uniform track length:
    # a perfect grid (obs slot = point*track + rank, zero holes) — exercise
    # the reshape-shaped grid reductions (opts.obs_grid_T) the production
    # packer switches to at this scale
    obs = BAObservations(
        img_idx=jnp.asarray(img_idx),
        cam_idx=jnp.asarray(np.zeros(O, np.int32)),
        pt_idx=jnp.asarray(pt_idx),
        obs_data=jnp.asarray(xy), valid=jnp.ones((O,), bool),
        pair_o1=jnp.zeros(4, jnp.int32) + O,
        pair_o2=jnp.zeros(4, jnp.int32) + O)
    args = _ba_gauge_args(I, Np, 4)
    return rfn, jfn, state0, obs, args


def bench_ba_large(I=200, Np=500_000, track=4):
    """Large-scale geometric BA per-LM-iteration: 500k points / 2M
    observations (track length 4) — the reference's 7k-image regime scale
    axis (README.md:291). Exercises the point-major [Np, T] scatter-free
    reductions (ops/schur.py make_point_major) + CG Schur."""
    import jax

    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.ops.schur import BAOptions, ba_solve

    rfn, jfn, state0, obs, args = ba_large_problem(I, Np, track)
    loss = RobustLoss("trivial")

    def make_run(iters):
        opts = BAOptions(max_iterations=iters, linear_solver="cg",
                         obs_chunk=65536, max_linear_solver_iterations=25,
                         obs_grid_T=track)
        return jax.jit(lambda s, o: ba_solve(
            rfn, s, o, loss, *args, opts=opts, residual_jac_fn=jfn))

    return _per_iter_ms(make_run, state0, obs)


def bench_extract(H=480, W=640, reps=20):
    """S2DNet (1-level) bf16 dense forward throughput, images/s.

    The ``reps`` forwards run inside ONE on-device fori_loop dispatch:
    per-call dispatch through the remote tunnel costs ~100+ ms and would
    measure the tunnel, not the chip (the production extractor pipelines
    many images per dispatch the same way)."""
    import jax
    import jax.numpy as jnp

    from pixsfm_tpu.features.models.s2dnet import S2DNet

    model = S2DNet({"num_layers": 1, "pretrained": None})
    dt = jnp.bfloat16
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
        model.variables)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def loop(img, n):
        def body(i, acc):
            f = model.module.apply(variables, (img + acc * 1e-20).astype(dt))
            return jnp.sum(f[0].astype(jnp.float32)) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0))

    img = jax.jit(lambda k: jax.random.uniform(k, (1, H, W, 3), jnp.float32))(
        jax.random.PRNGKey(0))
    img.block_until_ready()
    _sync(loop(img, reps))      # compile both lengths
    _sync(loop(img, 3 * reps))
    best = None
    for _ in range(3):
        # two-length difference cancels dispatch/readback RTT exactly
        t0 = time.time()
        _sync(loop(img, reps))
        t1 = time.time()
        _sync(loop(img, 3 * reps))
        t2 = time.time()
        dt_run = ((t2 - t1) - (t1 - t0)) / (2 * reps)
        best = dt_run if best is None else min(best, dt_run)
    return 1.0 / max(best, 1e-9)


def bench_loftr(H=480, W=640, reps=10):
    """Detector-free LoFTR pair matching (image pairs/s at HxW): backbone +
    linear-attention coarse transformer over L=H/8*W/8 tokens + dual-softmax
    + fine refinement, one jitted program per pair. The reference delegates
    this to torch-GPU hloc; here it is MXU work end to end."""
    import jax
    import jax.numpy as jnp

    from pixsfm_tpu.features.models.loftr import LoFTR

    m = LoFTR({"pretrained": None, "max_matches": 1024,
               "match_threshold": 0.0})
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 1, (H, W)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (H, W)), jnp.float32)
    m.match_pair(np.zeros((H, W), np.float32),
                 np.zeros((H, W), np.float32))  # compile
    # grab the compiled program the call above just cached, without
    # reconstructing the cache-key format (round 3 broke this bench by
    # hardcoding a stale key shape after loftr.py:357 extended it)
    assert len(m._jit_match) == 1, list(m._jit_match)
    fn = next(iter(m._jit_match.values()))
    _sync(fn(m.variables, img0, img1))
    best = None
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(m.variables, img0, img1)
        _sync(out)
        dt = (time.time() - t0) / reps
        best = dt if best is None else min(best, dt)
    return 1.0 / best


def bench_localize(n_images=5, n_points=60, C=8, ps=16, reps=8):
    """End-to-end localization throughput (queries/s): synthetic
    featuremetric scene, one image held out as the query, repeated
    QKA -> PnP -> QBA with fresh keypoint noise each repetition."""
    from pixsfm_tpu.features.featuremaps import (FeatureMap, FeaturePatch,
                                                 FeatureSet)
    from pixsfm_tpu.localization import QueryLocalizer
    from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction

    rec = synthetic_reconstruction(n_images=n_images, n_points=n_points,
                                   noise_px=0.0, seed=3)
    rng = np.random.default_rng(3)
    sig = {pid: rng.normal(0, 1, C) for pid in rec.points3D}
    grad = {pid: rng.normal(0, 0.1, (C, 2)) for pid in rec.points3D}
    fset = FeatureSet(channels=C, patch_size=ps, dtype="float32")
    for im in rec.images.values():
        fmap = FeatureMap(is_sparse=True)
        for p2D_idx, pid in enumerate(im.point3D_ids):
            if pid < 0:
                continue
            xy = im.xys[p2D_idx]
            corner = np.floor(xy - ps / 2).astype(np.int64)
            rr, cc = np.meshgrid(np.arange(ps), np.arange(ps), indexing="ij")
            dx = corner[0] + cc + 0.5 - xy[0]
            dy = corner[1] + rr + 0.5 - xy[1]
            patch = (sig[pid][None, None] + grad[pid][None, None, :, 0]
                     * dx[..., None] + grad[pid][None, None, :, 1]
                     * dy[..., None])
            fmap.patches[p2D_idx] = FeaturePatch(
                patch.astype(np.float32), corner, np.array([1.0, 1.0]))
        fset.emplace(im.name, fmap)

    qid = max(rec.images)
    query = rec.images[qid]
    q_cam = rec.cameras[query.camera_id]
    q_fmap = fset.get_map(query.name)
    rec2 = rec.copy()
    for p in rec2.points3D.values():
        p.track = [(i, j) for (i, j) in p.track if i != qid]
    del rec2.images[qid]
    rec2.points3D = {pid: p for pid, p in rec2.points3D.items()
                     if p.track_length >= 2}
    p2D_idxs = [i for i, pid in enumerate(query.point3D_ids)
                if pid >= 0 and pid in rec2.points3D]
    p3D_ids = [int(query.point3D_ids[i]) for i in p2D_idxs]

    class _Mgr:
        num_levels = 1

        def fset(self, i):
            return fset

    loc = QueryLocalizer(
        rec2,
        conf={"interpolation": {"mode": "BICUBIC", "l2_normalize": False},
              "target_reference": "robust_mean",
              "references": {"loss": {"name": "cauchy", "params": [0.25]},
                             "iters": 20, "keep_observations": True},
              "QKA": {"apply": True, "optimizer": {
                  "solver": {"max_num_iterations": 20}}},
              "QBA": {"apply": True, "optimizer": {
                  "solver": {"max_num_iterations": 20}}}},
        dense_features=_Mgr())

    def noisy_kps(seed):
        noisy = query.xys.copy()
        noisy[p2D_idxs] += np.random.default_rng(seed).uniform(
            -0.8, 0.8, (len(p2D_idxs), 2))
        return noisy

    def one(seed):
        out = loc.localize(noisy_kps(seed), p2D_idxs, p3D_ids, q_cam,
                           query_fmaps=[q_fmap])
        assert out["success"]
        return out

    def batch(seed0, B):
        outs = loc.localize_batch([
            dict(keypoints=noisy_kps(seed0 + i), pnp_point2D_idxs=p2D_idxs,
                 pnp_points3D_id=p3D_ids, query_camera=q_cam,
                 query_fmaps=[q_fmap]) for i in range(B)])
        assert all(o["success"] for o in outs)
        return outs

    one(0)  # compile QKA/QBA programs
    best = None
    for r in range(3):
        t0 = time.time()
        for i in range(reps):
            one(100 + r * reps + i)
        dt = (time.time() - t0) / reps
        best = dt if best is None else min(best, dt)

    B = 8
    batch(1000, B)  # compile the batched programs
    best_b = None
    for r in range(3):
        t0 = time.time()
        batch(2000 + r * B, B)
        dt = (time.time() - t0) / B
        best_b = dt if best_b is None else min(best_b, dt)
    return 1.0 / max(best, 1e-9), 1.0 / max(best_b, 1e-9)


def bench_e2e_sacre_coeur(nfeatures=1200):
    """Integrated-pipeline wall-clock (s) on the 10-image real-image gate
    scene: SIFT frontend -> DSIFT featuremetric KA -> lite incremental
    mapper -> full featuremetric BA (refine extrinsics+focal). This is the
    metric BASELINE.md's north star names (end-to-end KA/BA on a real
    scene) at integration level — per-stage microbenches cannot catch
    regressions that live between stages (round 4 shipped a 45% serving
    regression invisibly because only stage benches ran). Fixed seed;
    nfeatures reduced from the gate's 4000 to keep bench wall-clock sane.
    Asserts all 10 images register so a silently-broken pipeline cannot
    report a (fast) time."""
    import importlib.util
    from pathlib import Path

    gate_py = Path(__file__).resolve().parent / "tools" / "sacre_coeur_gate.py"
    spec = importlib.util.spec_from_file_location("_gate_bench", gate_py)
    gate = importlib.util.module_from_spec(spec)
    _argv = sys.argv
    sys.argv = ["gate"]
    try:
        spec.loader.exec_module(gate)
    finally:
        sys.argv = _argv
    if not gate.DATASET.exists():
        raise RuntimeError("sacre_coeur dataset unavailable")

    from pixsfm_tpu import load_config
    from pixsfm_tpu.config import merge
    from pixsfm_tpu.keypoint_adjustment import build_matching_graph
    from pixsfm_tpu.refine_hloc import PixSfM
    from pixsfm_tpu.sfm.mapper import incremental_mapping

    image_dir = gate.DATASET / "mapping"
    names = sorted(p.name for p in image_dir.glob("*.jpg"))
    gt = gate.load_gt(names)

    t0 = time.time()
    kps, matches, scores, cameras = gate.run_frontend(names, gt, nfeatures)
    graph = build_matching_graph(matches, scores)
    conf = merge(load_config("dsift"), {"mapping": {"BA": {"optimizer": {
        "refine_extrinsics": True,
        "refine_focal_length": True,
        "refine_extra_params": True,
        "solver": {"max_num_iterations": 30},
    }}}})
    sfm = PixSfM(conf)
    keypoints, _ = sfm.run_ka({n: kps[n].copy() for n in names}, image_dir,
                              graph=graph)
    rec = incremental_mapping(graph, keypoints, image_dir, cameras=cameras)
    sfm.run_ba(rec, image_dir)
    dt = time.time() - t0
    n_reg = sum(bool(getattr(im, "registered", True))
                for im in rec.images.values())
    if n_reg != len(names):
        raise RuntimeError(
            f"e2e pipeline registered {n_reg}/{len(names)} images")
    print(f"[bench] e2e sacre_coeur: {dt:.1f}s ({n_reg} images, "
          f"{len(rec.points3D)} points)", file=sys.stderr, flush=True)
    return dt


# ---------------------------------------------------------------------------

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

    out = {
        "metric": "ka_featuremetric_keypoint_iterations_per_s",
        "value": round(tpu_rate, 1),
        "unit": "keypoint-LM-iterations/s (K=%d,C=128,ps=16,bf16)" % K,
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }
    for key, fn in (("ba_lm_ms_per_iter_80k_obs", bench_ba_geometric),
                    ("fm_ba_lm_ms_per_iter_20k_obs_c128",
                     bench_ba_featuremetric),
                    ("ba_lm_ms_per_iter_2m_obs_500k_pts", bench_ba_large),
                    ("extract_imgs_per_s", bench_extract),
                    ("loftr_pairs_per_s_480x640", bench_loftr),
                    ("e2e_sacre_coeur_s", bench_e2e_sacre_coeur)):
        try:
            out[key] = round(fn(), 2)
        except Exception as e:  # never lose the headline metric
            print(f"[bench] {key} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            out[key] = None
    try:
        single, batched = bench_localize()
        out["qloc_queries_per_s"] = round(single, 2)
        out["qloc_batch8_queries_per_s"] = round(batched, 2)
    except Exception as e:
        print(f"[bench] qloc failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        out["qloc_queries_per_s"] = None
        out["qloc_batch8_queries_per_s"] = None

    print(json.dumps(out))

    # null-proofing: a broken sub-bench must fail the run loudly, not ship
    # a silent null (round 3 shipped loftr_pairs_per_s_480x640=null for a
    # whole round because the catch-all above masked a KeyError)
    nulls = [k for k, v in out.items() if v is None]
    if nulls:
        print(f"[bench] FAILED metrics: {nulls}", file=sys.stderr, flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
