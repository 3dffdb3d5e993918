"""Featuremetric (feature-reference) BA timing: custom-JVP interpolation
vs differentiating through the window contraction.

Workload: 20 images / 1000 points / 20k observations, C=128 bf16 patches
(one per observation), bicubic + L2. Run manually on TPU:
    python examples/bench_ba_featuremetric.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache

    _enable_compile_cache()
    from pixsfm_tpu.base.cameras import img_from_cam
    from pixsfm_tpu.base.geometry import apply_pose
    from pixsfm_tpu.base.interpolation import (InterpolationConfig,
                                               interpolate,
                                               interpolate_autodiff,
                                               interpolate_residual)
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.ops.schur import (BAObservations, BAOptions, BAState,
                                      ba_solve)

    rng = np.random.default_rng(0)
    I, Np, ps, C = 20, 1000, 16, 128
    model = "SIMPLE_PINHOLE"
    k = 3
    O = I * Np

    xyz = rng.uniform(-1, 1, (Np, 3)).astype(np.float32)
    qvec = np.tile([1.0, 0, 0, 0], (I, 1)).astype(np.float32)
    tvec = np.stack([np.array([0.2 * i - 2.0, 0, 6.0]) for i in range(I)]
                    ).astype(np.float32)
    cams = np.asarray([[800.0, 256.0, 256.0]], np.float32)

    obs_img = np.repeat(np.arange(I, dtype=np.int32), Np)
    obs_pt = np.tile(np.arange(Np, dtype=np.int32), I)
    obs_cam = np.zeros(O, np.int32)

    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True)

    @jax.jit
    def synth(key):
        field = jax.random.normal(key, (ps, ps, C))
        noise = 0.05 * jax.random.normal(jax.random.fold_in(key, 1),
                                         (O, ps, ps, C))
        return (field[None] + noise).astype(jnp.bfloat16)

    patches = synth(jax.random.PRNGKey(0))
    patches.block_until_ready()
    # patch geometry: center of each patch at the reprojection of the point
    corners = np.full((O, 2), -ps / 2, np.float32)   # centered window
    scales = np.ones((O, 2), np.float32) * 8.0
    ups = np.ones(O, np.float32)
    rows = np.arange(O, dtype=np.int32)

    # targets = descriptor at ground-truth projection
    @jax.jit
    def project_all(qv, tv, cm, X):
        def one(i, p):
            x_cam = apply_pose(qv[i], tv[i], X[p])
            return img_from_cam(model, cm[0], x_cam[:2] / x_cam[2])
        return jax.vmap(one)(jnp.asarray(obs_img), jnp.asarray(obs_pt))

    xy_gt = project_all(jnp.asarray(qvec), jnp.asarray(tvec),
                        jnp.asarray(cams), jnp.asarray(xyz))
    # center patches on the GT reprojection: corner = xy*scale - ps/2
    corners = np.asarray(xy_gt) * scales - ps / 2

    scales_j = jnp.asarray(scales)
    corners_j = jnp.asarray(corners)
    ups_j = jnp.asarray(ups)

    @jax.jit
    def targets_of(patches):
        def one(row, xy):
            pc = (xy * scales_j[row] - 0.5 - corners_j[row]) * ups_j[row]
            return interpolate(patches[row], pc[1], pc[0], interp)
        return jax.vmap(one)(jnp.asarray(rows), xy_gt)

    targets = targets_of(patches)
    targets.block_until_ready()

    ctx = (patches, jnp.asarray(corners), jnp.asarray(scales),
           jnp.asarray(ups))
    obs_data = (jnp.asarray(rows), targets)

    state0 = BAState(
        jnp.asarray(qvec),
        jnp.asarray(tvec + rng.normal(0, 0.01, tvec.shape).astype(np.float32)),
        jnp.asarray(cams),
        jnp.asarray(xyz + rng.normal(0, 0.01, xyz.shape).astype(np.float32)))
    obs = BAObservations(
        img_idx=jnp.asarray(obs_img), cam_idx=jnp.asarray(obs_cam),
        pt_idx=jnp.asarray(obs_pt), obs_data=obs_data,
        valid=jnp.ones((O,), bool),
        pair_o1=jnp.zeros(4, jnp.int32) + O,
        pair_o2=jnp.zeros(4, jnp.int32) + O)
    loss = RobustLoss("cauchy", [0.25])
    pose_free = np.ones(I, bool)
    pose_free[0] = False
    tvec_free = np.ones((I, 3), bool)
    tvec_free[1, 0] = False
    args = (jnp.asarray(pose_free), jnp.asarray(tvec_free),
            jnp.zeros((1, k), bool), jnp.ones(Np, bool))

    def sync(x):
        return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

    def make_residual(interp_fn, windowed):
        def residual_fn(q, t, cam, X, obs_slice, ctx):
            row, target = obs_slice
            patches, corners_, scales_, ups_ = ctx
            x_cam = apply_pose(q, t, X)
            z = jnp.where(jnp.abs(x_cam[2]) < 1e-8, 1e-8, x_cam[2])
            xy = img_from_cam(model, cam, x_cam[:2] / z)
            pc = (xy * scales_[row] - 0.5 - corners_[row]) * ups_[row]
            if windowed:
                f = interp_fn(patches, row, pc[1], pc[0], interp)
            else:
                f = interp_fn(patches[row], pc[1], pc[0], interp)
            return f - target
        return residual_fn

    for name, fn, windowed in (("plain-AD", interpolate, False),
                               ("custom-JVP", interpolate_autodiff, False),
                               ("windowed", interpolate_residual, True)):
        ts = {}
        for iters in (2, 10):
            opts = BAOptions(max_iterations=iters, linear_solver="cg",
                             obs_chunk=4096,
                             max_linear_solver_iterations=50)
            run = jax.jit(lambda s, o, c: ba_solve(
                make_residual(fn, windowed), s, o, loss, *args, opts=opts,
                ctx=c))
            t0 = time.time()
            st, summ = run(state0, obs, ctx)
            c0, c1 = float(summ["initial_cost"]), float(summ["final_cost"])
            t_first = time.time() - t0
            t0 = time.time()
            st, summ = run(state0, obs, ctx)
            sync(summ["final_cost"])
            ts[iters] = time.time() - t0
            print(f"{name}: iters={iters} first={t_first:.1f}s "
                  f"steady={ts[iters]:.3f}s cost {c0:.2f}->{c1:.4f}",
                  flush=True)
        print(f"{name}: per-LM-iteration {(ts[10]-ts[2])/8*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
