"""Large-scene geometric BA timing on the current backend.

Workload: 40 images / 2000 points / ~80k observations (every point in every
image), SIMPLE_RADIAL, pixel noise — the scale of a mid-size ETH3D scene.
Times ba_solve at several iteration counts to separate compile and
per-iteration cost, for both Schur paths (dense pair-reduction and
matrix-free CG). Run manually: python examples/bench_ba.py
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
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.ops.schur import (BAObservations, BAOptions, BAState,
                                      ba_solve, make_pair_list)

    rng = np.random.default_rng(0)
    I, Np = 40, 2000
    model = "SIMPLE_RADIAL"
    k = 4

    # cameras on a ring looking at a point cloud in the unit box
    xyz = rng.uniform(-1, 1, (Np, 3)).astype(np.float32)
    angles = np.linspace(0, 2 * np.pi, I, endpoint=False)
    tvecs, qvecs = [], []
    for a in angles:
        # camera at radius 4, looking at origin: R maps world->cam
        c = np.array([4 * np.cos(a), 0.4 * np.sin(3 * a), 4 * np.sin(a)])
        z = -c / np.linalg.norm(c)
        x = np.cross(np.array([0, 1.0, 0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        t = -R @ c
        tr = np.trace(R)
        qw = np.sqrt(max(1 + tr, 1e-12)) / 2
        qx = (R[2, 1] - R[1, 2]) / (4 * qw)
        qy = (R[0, 2] - R[2, 0]) / (4 * qw)
        qz = (R[1, 0] - R[0, 1]) / (4 * qw)
        qvecs.append([qw, qx, qy, qz])
        tvecs.append(t)
    qvec = np.asarray(qvecs, np.float32)
    tvec = np.asarray(tvecs, np.float32)
    cams = np.asarray([[1000.0, 512.0, 384.0, 0.01]], np.float32)

    import jax.numpy as jnp

    def residual_fn(q, t, cam, X, obs_slice):
        x_cam = apply_pose(q, t, X)
        z = jnp.where(jnp.abs(x_cam[2]) < 1e-8, 1e-8, x_cam[2])
        return img_from_cam(model, cam, x_cam[:2] / z) - obs_slice

    # project ground truth to make observations (+noise), then perturb state
    obs_img = np.repeat(np.arange(I, dtype=np.int32), Np)
    obs_pt = np.tile(np.arange(Np, dtype=np.int32), I)
    obs_cam = np.zeros(I * Np, np.int32)

    def proj_np(qv, tv, X):
        w, x, y, z = qv
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        xc = X @ R.T + tv
        uv = xc[:, :2] / xc[:, 2:3]
        r2 = (uv ** 2).sum(1, keepdims=True)
        d = 1 + cams[0, 3] * r2
        return cams[0, 0] * uv * d + cams[0, 1:3]

    xy = np.concatenate([proj_np(qvec[i], tvec[i], xyz)
                         for i in range(I)]).astype(np.float32)
    xy += rng.normal(0, 0.5, xy.shape).astype(np.float32)

    O = len(obs_img)
    po1, po2 = make_pair_list(obs_pt, Np)
    print(f"O={O}, Q={len(po1)} pairs", flush=True)

    state0 = BAState(jnp.asarray(qvec),
                     jnp.asarray(tvec + rng.normal(0, 0.02, tvec.shape)
                                 .astype(np.float32)),
                     jnp.asarray(cams),
                     jnp.asarray(xyz + rng.normal(0, 0.02, xyz.shape)
                                 .astype(np.float32)))
    obs = BAObservations(
        img_idx=jnp.asarray(obs_img), cam_idx=jnp.asarray(obs_cam),
        pt_idx=jnp.asarray(obs_pt), obs_data=jnp.asarray(xy),
        valid=jnp.ones((O,), bool),
        pair_o1=jnp.asarray(po1), pair_o2=jnp.asarray(po2))
    loss = RobustLoss("trivial")
    pose_free = np.ones(I, bool)
    pose_free[0] = False
    tvec_free = np.ones((I, 3), bool)
    tvec_free[1, 0] = False
    args = (jnp.asarray(pose_free), jnp.asarray(tvec_free),
            jnp.ones((1, k), bool), jnp.ones(Np, bool))

    def sync(x):
        return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

    import os
    solvers = os.environ.get("SOLVERS", "cg,dense").split(",")
    for solver in solvers:
        ts = {}
        for iters in (0, 2, 12):
            if solver == "dense" and iters == 0:
                continue
            import os
            oc = int(os.environ.get("OBS_CHUNK", 8192))
            opts = BAOptions(max_iterations=iters, linear_solver=solver,
                             obs_chunk=oc,
                             max_linear_solver_iterations=50)
            run = jax.jit(lambda s, o: ba_solve(
                residual_fn, s, o, loss, *args, opts=opts))
            t0 = time.time()
            st, summ = run(state0, obs)
            c0, c1 = float(summ["initial_cost"]), float(summ["final_cost"])
            t_first = time.time() - t0
            t0 = time.time()
            st, summ = run(state0, obs)
            sync(summ["final_cost"])
            ts[iters] = time.time() - t0
            print(f"{solver}: iters={iters} first={t_first:.1f}s "
                  f"steady={ts[iters]:.3f}s cost {c0:.1f}->{c1:.1f}",
                  flush=True)
        per_iter = (ts[12] - ts[2]) / 10
        print(f"{solver}: per-LM-iteration {per_iter*1e3:.1f} ms"
              + (f" (jac eval+cost ~{ts[0]*1e3:.0f} ms)" if 0 in ts else ""),
              flush=True)


if __name__ == "__main__":
    main()
