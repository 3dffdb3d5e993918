"""Analytic-Jacobian BA fast path vs the generic jacfwd path.

The residual_jac builders in bundle_adjustment/main.py must reproduce, per
observation, exactly the Jacobian jax.jacfwd computes through residual_fn in
ops/schur.py's tangent convention; and ba_solve must converge to the same
solution either way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixsfm_tpu.base.geometry import exp_quat, quat_mul, quat_normalize
from pixsfm_tpu.base.interpolation import InterpolationConfig
from pixsfm_tpu.base.losses import RobustLoss
from pixsfm_tpu.bundle_adjustment.main import (_RESIDUAL_BUILDERS,
                                               _RESIDUAL_JAC_BUILDERS)
from pixsfm_tpu.ops.schur import (BAObservations, BAOptions, BAState,
                                  ba_solve, make_pair_list)
from pixsfm_tpu.util.jit_cache import interp_static_key


def _tangent_wrap(rfn, q0, t0, cam0, X0, sl, ctx, k):
    def rtan(d):
        q = quat_normalize(quat_mul(exp_quat(d[:3]), q0))
        t = t0 + d[3:6]
        c = cam0 + d[6:6 + k]
        X = X0 + d[6 + k:]
        return rfn(q, t, c, X, sl, ctx)
    return rtan


def _fm_ctx(rng, N=3, H=16, W=16, C=8):
    patches = jnp.asarray(rng.normal(0, 1, (N, H, W, C)), jnp.float32)
    corners = jnp.zeros((N, 2), jnp.float32)
    scales = jnp.full((N, 2), 0.05, jnp.float32)
    ups = jnp.ones((N,), jnp.float32)
    return (patches, corners, scales, ups)


@pytest.mark.parametrize("check_bounds", [False, True])
def test_feature_reference_jac_parity(rng, check_bounds):
    model = "SIMPLE_RADIAL"
    k = 4
    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True,
                                 check_bounds=check_bounds)
    ikey = interp_static_key(interp)
    rfn = _RESIDUAL_BUILDERS["feature_reference"](model, ikey)
    jfn = _RESIDUAL_JAC_BUILDERS["feature_reference"](model, ikey)
    assert jfn is not None

    ctx = _fm_ctx(rng)
    cam0 = jnp.asarray([200.0, 160.0, 120.0, 0.05], jnp.float32)
    q0 = quat_normalize(jnp.asarray(rng.normal(0, 1, (4,)), jnp.float32))
    t0 = jnp.asarray(rng.normal(0, 0.2, (3,)), jnp.float32)
    target = jnp.asarray(rng.normal(0, 1, (8,)), jnp.float32)
    for row in range(3):
        # choose X so the patch coordinate lands inside (or, when
        # check_bounds, sometimes outside) the window
        from pixsfm_tpu.base.geometry import invert_pose, apply_pose
        px = rng.uniform(-2, 18) if check_bounds else rng.uniform(2, 13)
        py = rng.uniform(2, 13)
        # pix such that pc = pix*scale - 0.5 = (px, py)
        pix = (np.array([px, py]) + 0.5) / 0.05
        uvn = (pix - np.array([160.0, 120.0])) / 200.0
        # ignore distortion for seeding (parity holds anywhere)
        Xc = np.array([uvn[0] * 3.0, uvn[1] * 3.0, 3.0])
        qi, ti = invert_pose(q0, t0)
        X0 = apply_pose(qi, ti, jnp.asarray(Xc, jnp.float32))
        sl = (jnp.asarray(row, jnp.int32), target)

        rtan = _tangent_wrap(rfn, q0, t0, cam0, X0, sl, ctx, k)
        r_ref = rtan(jnp.zeros(6 + k + 3, jnp.float32))
        J_ref = jax.jacfwd(rtan)(jnp.zeros(6 + k + 3, jnp.float32))
        r, J = jfn(q0, t0, cam0, X0, sl, ctx)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                                   rtol=1e-5, atol=1e-5)
        scale = np.abs(np.asarray(J_ref)).max() + 1e-3
        np.testing.assert_allclose(np.asarray(J) / scale,
                                   np.asarray(J_ref) / scale, atol=3e-5)


def test_costmap_jac_parity(rng):
    model = "PINHOLE"
    k = 4
    interp = InterpolationConfig(mode="BICUBICGRADIENTFIELD",
                                 l2_normalize=False, check_bounds=True)
    ikey = interp_static_key(interp)
    rfn = _RESIDUAL_BUILDERS["costmap"](model, ikey)
    jfn = _RESIDUAL_JAC_BUILDERS["costmap"](model, ikey)
    assert jfn is not None

    N, H, W, C = 2, 12, 12, 3
    patches = jnp.asarray(
        np.abs(rng.normal(0, 1, (N, H, W, C))), jnp.float32)
    ctx = (patches, jnp.zeros((N, 2), jnp.float32),
           jnp.full((N, 2), 0.04, jnp.float32), jnp.ones((N,), jnp.float32))
    cam0 = jnp.asarray([180.0, 190.0, 160.0, 120.0], jnp.float32)
    q0 = quat_normalize(jnp.asarray(rng.normal(0, 1, (4,)), jnp.float32))
    t0 = jnp.asarray(rng.normal(0, 0.2, (3,)), jnp.float32)
    from pixsfm_tpu.base.geometry import invert_pose, apply_pose
    Xc = np.array([0.1, -0.05, 4.0])
    qi, ti = invert_pose(q0, t0)
    X0 = apply_pose(qi, ti, jnp.asarray(Xc, jnp.float32))
    sl = jnp.asarray(1, jnp.int32)

    rtan = _tangent_wrap(rfn, q0, t0, cam0, X0, sl, ctx, k)
    r_ref = rtan(jnp.zeros(6 + k + 3, jnp.float32))
    J_ref = jax.jacfwd(rtan)(jnp.zeros(6 + k + 3, jnp.float32))
    r, J = jfn(q0, t0, cam0, X0, sl, ctx)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=1e-5, atol=1e-5)
    scale = np.abs(np.asarray(J_ref)).max() + 1e-3
    np.testing.assert_allclose(np.asarray(J) / scale,
                               np.asarray(J_ref) / scale, atol=3e-5)


def test_mixed_geometric_jac_parity(rng):
    models = ("SIMPLE_PINHOLE", "SIMPLE_RADIAL")
    k = 4  # padded to the widest model
    rfn = _RESIDUAL_BUILDERS["geometric"](models)
    jfn = _RESIDUAL_JAC_BUILDERS["geometric"](models)
    cam0 = jnp.asarray([210.0, 160.0, 120.0, 0.04], jnp.float32)
    q0 = quat_normalize(jnp.asarray(rng.normal(0, 1, (4,)), jnp.float32))
    t0 = jnp.asarray(rng.normal(0, 0.2, (3,)), jnp.float32)
    from pixsfm_tpu.base.geometry import invert_pose, apply_pose
    qi, ti = invert_pose(q0, t0)
    X0 = apply_pose(qi, ti, jnp.asarray([0.2, -0.1, 3.5], jnp.float32))
    for mi in (0, 1):
        sl = (jnp.asarray([100.0, 110.0], jnp.float32),
              jnp.asarray(mi, jnp.int32))
        rtan = _tangent_wrap(rfn, q0, t0, cam0, X0, sl, (), k)
        J_ref = jax.jacfwd(rtan)(jnp.zeros(6 + k + 3, jnp.float32))
        r, J = jfn(q0, t0, cam0, X0, sl, ())
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(rtan(jnp.zeros(13, jnp.float32))),
            rtol=1e-5, atol=1e-4)
        scale = np.abs(np.asarray(J_ref)).max() + 1e-3
        np.testing.assert_allclose(np.asarray(J) / scale,
                                   np.asarray(J_ref) / scale, atol=3e-5)


def test_mixed_feature_reference_jac_parity(rng):
    """Mixed-model featuremetric residual: the per-obs lax.switch analytic
    Jacobian must match jacfwd through the switched residual."""
    models = ("SIMPLE_PINHOLE", "SIMPLE_RADIAL")
    k = 4  # padded to the widest model
    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True,
                                 check_bounds=True)
    ikey = interp_static_key(interp)
    rfn = _RESIDUAL_BUILDERS["feature_reference"](models, ikey)
    jfn = _RESIDUAL_JAC_BUILDERS["feature_reference"](models, ikey)
    assert jfn is not None

    ctx = _fm_ctx(rng)
    cam0 = jnp.asarray([200.0, 160.0, 120.0, 0.04], jnp.float32)
    q0 = quat_normalize(jnp.asarray(rng.normal(0, 1, (4,)), jnp.float32))
    t0 = jnp.asarray(rng.normal(0, 0.2, (3,)), jnp.float32)
    target = jnp.asarray(rng.normal(0, 1, (8,)), jnp.float32)
    from pixsfm_tpu.base.geometry import invert_pose, apply_pose
    qi, ti = invert_pose(q0, t0)
    X0 = apply_pose(qi, ti, jnp.asarray([0.05, -0.03, 3.0], jnp.float32))
    for mi in (0, 1):
        sl = (jnp.asarray(1, jnp.int32), target, jnp.asarray(mi, jnp.int32))
        rtan = _tangent_wrap(rfn, q0, t0, cam0, X0, sl, ctx, k)
        r_ref = rtan(jnp.zeros(6 + k + 3, jnp.float32))
        J_ref = jax.jacfwd(rtan)(jnp.zeros(6 + k + 3, jnp.float32))
        r, J = jfn(q0, t0, cam0, X0, sl, ctx)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                                   rtol=1e-5, atol=1e-5)
        scale = np.abs(np.asarray(J_ref)).max() + 1e-3
        np.testing.assert_allclose(np.asarray(J) / scale,
                                   np.asarray(J_ref) / scale, atol=3e-5)


def test_ba_solve_same_solution_with_jac_path(rng):
    """Full geometric BA: the analytic path must reach the same optimum."""
    from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction
    from pixsfm_tpu.bundle_adjustment.problem import pack_ba_problem

    rec = synthetic_reconstruction(n_images=4, n_points=30, noise_px=0.5,
                                   seed=3)
    packed = pack_ba_problem(rec)
    model = packed.cam_model
    rfn = _RESIDUAL_BUILDERS["geometric"]((model,))
    jfn = _RESIDUAL_JAC_BUILDERS["geometric"]((model,))

    O = len(packed.obs_img)
    pair_o1, pair_o2 = make_pair_list(packed.obs_pt, len(packed.point_ids))
    obs = BAObservations(
        img_idx=jnp.asarray(packed.obs_img),
        cam_idx=jnp.asarray(packed.obs_cam),
        pt_idx=jnp.asarray(packed.obs_pt),
        obs_data=jnp.asarray(packed.obs_xy, jnp.float32),
        valid=jnp.ones((O,), bool),
        pair_o1=jnp.asarray(pair_o1), pair_o2=jnp.asarray(pair_o2))
    state0 = BAState(jnp.asarray(packed.qvec), jnp.asarray(packed.tvec),
                     jnp.asarray(packed.cams), jnp.asarray(packed.xyz))
    args = (jnp.asarray(packed.pose_free), jnp.asarray(packed.tvec_free),
            jnp.asarray(packed.cam_free), jnp.asarray(packed.point_free))
    opts = BAOptions(max_iterations=15, obs_chunk=64)
    loss = RobustLoss("trivial")

    def rfn_ctx(q, t, c, X, sl, ctx):
        return rfn(q, t, c, X, sl, ctx)

    st_ref, sum_ref = ba_solve(rfn_ctx, state0, obs, loss, *args, opts=opts)
    st_fast, sum_fast = ba_solve(rfn_ctx, state0, obs, loss, *args, opts=opts,
                                 residual_jac_fn=jfn)
    ref_final = float(sum_ref["final_cost"])
    fast_final = float(sum_fast["final_cost"])
    assert fast_final <= float(sum_fast["initial_cost"])
    np.testing.assert_allclose(fast_final, ref_final,
                               rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_fast.xyz),
                               np.asarray(st_ref.xyz), atol=2e-3)
