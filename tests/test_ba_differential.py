"""Differential BA test: our Schur LM vs scipy.optimize.least_squares (TRF)
on the same synthetic problem — the reference's oracle pattern of checking its
BA against a trusted independent solver (bundle_optimizer_test.cc vs
colmap::BundleAdjuster)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixsfm_tpu.base.cameras import img_from_cam
from pixsfm_tpu.base.geometry import (apply_pose, exp_quat, quat_mul,
                                      quat_normalize)
from pixsfm_tpu.bundle_adjustment import GeometricBundleAdjuster
from pixsfm_tpu.bundle_adjustment.problem import pack_ba_problem
from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction as synth
from tests.test_bundle_adjustment import perturb


def scipy_geometric_ba(rec, packed):
    """Reference solve with scipy TRF over the same parameterization:
    pose tangents (6 per free image), free camera params, free points."""
    from scipy.optimize import least_squares

    I = len(packed.image_ids)
    Np = len(packed.point_ids)
    k = packed.cams.shape[1]
    model = packed.cam_model

    q0 = jnp.asarray(packed.qvec, jnp.float64)
    t0 = jnp.asarray(packed.tvec, jnp.float64)
    c0 = jnp.asarray(packed.cams, jnp.float64)
    x0 = jnp.asarray(packed.xyz, jnp.float64)
    obs_img = jnp.asarray(packed.obs_img)
    obs_cam = jnp.asarray(packed.obs_cam)
    obs_pt = jnp.asarray(packed.obs_pt)
    obs_xy = jnp.asarray(packed.obs_xy, jnp.float64)

    pose_mask = np.repeat(packed.pose_free[:, None], 6, axis=1)
    pose_mask[:, 3:] &= packed.tvec_free
    masks = np.concatenate([pose_mask.reshape(-1),
                            packed.cam_free.reshape(-1),
                            np.repeat(packed.point_free, 3)])
    n_params = masks.size

    def unpack(theta_free):
        theta = jnp.zeros(n_params, jnp.float64)
        theta = theta.at[jnp.asarray(np.nonzero(masks)[0])].set(theta_free)
        dp = theta[:6 * I].reshape(I, 6)
        dc = theta[6 * I:6 * I + k * c0.shape[0]].reshape(-1, k)
        dx = theta[6 * I + k * c0.shape[0]:].reshape(Np, 3)
        q = quat_normalize(quat_mul(exp_quat(dp[:, :3]), q0))
        return q, t0 + dp[:, 3:], c0 + dc, x0 + dx

    @jax.jit
    def residuals(theta_free):
        q, t, c, x = unpack(theta_free)

        def per_obs(ii, ci, pi, xy):
            x_cam = apply_pose(q[ii], t[ii], x[pi])
            uv = x_cam[:2] / x_cam[2]
            return img_from_cam(model, c[ci], uv) - xy

        r = jax.vmap(per_obs)(obs_img, obs_cam, obs_pt, obs_xy)
        return r.reshape(-1)

    jac = jax.jit(jax.jacfwd(residuals))
    theta0 = np.zeros(int(masks.sum()))
    sol = least_squares(lambda th: np.asarray(residuals(jnp.asarray(th))),
                        theta0,
                        jac=lambda th: np.asarray(jac(jnp.asarray(th))),
                        method="trf", xtol=1e-12, ftol=1e-12, gtol=1e-12)
    q, t, c, x = unpack(jnp.asarray(sol.x))
    return (np.asarray(q), np.asarray(t), np.asarray(c), np.asarray(x),
            0.5 * float(np.sum(sol.fun ** 2)))


@pytest.mark.parametrize("flags", [
    dict(refine_focal_length=False, refine_extra_params=False),
    dict(refine_focal_length=True, refine_extra_params=True),
])
def test_geometric_ba_matches_scipy(flags, rng):
    rec = synth(n_images=3, n_points=40, noise_px=0.4, seed=31)
    perturb(rec, rng, pose_rot=0.004, pose_t=0.02, point_sigma=0.02)

    rec_ours = rec.copy()
    adj = GeometricBundleAdjuster({
        "optimizer": {**flags,
                      "solver": {"max_num_iterations": 80,
                                 "use_inner_iterations": False}}})
    out = adj.refine(rec_ours)

    packed = pack_ba_problem(rec, **flags)
    q_s, t_s, c_s, x_s, cost_s = scipy_geometric_ba(rec, packed)

    # final costs agree closely (both near the common local optimum)
    assert out["final_cost"] <= cost_s * 1.05 + 1e-4, \
        f"ours {out['final_cost']} vs scipy {cost_s}"

    # poses agree
    for slot, iid in enumerate(packed.image_ids):
        im = rec_ours.images[iid]
        dot = abs(np.dot(im.qvec / np.linalg.norm(im.qvec),
                         q_s[slot] / np.linalg.norm(q_s[slot])))
        assert dot > 1 - 1e-5
        np.testing.assert_allclose(im.tvec, t_s[slot], atol=5e-3)
    # points agree on average
    errs = [np.linalg.norm(rec_ours.points3D[pid].xyz - x_s[s])
            for s, pid in enumerate(packed.point_ids)]
    assert np.median(errs) < 5e-3
