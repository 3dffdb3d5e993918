"""Closed-form projection Jacobian vs generic jacfwd, all camera models.

``project_with_jac`` must reproduce exactly what ``jax.jacfwd`` computes
through the BA residual chain (exp_quat pose update -> apply_pose ->
perspective divide -> img_from_cam) in ops/schur.py's tangent convention —
it replaces that jacfwd in the hot loop, so any deviation is a solver bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixsfm_tpu.base.cameras import CAMERA_MODELS, img_from_cam
from pixsfm_tpu.base.geometry import (apply_pose, exp_quat, quat_mul,
                                      quat_normalize)
from pixsfm_tpu.base.projection import project_with_jac

TEST_PARAMS = {
    "SIMPLE_PINHOLE": [320.0, 160.0, 120.0],
    "PINHOLE": [300.0, 310.0, 160.0, 120.0],
    "SIMPLE_RADIAL": [320.0, 160.0, 120.0, 0.08],
    "RADIAL": [320.0, 160.0, 120.0, 0.06, -0.02],
    "OPENCV": [300.0, 310.0, 160.0, 120.0, 0.05, -0.01, 0.002, -0.001],
    "OPENCV_FISHEYE": [300.0, 310.0, 160.0, 120.0, 0.03, -0.01, 0.004,
                       -0.002],
}


def _chain(model, k):
    """Residual chain as ops/schur.py obs_residual traces it, over the
    (6+k+3)-dim tangent."""
    def pix_of_tangent(d, qvec, tvec, cam, X):
        q = quat_normalize(quat_mul(exp_quat(d[:3]), qvec))
        t = tvec + d[3:6]
        c = cam + d[6:6 + k]
        Xp = X + d[6 + k:]
        x_cam = apply_pose(q, t, Xp)
        z = x_cam[2]
        z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        uv = x_cam[:2] / z
        return img_from_cam(model, c, uv)
    return pix_of_tangent


@pytest.mark.parametrize("model", sorted(TEST_PARAMS))
def test_project_with_jac_matches_jacfwd(model, rng):
    k = CAMERA_MODELS[model].num_params
    cam = jnp.asarray(TEST_PARAMS[model], jnp.float32)
    chain = _chain(model, k)
    for trial in range(4):
        q = quat_normalize(jnp.asarray(
            rng.normal(0, 1, (4,)), jnp.float32))
        t = jnp.asarray(rng.normal(0, 0.5, (3,)), jnp.float32)
        # points in front of the camera, moderate field angle
        X_cam = np.array([rng.uniform(-0.4, 0.4), rng.uniform(-0.4, 0.4),
                          rng.uniform(2.0, 6.0)])
        # pull back to world: X = R^T (X_cam - t)
        from pixsfm_tpu.base.geometry import invert_pose
        qi, ti = invert_pose(q, t)
        X = apply_pose(qi, ti, jnp.asarray(X_cam, jnp.float32))

        pix, J_pose, J_cam, J_X = project_with_jac(model, cam, q, t, X)
        J_ref = jax.jacfwd(chain)(jnp.zeros(6 + k + 3, jnp.float32),
                                  q, t, cam, X)
        pix_ref = chain(jnp.zeros(6 + k + 3, jnp.float32), q, t, cam, X)

        np.testing.assert_allclose(np.asarray(pix), np.asarray(pix_ref),
                                   rtol=1e-5, atol=1e-4)
        J = jnp.concatenate([J_pose, J_cam, J_X], axis=1)
        scale = np.abs(np.asarray(J_ref)).max() + 1.0
        np.testing.assert_allclose(
            np.asarray(J) / scale, np.asarray(J_ref) / scale,
            atol=2e-5, err_msg=f"{model} trial {trial}")


def test_fisheye_center_is_finite():
    """r -> 0 limit of the fisheye Jacobian (Taylor branch)."""
    model = "OPENCV_FISHEYE"
    cam = jnp.asarray(TEST_PARAMS[model], jnp.float32)
    q = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    X = jnp.asarray([0.0, 0.0, 3.0], jnp.float32)  # exactly on-axis
    pix, J_pose, J_cam, J_X = project_with_jac(model, cam, q, t, X)
    for a in (pix, J_pose, J_cam, J_X):
        assert np.isfinite(np.asarray(a)).all()
    # on-axis: dpix/duv = diag(fx, fy) (scale == 1, derivative limit finite)
    np.testing.assert_allclose(np.asarray(J_X[:, :2] * 3.0),
                               np.diag(np.asarray(cam[:2])), rtol=1e-4)
