import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixsfm_tpu.base import (
    apply_pose, cam_from_img, exp_quat, img_from_cam, invert_pose, log_quat,
    pose_update, quat_mul, quat_normalize, quat_rotate, quat_to_rotmat,
    rotmat_to_quat, world_to_pixel,
)
from pixsfm_tpu.base.cameras import CAMERA_MODELS, Camera
from pixsfm_tpu.base.projection import calculate_depth, pixel_to_world


def random_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def test_quat_rotate_matches_matrix(rng):
    for _ in range(10):
        q = random_quat(rng)
        v = rng.normal(size=3)
        R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        out = np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        np.testing.assert_allclose(out, R @ v, atol=1e-5)


def test_rotmat_quat_roundtrip(rng):
    for _ in range(20):
        q = random_quat(rng)
        if q[0] < 0:
            q = -q
        R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        q2 = np.asarray(rotmat_to_quat(jnp.asarray(R)))
        np.testing.assert_allclose(q2, q, atol=1e-5)


def test_exp_log_roundtrip(rng):
    for scale in [1e-8, 0.1, 1.0, 3.0]:
        phi = rng.normal(size=3)
        phi = phi / np.linalg.norm(phi) * scale
        q = exp_quat(jnp.asarray(phi))
        phi2 = np.asarray(log_quat(q))
        np.testing.assert_allclose(phi2, phi, atol=1e-5)


def test_pose_inverse(rng):
    q = random_quat(rng)
    t = rng.normal(size=3)
    X = rng.normal(size=3)
    x_cam = apply_pose(jnp.asarray(q), jnp.asarray(t), jnp.asarray(X))
    qi, ti = invert_pose(jnp.asarray(q), jnp.asarray(t))
    X2 = apply_pose(qi, ti, x_cam)
    np.testing.assert_allclose(np.asarray(X2), X, atol=1e-5)


@pytest.mark.parametrize("model,params", [
    ("SIMPLE_PINHOLE", [500.0, 320.0, 240.0]),
    ("PINHOLE", [500.0, 520.0, 320.0, 240.0]),
    ("SIMPLE_RADIAL", [500.0, 320.0, 240.0, 0.05]),
    ("RADIAL", [500.0, 320.0, 240.0, 0.05, -0.01]),
    ("OPENCV", [500.0, 520.0, 320.0, 240.0, 0.05, -0.01, 0.001, -0.002]),
    ("OPENCV_FISHEYE", [500.0, 520.0, 320.0, 240.0, 0.05, -0.01, 0.001,
                        -0.002]),
])
def test_camera_roundtrip(model, params, rng):
    from pixsfm_tpu.base.cameras import cam_from_img_jit, img_from_cam_jit
    params = jnp.asarray(params)
    uv = jnp.asarray(rng.uniform(-0.3, 0.3, size=(20, 2)))
    xy = img_from_cam_jit(model)(params, uv)
    uv2 = cam_from_img_jit(model)(params, xy)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-4)


def test_projection_and_depth(rng):
    q = jnp.asarray(random_quat(rng))
    t = jnp.asarray(rng.normal(size=3))
    params = jnp.asarray([500.0, 320.0, 240.0, 0.05])
    X = jnp.asarray(rng.normal(size=3) + np.array([0, 0, 5.0]))
    xy = world_to_pixel("SIMPLE_RADIAL", params, q, t, X)
    d = calculate_depth(q, t, X)
    X2 = pixel_to_world("SIMPLE_RADIAL", params, q, t, xy, d)
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X), atol=1e-3)


def test_projection_gradients_finite(rng):
    q = jnp.asarray(random_quat(rng))
    t = jnp.asarray(rng.normal(size=3))
    params = jnp.asarray([500.0, 320.0, 240.0, 0.05])
    X = jnp.asarray(rng.normal(size=3) + np.array([0, 0, 5.0]))

    J = jax.jacfwd(lambda x: world_to_pixel("SIMPLE_RADIAL", params, q, t, x))(X)
    assert np.all(np.isfinite(np.asarray(J)))
    # finite differences check
    eps = 1e-2  # f32 pixel values ~1e2: keep the finite-difference step large
    for i in range(3):
        dX = np.zeros(3)
        dX[i] = eps
        f1 = world_to_pixel("SIMPLE_RADIAL", params, q, t, X + dX)
        f0 = world_to_pixel("SIMPLE_RADIAL", params, q, t, X - dX)
        fd = (np.asarray(f1) - np.asarray(f0)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J)[:, i], fd, rtol=2e-2,
                                   atol=2e-2)


def test_camera_dataclass():
    cam = Camera(1, "SIMPLE_RADIAL", 640, 480, [500.0, 320.0, 240.0, 0.01])
    assert cam.model_id == CAMERA_MODELS["SIMPLE_RADIAL"].model_id
    xy = cam.img_from_cam(np.array([0.1, -0.2]))
    uv = cam.cam_from_img(xy)
    np.testing.assert_allclose(uv, [0.1, -0.2], atol=1e-5)
