"""Differentiable projection helpers (reference: pixsfm/base/src/projection.h).

All functions are pure jnp and broadcast/vmap-friendly, replacing the reference's
Jet-templated C++ (``WorldToPixel`` projection.h:60-75, ``PixelToWorld`` :41-57,
``CalculateDepth`` :20-38).
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import (apply_pose, quat_conj, quat_normalize, quat_rotate,
                       quat_to_rotmat)
from .cameras import cam_from_img, img_from_cam, img_from_cam_with_jac

__all__ = [
    "world_to_pixel", "pixel_to_world", "calculate_depth", "point_in_front",
    "project_with_jac",
]


def _skew(v):
    z = jnp.zeros((), v.dtype)
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z])])


def project_with_jac(model: str, cam_params, qvec, tvec, X, z_eps=1e-8):
    """World point -> pixel, with the closed-form observation Jacobian.

    Returns ``(pix [2], J_pose [2, 6], J_cam [2, k], J_X [2, 3])`` for the LM
    tangent convention of :func:`pixsfm_tpu.ops.schur.ba_solve`: pose tangent
    ``[omega(3), dt(3)]`` applied as ``q' = exp(omega) q, t' = t + dt``.

    The rotation/translation/point columns come from the group identities
    ``d x_cam/d omega = -[R X]_x``, ``d x_cam/dt = I``, ``d x_cam/dX = R``
    composed with the perspective-divide Jacobian and the per-model analytic
    camera derivative (:func:`pixsfm_tpu.base.cameras.img_from_cam_with_jac`)
    — the hand-written equivalent of what the reference's Ceres Jets compute
    through projection.h:60-75 + the camera model templates, replacing
    generic ``jax.jacfwd`` over the whole (6+k+3)-dim tangent in the BA
    residual hot loop.
    """
    R = quat_to_rotmat(qvec)        # normalizes internally (s = 2/|q|^2)
    RX = R @ X
    x_cam = RX + tvec
    z = x_cam[2]
    z = jnp.where(jnp.abs(z) < z_eps, z_eps, z)
    inv_z = 1.0 / z
    uv = x_cam[:2] * inv_z
    pix, J_uv, J_cam = img_from_cam_with_jac(model, cam_params, uv)
    # duv/dx_cam = [[1/z, 0, -u/z], [0, 1/z, -v/z]]
    duv_dxc = jnp.stack([
        jnp.stack([inv_z, jnp.zeros((), z.dtype), -uv[0] * inv_z]),
        jnp.stack([jnp.zeros((), z.dtype), inv_z, -uv[1] * inv_z])])
    A = J_uv @ duv_dxc              # dpix/dx_cam [2, 3]
    J_w = -A @ _skew(RX)
    J_pose = jnp.concatenate([J_w, A], axis=1)
    J_X = A @ R
    return pix, J_pose, J_cam, J_X


def world_to_pixel(model: str, cam_params, qvec, tvec, X):
    """Project world point(s) to pixel coords. Reference: projection.h:60-75."""
    x_cam = apply_pose(qvec, tvec, X)
    z = x_cam[..., 2:3]
    uv = x_cam[..., :2] / z
    return img_from_cam(model, cam_params, uv)


def calculate_depth(qvec, tvec, X):
    """Depth of world point in camera frame. Reference: projection.h:20-38."""
    x_cam = apply_pose(qvec, tvec, X)
    return x_cam[..., 2]


def point_in_front(qvec, tvec, X, eps=1e-9):
    return calculate_depth(qvec, tvec, X) > eps


def pixel_to_world(model: str, cam_params, qvec, tvec, xy, depth):
    """Lift pixel(s) at given depth back into world coords. Reference: projection.h:41-57.

    Unbatched in xy when the camera model has distortion (vmap for batches).
    """
    uv = cam_from_img(model, cam_params, xy)
    x_cam = jnp.concatenate(
        [uv * jnp.asarray(depth)[..., None], jnp.broadcast_to(
            jnp.asarray(depth)[..., None], uv[..., :1].shape)], axis=-1)
    qinv = quat_conj(quat_normalize(qvec))
    return quat_rotate(qinv, x_cam - tvec)
