"""Differentiable projection helpers (reference: pixsfm/base/src/projection.h).

All functions are pure jnp and broadcast/vmap-friendly, replacing the reference's
Jet-templated C++ (``WorldToPixel`` projection.h:60-75, ``PixelToWorld`` :41-57,
``CalculateDepth`` :20-38).
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import apply_pose, quat_conj, quat_normalize, quat_rotate
from .cameras import cam_from_img, img_from_cam

__all__ = [
    "world_to_pixel", "pixel_to_world", "calculate_depth", "point_in_front",
]


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
