"""Differentiable projection helpers (reference: pixsfm/base/src/projection.h).

All functions are pure jnp and broadcast/vmap-friendly, replacing the reference's
Jet-templated C++ (``WorldToPixel`` projection.h:60-75, ``PixelToWorld`` :41-57,
``CalculateDepth`` :20-38).
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import apply_pose, quat_conj, quat_normalize, quat_rotate
from .cameras import cam_from_img, img_from_cam, img_from_cam_with_jac

__all__ = [
    "world_to_pixel", "pixel_to_world", "calculate_depth", "point_in_front",
    "project_with_jac",
]


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

    The algebra is written scalar-expanded (explicit index arithmetic, no
    [2,3]/[3,3]-shaped jnp matmuls): under ``vmap`` over an observation
    chunk the matmul form lowers to batched tiny ``dot_general`` ops that
    the TPU pads to (8,128) MXU tiles at >97% lane waste AND runs at bf16
    operand precision, while this form becomes pure ``[n]``-vector f32 VPU
    work (measured A/B on the 2M-obs Gram eval: examples/probe_jac_scalar.py
    and docs/ba_throughput.md round-5 section).
    """
    # inlined quat_to_rotmat (same s = 2/|q|^2 normalization), kept scalar
    w, x, y, z = qvec[0], qvec[1], qvec[2], qvec[3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    R = ((1.0 - (yy + zz), xy - wz, xz + wy),
         (xy + wz, 1.0 - (xx + zz), yz - wx),
         (xz - wy, yz + wx, 1.0 - (xx + yy)))
    X0, X1, X2 = X[0], X[1], X[2]
    RX = [R[i][0] * X0 + R[i][1] * X1 + R[i][2] * X2 for i in range(3)]
    xc = [RX[i] + tvec[i] for i in range(3)]
    zc = xc[2]
    zc = jnp.where(jnp.abs(zc) < z_eps, z_eps, zc)
    iz = 1.0 / zc
    u, v = xc[0] * iz, xc[1] * iz
    pix, J_uv, J_cam = img_from_cam_with_jac(model, cam_params,
                                             jnp.stack([u, v]))
    Juv = ((J_uv[0, 0], J_uv[0, 1]), (J_uv[1, 0], J_uv[1, 1]))
    # A = J_uv @ duv/dx_cam, duv/dx_cam = [[iz, 0, -u iz], [0, iz, -v iz]]
    A = [[Juv[i][0] * iz, Juv[i][1] * iz,
          -(Juv[i][0] * u + Juv[i][1] * v) * iz] for i in range(2)]
    a, b, c = RX[0], RX[1], RX[2]
    # J_w = -A @ skew(RX); skew = [[0,-c,b],[c,0,-a],[-b,a,0]]
    Jw = [[-(A[i][1] * c - A[i][2] * b),
           -(-A[i][0] * c + A[i][2] * a),
           -(A[i][0] * b - A[i][1] * a)] for i in range(2)]
    JX = [[A[i][0] * R[0][j] + A[i][1] * R[1][j] + A[i][2] * R[2][j]
           for j in range(3)] for i in range(2)]
    J_pose = jnp.stack([jnp.stack(Jw[i] + A[i]) for i in range(2)])
    J_X = jnp.stack([jnp.stack(JX[i]) for i in range(2)])
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
