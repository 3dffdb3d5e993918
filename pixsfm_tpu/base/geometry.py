"""Quaternion / SO(3) utilities (COLMAP conventions, differentiable jnp).

COLMAP stores world-to-camera rotations as quaternions ``qvec = [w, x, y, z]`` and
translations ``tvec`` with ``x_cam = R(qvec) @ x_world + tvec``. The reference relies on
Ceres' ``UnitQuaternionRotatePoint`` inside its projection templates
(reference: pixsfm/base/src/projection.h:60-75). Here everything is written as
broadcasting jnp ops so the same code paths serve single poses and vmapped batches.

Pose updates in the LM solvers use a left-multiplicative so(3) perturbation
``q' = exp_quat(delta) * q`` (3-DoF tangent), the TPU-friendly equivalent of Ceres'
quaternion manifold (reference: pixsfm/bundle_adjustment/src/bundle_optimizer.h:366-397).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "quat_normalize", "quat_mul", "quat_conj", "quat_rotate",
    "quat_to_rotmat", "rotmat_to_quat", "exp_quat", "log_quat",
    "apply_pose", "invert_pose", "pose_update",
    "angle_between_quats",
]


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q1, q2):
    """Hamilton product, [w,x,y,z] convention."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors ``v`` (..., 3) by unit quaternions ``q`` (..., 4)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rotmat(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    R = jnp.stack([
        jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
        jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
        jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
    ], axis=-2)
    return R


def rotmat_to_quat(R):
    """Shepperd's method (numerically stable), returns [w,x,y,z]."""
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case0():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2
        return jnp.stack([0.25 * s, (m21 - m12) / s,
                          (m02 - m20) / s, (m10 - m01) / s], axis=-1)

    def case1():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2
        return jnp.stack([(m21 - m12) / s, 0.25 * s,
                          (m01 + m10) / s, (m02 + m20) / s], axis=-1)

    def case2():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s,
                          0.25 * s, (m12 + m21) / s], axis=-1)

    def case3():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s,
                          (m12 + m21) / s, 0.25 * s], axis=-1)

    c0, c1, c2, c3 = case0(), case1(), case2(), case3()
    use0 = tr > 0
    use1 = (~use0) & (m00 >= m11) & (m00 >= m22)
    use2 = (~use0) & (~use1) & (m11 >= m22)
    q = jnp.where(use0[..., None], c0,
                  jnp.where(use1[..., None], c1,
                            jnp.where(use2[..., None], c2, c3)))
    q = jnp.where(q[..., :1] < 0, -q, q)  # canonical hemisphere (w >= 0)
    return quat_normalize(q)


def exp_quat(phi):
    """so(3) tangent (..., 3) -> unit quaternion; small-angle safe.

    Uses the double-where trick so that second (and higher) derivatives are
    finite at phi = 0: the sqrt argument is replaced by 1 in the small-angle
    branch, and the Taylor branch (polynomial in theta^2) supplies exact
    derivatives there. A plain ``maximum(theta2, eps)`` clamp only protects
    first derivatives — ``jax.hessian`` through it yields NaN at phi = 0.
    """
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta2 < 1e-12
    safe2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe2)
    half = 0.5 * theta
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small[..., 0], 1.0 - theta2[..., 0] / 8.0,
                  jnp.cos(half[..., 0]))
    return jnp.concatenate([w[..., None], k * phi], axis=-1)


def log_quat(q):
    """Unit quaternion -> so(3) tangent (..., 3)."""
    q = quat_normalize(q)
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    vn = jnp.linalg.norm(q[..., 1:], axis=-1)
    theta = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(vn < 1e-9, 2.0, theta / jnp.maximum(vn, 1e-12))
    return scale[..., None] * q[..., 1:]


def apply_pose(qvec, tvec, X):
    """World point -> camera frame: R(q) X + t."""
    return quat_rotate(qvec, X) + tvec


def invert_pose(qvec, tvec):
    qinv = quat_conj(quat_normalize(qvec))
    return qinv, -quat_rotate(qinv, tvec)


def pose_update(qvec, tvec, delta):
    """Apply 6-DoF tangent delta = [dphi(3), dt(3)]: q'=exp(dphi)q, t'=t+dt."""
    q_new = quat_normalize(quat_mul(exp_quat(delta[..., :3]), qvec))
    return q_new, tvec + delta[..., 3:]


def angle_between_quats(q1, q2):
    d = jnp.abs(jnp.sum(quat_normalize(q1) * quat_normalize(q2), axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, -1.0, 1.0))


def qvec_from_numpy(q):
    q = np.asarray(q, dtype=np.float64)
    return q / np.linalg.norm(q)
