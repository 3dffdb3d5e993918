"""Absolute pose estimation (PnP + RANSAC + nonlinear refinement).

The reference calls ``pycolmap.absolute_pose_estimation`` (P3P/EPnP + RANSAC + Ceres
refinement; reference pixsfm/localization/main.py:458-461). pycolmap is unavailable
here, so this module provides a standalone equivalent: RANSAC over minimal DLT
samples on normalized rays, inlier scoring by reprojection error, and a final
damped Gauss-Newton pose refinement on the inliers (jit-compiled, pose-only).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..base.cameras import Camera
from ..base.geometry import exp_quat, quat_mul, quat_normalize, quat_to_rotmat, \
    rotmat_to_quat
from ..base.projection import world_to_pixel
from ..util.misc import logger

__all__ = ["absolute_pose_estimation", "pose_refinement"]


def _dlt_pose(uv: np.ndarray, X: np.ndarray):
    """[R|t] from >=6 normalized 2D rays + 3D points via DLT; R projected to
    SO(3). Returns (R, t) or None."""
    n = len(uv)
    A = np.zeros((2 * n, 12))
    for i in range(n):
        x, y = uv[i]
        Xh = np.append(X[i], 1.0)
        A[2 * i, 0:4] = Xh
        A[2 * i, 8:12] = -x * Xh
        A[2 * i + 1, 4:8] = Xh
        A[2 * i + 1, 8:12] = -y * Xh
    _, _, Vt = np.linalg.svd(A)
    P = Vt[-1].reshape(3, 4)
    # cheirality: pick the homogeneous sign making projective depths positive
    Xh = np.hstack([X, np.ones((n, 1))])
    if np.median(Xh @ P[2]) < 0:
        P = -P
    M = P[:, :3]
    U, S, Vt2 = np.linalg.svd(M)
    if S.min() < 1e-10 * max(S.max(), 1e-12):
        return None
    R = U @ np.diag([1.0, 1.0, np.linalg.det(U @ Vt2)]) @ Vt2
    t = P[:, 3] / S.mean()
    return R, t


def _dlt_pose_batch(uv: np.ndarray, X: np.ndarray):
    """Batched minimal-sample DLT: uv [B, m, 2], X [B, m, 3] ->
    (R [B,3,3], t [B,3], ok [B]). One batched SVD for all hypotheses."""
    B, m, _ = uv.shape
    A = np.zeros((B, 2 * m, 12))
    Xh = np.concatenate([X, np.ones((B, m, 1))], axis=2)
    A[:, 0::2, 0:4] = Xh
    A[:, 0::2, 8:12] = -uv[:, :, 0:1] * Xh
    A[:, 1::2, 4:8] = Xh
    A[:, 1::2, 8:12] = -uv[:, :, 1:2] * Xh
    _, _, Vt = np.linalg.svd(A)
    P = Vt[:, -1, :].reshape(B, 3, 4)
    # cheirality: sign so that projective depths are positive
    w = np.einsum("bmi,bi->bm", Xh, P[:, 2])
    sign = np.where(np.median(w, axis=1) < 0, -1.0, 1.0)
    P = P * sign[:, None, None]
    M = P[:, :, :3]
    U, S, Vt2 = np.linalg.svd(M)
    ok = S[:, -1] > 1e-10 * np.maximum(S[:, 0], 1e-12)
    det = np.linalg.det(np.einsum("bij,bjk->bik", U, Vt2))
    D = np.zeros((B, 3, 3))
    D[:, 0, 0] = 1.0
    D[:, 1, 1] = 1.0
    D[:, 2, 2] = det
    R = np.einsum("bij,bjk,bkl->bil", U, D, Vt2)
    t = P[:, :, 3] / np.maximum(S.mean(axis=1), 1e-12)[:, None]
    return R, t, ok


def _homography_pose_batch(uv: np.ndarray, X: np.ndarray):
    """Planar-safe pose hypotheses by homography decomposition.

    The 11-DoF DLT is degenerate for (near-)coplanar 3D points — the common
    case for building facades. Per sample: fit the best plane to the 3D
    points, express them in in-plane coordinates w, fit the homography
    uv ~ H [w, 1] (normalized DLT), and decompose H = [R e1, R e2, R c + t]
    up to scale (e1/e2 = plane axes, c = centroid).

    uv: [B, N, 2] normalized camera coords, X: [B, N, 3]. Returns (R [B,3,3],
    t [B,3], ok [B]).
    """
    B, N, _ = uv.shape
    c = X.mean(axis=1, keepdims=True)
    Xc = X - c
    # plane axes: top-2 right singular vectors of the centered points
    _, S3, Vt3 = np.linalg.svd(Xc, full_matrices=False)
    e1 = Vt3[:, 0]                             # [B, 3]
    e2 = Vt3[:, 1]
    n = np.cross(e1, e2)
    w = np.stack([np.einsum("bnj,bj->bn", Xc, e1),
                  np.einsum("bnj,bj->bn", Xc, e2)], axis=-1)  # [B, N, 2]

    # normalized homography DLT: uv ~ H [w, 1]
    def norm_pts(p):
        m = p.mean(axis=1, keepdims=True)
        s = np.sqrt(2.0) / np.maximum(
            np.linalg.norm(p - m, axis=2).mean(axis=1), 1e-12)
        return (p - m) * s[:, None, None], m[:, 0], s

    wn, wm, ws = norm_pts(w)
    un, um, us = norm_pts(uv)
    wh = np.concatenate([wn, np.ones((B, N, 1))], axis=-1)
    A = np.zeros((B, 2 * N, 9))
    A[:, 0::2, 0:3] = wh
    A[:, 0::2, 6:9] = -un[:, :, 0:1] * wh
    A[:, 1::2, 3:6] = wh
    A[:, 1::2, 6:9] = -un[:, :, 1:2] * wh
    _, Sh, Vth = np.linalg.svd(A)
    Hn = Vth[:, -1, :].reshape(B, 3, 3)
    # denormalize: uv = Tun^-1 Hn Twn with Tw = [ws*(w - wm)]
    Tu_inv = np.zeros((B, 3, 3))
    Tu_inv[:, 0, 0] = 1.0 / us
    Tu_inv[:, 1, 1] = 1.0 / us
    Tu_inv[:, 2, 2] = 1.0
    Tu_inv[:, 0, 2] = um[:, 0]
    Tu_inv[:, 1, 2] = um[:, 1]
    Tw = np.zeros((B, 3, 3))
    Tw[:, 0, 0] = ws
    Tw[:, 1, 1] = ws
    Tw[:, 2, 2] = 1.0
    Tw[:, 0, 2] = -ws * wm[:, 0]
    Tw[:, 1, 2] = -ws * wm[:, 1]
    H = np.einsum("bij,bjk,bkl->bil", Tu_inv, Hn, Tw)

    # cheirality: third column maps the centroid -> (R c + t); depth > 0
    sign = np.where(H[:, 2, 2] < 0, -1.0, 1.0)
    H = H * sign[:, None, None]
    # scale so the rotation columns are unit
    lam = 2.0 / np.maximum(np.linalg.norm(H[:, :, 0], axis=1)
                           + np.linalg.norm(H[:, :, 1], axis=1), 1e-12)
    H = H * lam[:, None, None]
    r1 = H[:, :, 0]
    r2 = H[:, :, 1]
    # orthonormalize (closest rotation to [r1 r2 r1xr2])
    Q = np.stack([r1, r2, np.cross(r1, r2)], axis=-1)
    Uq, Sq, Vtq = np.linalg.svd(Q)
    detq = np.linalg.det(np.einsum("bij,bjk->bik", Uq, Vtq))
    Dq = np.zeros((B, 3, 3))
    Dq[:, 0, 0] = 1.0
    Dq[:, 1, 1] = 1.0
    Dq[:, 2, 2] = detq
    Qr = np.einsum("bij,bjk,bkl->bil", Uq, Dq, Vtq)   # = R [e1 e2 n]
    E = np.stack([e1, e2, n], axis=-1)                 # [B, 3, 3] columns
    R = np.einsum("bij,bkj->bik", Qr, E)               # R = Qr E^T
    t = H[:, :, 2] - np.einsum("bij,bj->bi", R, c[:, 0])
    ok = (Sh[:, -2] > 1e-12) & np.isfinite(t).all(axis=1)
    return R, t, ok


def _reproj_errors_Rt(camera: Camera, R, t, X, xy):
    """Reprojection errors for a rotation-matrix pose (numpy, no quat detour)."""
    x_cam = (R @ np.atleast_2d(X).T).T + t
    z = x_cam[:, 2]
    uv = x_cam[:, :2] / np.where(np.abs(z) < 1e-12, 1e-12, z)[:, None]
    xy_proj = _apply_intrinsics_np(camera, uv)
    err = np.linalg.norm(xy_proj - xy, axis=1)
    err[z <= 0] = np.inf
    return err


def _apply_intrinsics_np(camera: Camera, uv: np.ndarray):
    p = camera.params
    model = camera.model
    u, v = uv[:, 0], uv[:, 1]
    if model == "SIMPLE_PINHOLE":
        d = uv; fx = fy = p[0]; cx, cy = p[1], p[2]
    elif model == "PINHOLE":
        d = uv; fx, fy, cx, cy = p[0], p[1], p[2], p[3]
    elif model == "SIMPLE_RADIAL":
        r2 = u * u + v * v
        d = uv * (1.0 + p[3] * r2)[:, None]
        fx = fy = p[0]; cx, cy = p[1], p[2]
    elif model == "RADIAL":
        r2 = u * u + v * v
        d = uv * (1.0 + r2 * (p[3] + p[4] * r2))[:, None]
        fx = fy = p[0]; cx, cy = p[1], p[2]
    elif model == "OPENCV":
        k1, k2, p1, p2 = p[4], p[5], p[6], p[7]
        r2 = u * u + v * v
        radial = 1.0 + r2 * (k1 + k2 * r2)
        du = u * radial + 2 * p1 * u * v + p2 * (r2 + 2 * u * u)
        dv = v * radial + p1 * (r2 + 2 * v * v) + 2 * p2 * u * v
        d = np.stack([du, dv], axis=1)
        fx, fy, cx, cy = p[0], p[1], p[2], p[3]
    else:
        raise ValueError(f"unsupported model {model}")
    return np.stack([fx * d[:, 0] + cx, fy * d[:, 1] + cy], axis=1)


def _quat_to_rotmat_np(q):
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def project_np(camera: Camera, qvec, tvec, X):
    """Pure-numpy batched projection (forward distortion only) — RANSAC
    hypothesis scoring must not round-trip to the device per iteration."""
    R = _quat_to_rotmat_np(qvec)
    x_cam = (R @ np.atleast_2d(X).T).T + np.asarray(tvec)
    z = x_cam[:, 2]
    uv = x_cam[:, :2] / np.where(np.abs(z) < 1e-12, 1e-12, z)[:, None]
    return _apply_intrinsics_np(camera, uv), z


def _reproj_errors(camera: Camera, qvec, tvec, X, xy):
    proj, depths = project_np(camera, qvec, tvec, X)
    err = np.linalg.norm(proj - xy, axis=1)
    err[depths <= 0] = np.inf
    return err


def _rotmat_to_quat_np(R):
    """Shepperd's method in numpy ([w,x,y,z]) — the RANSAC improvement path
    must not round-trip to the device per candidate."""
    R = np.asarray(R, np.float64)
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    if tr > 0:
        s = np.sqrt(max(tr + 1.0, 1e-12)) * 2
        q = [0.25 * s, (R[2, 1] - R[1, 2]) / s,
             (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s]
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(max(1.0 + R[0, 0] - R[1, 1] - R[2, 2], 1e-12)) * 2
        q = [(R[2, 1] - R[1, 2]) / s, 0.25 * s,
             (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s]
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(max(1.0 + R[1, 1] - R[0, 0] - R[2, 2], 1e-12)) * 2
        q = [(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
             0.25 * s, (R[1, 2] + R[2, 1]) / s]
    else:
        s = np.sqrt(max(1.0 + R[2, 2] - R[0, 0] - R[1, 1], 1e-12)) * 2
        q = [(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
             (R[1, 2] + R[2, 1]) / s, 0.25 * s]
    q = np.asarray(q, np.float64)
    return q / np.linalg.norm(q)


def _exp_quat_np(phi):
    """so(3) tangent -> unit quaternion ([w,x,y,z]); matches
    base.geometry.exp_quat."""
    theta = np.linalg.norm(phi)
    if theta < 1e-6:
        k = 0.5 - theta * theta / 48.0
        w = 1.0 - theta * theta / 8.0
    else:
        k = np.sin(0.5 * theta) / theta
        w = np.cos(0.5 * theta)
    q = np.concatenate([[w], k * np.asarray(phi, np.float64)])
    return q / np.linalg.norm(q)


def _quat_mul_np(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _pose_refinement_np(camera: Camera, qvec, tvec, X, xy,
                        iters: int = 30, loss_scale_px: float = None) -> Dict:
    """Host-side pose-only damped Gauss-Newton (central-difference Jacobian
    over the 6-DoF tangent). The LO-RANSAC inner loop calls refinement up to
    8 times per query on tiny point sets; a jitted device solve there costs
    one dispatch round-trip per call and dominated per-query serving latency
    on remote accelerators. f64 central differences at step 1e-6 match the
    analytic Jacobian to ~1e-9 relative — far below the LM tolerance.

    ``loss_scale_px``: when set, minimize a Cauchy robust cost at that pixel
    scale via IRLS (COLMAP's RefineAbsolutePose uses CauchyLoss at scale 1 —
    a plain LSQ polish on a RANSAC inlier set gets dragged by near-threshold
    mismatches: measured +0.8 deg mean rotation error on the sacre_coeur
    mapper when the polish ran unweighted)."""
    q = np.asarray(qvec, np.float64)
    q = q / np.linalg.norm(q)
    t = np.asarray(tvec, np.float64).copy()
    X = np.asarray(X, np.float64)
    xy = np.asarray(xy, np.float64)
    c2 = None if loss_scale_px is None else float(loss_scale_px) ** 2

    def step(q, t, d):
        return (_quat_mul_np(_exp_quat_np(d[:3]), q), t + d[3:6])

    def resid(q, t):
        proj, _ = project_np(camera, q, t, X)
        return (proj - xy).ravel()

    def robust_cost(r):
        if c2 is None:
            return 0.5 * float(r @ r)
        s = r.reshape(-1, 2)
        s = s[:, 0] ** 2 + s[:, 1] ** 2              # per-point squared norm
        return 0.5 * float(np.sum(c2 * np.log1p(s / c2)))

    def irls_w(r):
        """Per-residual sqrt-weights: Cauchy rho'(s) = 1/(1+s/c^2)."""
        if c2 is None:
            return None
        s = r.reshape(-1, 2)
        s = s[:, 0] ** 2 + s[:, 1] ** 2
        return np.sqrt(np.repeat(1.0 / (1.0 + s / c2), 2))

    r = resid(q, t)
    cost = robust_cost(r)
    lam = 1e-4
    eps = 1e-6
    for _ in range(iters):
        J = np.empty((r.size, 6))
        for k in range(6):
            d = np.zeros(6)
            d[k] = eps
            J[:, k] = (resid(*step(q, t, d)) - resid(*step(q, t, -d))) \
                / (2 * eps)
        w = irls_w(r)
        rw, Jw = (r, J) if w is None else (r * w, J * w[:, None])
        g = Jw.T @ rw
        H = Jw.T @ Jw
        D = np.clip(np.diag(H), 1e-8, 1e32)
        try:
            d = -np.linalg.solve(H + lam * np.diag(D), g)
        except np.linalg.LinAlgError:
            break
        qn, tn = step(q, t, d)
        rn = resid(qn, tn)
        cn = robust_cost(rn)
        if cn < cost:
            q, t, r, cost = qn, tn, rn, cn
            lam = max(lam / 3.0, 1e-12)
            if np.linalg.norm(d) < 1e-12:
                break
        else:
            lam = min(lam * 4.0, 1e16)
    return {"qvec": q, "tvec": t}


from functools import lru_cache


@lru_cache(maxsize=32)
def _compiled_pose_refine(model: str, iters: int):
    @jax.jit
    def run(q0, t0, params, Xj, xyj, w):
        def residuals(d, q, t):
            qq = quat_normalize(quat_mul(exp_quat(d[:3]), q))
            tt = t + d[3:]
            proj = world_to_pixel(model, params, qq, tt, Xj)
            return ((proj - xyj) * w[:, None]).reshape(-1)

        def body(carry, _):
            q, t, lam, cost = carry
            zero = jnp.zeros(6, jnp.float32)
            r = residuals(zero, q, t)
            J = jax.jacfwd(residuals)(zero, q, t)
            H = J.T @ J
            g = J.T @ r
            D = jnp.clip(jnp.diag(H), 1e-8, 1e32)
            d = -jnp.linalg.solve(H + lam * jnp.diag(D), g)
            q_new = quat_normalize(quat_mul(exp_quat(d[:3]), q))
            t_new = t + d[3:]
            new_cost = 0.5 * jnp.sum(residuals(zero, q_new, t_new) ** 2)
            accept = new_cost < cost
            q = jnp.where(accept, q_new, q)
            t = jnp.where(accept, t_new, t)
            lam = jnp.where(accept, lam * 0.33, lam * 4.0)
            cost = jnp.where(accept, new_cost, cost)
            return (q, t, lam, cost), None

        zero = jnp.zeros(6, jnp.float32)
        cost0 = 0.5 * jnp.sum(residuals(zero, q0, t0) ** 2)
        (q, t, _, cost), _ = jax.lax.scan(
            body, (q0, t0, jnp.asarray(1e-3, jnp.float32), cost0),
            None, length=iters)
        return q, t, cost

    return run


def pose_refinement(camera: Camera, qvec, tvec, X, xy,
                    iters: int = 30) -> Dict:
    """Pose-only damped Gauss-Newton on reprojection error (refinement stage of
    pycolmap.absolute_pose_estimation). Compiled program cached per
    (model, iters); batch padded to power-of-two buckets."""
    from ..util.jit_cache import bucket

    n = len(X)
    n_pad = bucket(n)

    def pad(a, fill=0.0):
        a = np.asarray(a, np.float32)
        return a if n_pad == n else np.concatenate(
            [a, np.full((n_pad - n,) + a.shape[1:], fill, np.float32)])

    w = np.zeros(n_pad, np.float32)
    w[:n] = 1.0
    Xp = pad(X)
    Xp[n:] = [0, 0, 10.0]  # padded points safely in front
    run = _compiled_pose_refine(camera.model, iters)
    q, t, cost = run(jnp.asarray(qvec, jnp.float32),
                     jnp.asarray(tvec, jnp.float32),
                     jnp.asarray(camera.params, jnp.float32),
                     jnp.asarray(Xp), jnp.asarray(pad(xy)), jnp.asarray(w))
    return dict(qvec=np.asarray(q, np.float64),
                tvec=np.asarray(t, np.float64), cost=float(cost))


# ---------------------------------------------------------------------------
# Device-batched RANSAC PnP: hypothesis generation (DLT + homography
# decomposition), scoring, and the LO-RANSAC refine/expand loop as ONE jitted
# program, vmappable over a batch of queries. This is the TPU-native inversion
# of pycolmap's host RANSAC (reference pixsfm/localization/main.py:458-461):
# a fixed hypothesis count H evaluated as flat [6H, n] tensor ops instead of
# an adaptive host loop, and the LO refinement as an in-program lax.scan.
#
# Everything is pure-HLO arithmetic: eigh/svd/lu lower to TPU custom calls
# whose per-call overhead dominated the whole program (profiled at ~110ms of
# a 160ms batch-8 run), so smallest-eigenvectors come from inverse power
# iteration on a hand-unrolled Cholesky, SO(3) projections from Newton polar
# iteration with closed-form 3x3 inverses, and the LM solves from the same
# unrolled Cholesky at d=6.
# ---------------------------------------------------------------------------


def _chol_batch(A):
    """Batched Cholesky of PSD A [..., d, d], unrolled over the (static,
    small) dimension d — pure arithmetic, no lax.linalg custom call."""
    d = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(d):
        r = A[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1)
        ljj = jnp.sqrt(jnp.maximum(r, 1e-30))
        L = L.at[..., j, j].set(ljj)
        if j + 1 < d:
            col = (A[..., j + 1:, j]
                   - jnp.einsum("...ik,...k->...i", L[..., j + 1:, :j],
                                L[..., j, :j])) / ljj[..., None]
            L = L.at[..., j + 1:, j].set(col)
    return L


def _chol_solve(L, b):
    """Solve (L L^T) x = b with unrolled forward/back substitution.
    L [..., d, d] lower, b [..., d]."""
    d = L.shape[-1]
    ys = []
    for i in range(d):
        acc = b[..., i]
        for k in range(i):
            acc = acc - L[..., i, k] * ys[k]
        ys.append(acc / L[..., i, i])
    xs = [None] * d
    for i in reversed(range(d)):
        acc = ys[i]
        for k in range(i + 1, d):
            acc = acc - L[..., k, i] * xs[k]
        xs[i] = acc / L[..., i, i]
    return jnp.stack(xs, axis=-1)


def _smallest_evec(G, iters: int = 8):
    """Smallest eigenvector of PSD G [..., d, d] by inverse power iteration
    on a ridge-shifted Cholesky factorization (the DLT/homography normal
    matrices are near-singular exactly at the solution, so convergence is
    one-to-two iterations in the well-posed case)."""
    d = G.shape[-1]
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    ridge = (1e-7 * tr / d + 1e-20)[..., None]
    L = _chol_batch(G + ridge[..., None] * jnp.eye(d, dtype=G.dtype))
    x = jnp.ones(G.shape[:-1], G.dtype) / np.sqrt(d)
    for _ in range(iters):
        x = _chol_solve(L, x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                            1e-30)
    return x


def _det3(M):
    """Closed-form 3x3 determinant (jnp.linalg.det lowers to an LU custom
    call)."""
    return (M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2]
                            - M[..., 1, 2] * M[..., 2, 1])
            - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2]
                              - M[..., 1, 2] * M[..., 2, 0])
            + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1]
                              - M[..., 1, 1] * M[..., 2, 0]))


def _inv3(M, eps=1e-30):
    """Closed-form 3x3 inverse via the adjugate."""
    det = _det3(M)
    c00 = M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1]
    c01 = M[..., 0, 2] * M[..., 2, 1] - M[..., 0, 1] * M[..., 2, 2]
    c02 = M[..., 0, 1] * M[..., 1, 2] - M[..., 0, 2] * M[..., 1, 1]
    c10 = M[..., 1, 2] * M[..., 2, 0] - M[..., 1, 0] * M[..., 2, 2]
    c11 = M[..., 0, 0] * M[..., 2, 2] - M[..., 0, 2] * M[..., 2, 0]
    c12 = M[..., 0, 2] * M[..., 1, 0] - M[..., 0, 0] * M[..., 1, 2]
    c20 = M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0]
    c21 = M[..., 0, 1] * M[..., 2, 0] - M[..., 0, 0] * M[..., 2, 1]
    c22 = M[..., 0, 0] * M[..., 1, 1] - M[..., 0, 1] * M[..., 1, 0]
    adj = jnp.stack([jnp.stack([c00, c01, c02], -1),
                     jnp.stack([c10, c11, c12], -1),
                     jnp.stack([c20, c21, c22], -1)], -2)
    d = det[..., None, None]
    return adj / jnp.where(jnp.abs(d) < eps, eps, d)


def _project_so3(M, iters: int = 9):
    """Nearest-rotation projection by Newton polar iteration
    X <- (X + X^{-T}) / 2 (pure arithmetic; replaces the SVD-based
    U diag(1,1,det) V^T). M is sign-flipped to det > 0 first; hypotheses
    whose det ~ 0 produce garbage that the RANSAC scoring rejects."""
    det = _det3(M)
    M = M * jnp.where(det < 0, -1.0, 1.0)[..., None, None]
    nrm = jnp.maximum(jnp.linalg.norm(M, axis=(-2, -1), keepdims=True),
                      1e-20)
    X = M / nrm * np.sqrt(3.0)
    for _ in range(iters):
        X = 0.5 * (X + jnp.swapaxes(_inv3(X), -2, -1))
    return X


def _cbrt(x):
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def _solve_quartic_real(c4, c3, c2, c1, c0):
    """Batched real roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0.

    Ferrari's method with a Cardano/trigonometric resolvent cubic, fully
    branch-free (jnp.where over discriminant signs) — TPUs have no complex
    eig, so the companion-matrix route is unavailable in-jit. Returns
    [B, 4] roots with NaN marking complex/absent ones."""
    bad = jnp.abs(c4) < 1e-14
    c4s = jnp.where(bad, 1.0, c4)
    a3, a2 = c3 / c4s, c2 / c4s
    a1, a0 = c1 / c4s, c0 / c4s
    # depressed quartic y^4 + p y^2 + q y + r, x = y - a3/4
    p = a2 - 3.0 * a3 * a3 / 8.0
    q = a1 - a3 * a2 / 2.0 + a3 ** 3 / 8.0
    r = a0 - a3 * a1 / 4.0 + a3 * a3 * a2 / 16.0 - 3.0 * a3 ** 4 / 256.0
    # resolvent cubic m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0
    b, c_, d = p, p * p / 4.0 - r, -q * q / 8.0
    ps = c_ - b * b / 3.0
    qs = 2.0 * b ** 3 / 27.0 - b * c_ / 3.0 + d
    disc = (qs / 2.0) ** 2 + (ps / 3.0) ** 3
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    s_one = _cbrt(-qs / 2.0 + sq) + _cbrt(-qs / 2.0 - sq)
    # three-real-root branch: largest root via the trig form
    pc = jnp.minimum(ps, -1e-30)
    acos_arg = jnp.clip(3.0 * qs / (2.0 * pc) * jnp.sqrt(-3.0 / pc),
                        -1.0, 1.0)
    s_tri = 2.0 * jnp.sqrt(-pc / 3.0) * jnp.cos(jnp.arccos(acos_arg) / 3.0)
    m = jnp.where(disc >= 0, s_one, s_tri) - b / 3.0
    m = jnp.maximum(m, 1e-12)
    # (y^2 + p/2 + m)^2 = 2m y^2 - q y + q^2/(8m)  ->  two quadratics
    s2m = jnp.sqrt(2.0 * m)
    h = q / (2.0 * s2m)
    roots = []
    for sign in (1.0, -1.0):
        # y^2 - sign*s2m*y + (p/2 + m + sign*h) = 0
        A = p / 2.0 + m + sign * h
        dq = s2m * s2m - 4.0 * A
        sd = jnp.sqrt(jnp.maximum(dq, 0.0))
        for pm in (1.0, -1.0):
            y = (sign * s2m + pm * sd) / 2.0
            roots.append(jnp.where((dq >= 0) & ~bad, y - a3 / 4.0, jnp.nan))
    x = jnp.stack(roots, axis=-1)                          # [B, 4]
    # two Newton steps on the original quartic: Ferrari's cancellations cost
    # several f32 digits near clustered roots (P3P planar configurations)
    for _ in range(2):
        fx = (((c4[..., None] * x + c3[..., None]) * x + c2[..., None]) * x
              + c1[..., None]) * x + c0[..., None]
        dfx = ((4.0 * c4[..., None] * x + 3.0 * c3[..., None]) * x
               + 2.0 * c2[..., None]) * x + c1[..., None]
        dfx = jnp.where(jnp.abs(dfx) < 1e-12, 1e-12, dfx)
        x = x - fx / dfx
    return x


def _p3p_batch_jnp(su, sx):
    """Batched Grunert P3P: su [B,>=3,2] normalized image rays (first 3
    used), sx [B,>=3,3] world points -> (R [4B,3,3], t [4B,3], ok [4B]),
    up to 4 pose solutions per sample.

    This is the minimal calibrated solver the reference effectively uses
    (pycolmap absolute_pose_estimation -> COLMAP P3P, reference
    localization/main.py:458-461): 3-point samples keep the per-sample
    contamination probability minimal and the solver is exact for planar
    scenes, where the 6-point DLT is degenerate. Coefficients follow the
    classic Grunert system (Haralick et al., 'Review and analysis of
    solutions of the three point perspective pose estimation problem')."""
    B = su.shape[0]
    f = jnp.concatenate([su[:, :3], jnp.ones_like(su[:, :3, :1])], -1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)     # [B, 3, 3]
    f1, f2, f3 = f[:, 0], f[:, 1], f[:, 2]
    X1, X2, X3 = sx[:, 0], sx[:, 1], sx[:, 2]
    ca = jnp.sum(f2 * f3, -1)          # cos(alpha): angle at rays (2,3)
    cb = jnp.sum(f1 * f3, -1)          # cos(beta):  rays (1,3)
    cg = jnp.sum(f1 * f2, -1)          # cos(gamma): rays (1,2)
    a2 = jnp.sum((X2 - X3) ** 2, -1)
    b2 = jnp.sum((X1 - X3) ** 2, -1)
    c2 = jnp.sum((X1 - X2) ** 2, -1)
    ok0 = (b2 > 1e-12) & (a2 > 1e-12) & (c2 > 1e-12)
    b2s = jnp.where(ok0, b2, 1.0)
    aq = a2 / b2s
    cq = c2 / b2s
    amc = aq - cq
    apc = aq + cq
    A4 = (amc - 1.0) ** 2 - 4.0 * cq * ca * ca
    A3 = 4.0 * (amc * (1.0 - amc) * cb - (1.0 - apc) * ca * cg
                + 2.0 * cq * ca * ca * cb)
    A2 = 2.0 * (amc * amc - 1.0 + 2.0 * amc * amc * cb * cb
                + 2.0 * (1.0 - cq) * ca * ca
                - 4.0 * apc * ca * cb * cg + 2.0 * (1.0 - aq) * cg * cg)
    A1 = 4.0 * (-amc * (1.0 + amc) * cb + 2.0 * aq * cg * cg * cb
                - (1.0 - apc) * ca * cg)
    A0 = (1.0 + amc) ** 2 - 4.0 * aq * cg * cg
    v = _solve_quartic_real(A4, A3, A2, A1, A0)            # [B, 4]

    # back-substitution per root: u then the three ray distances
    caE, cbE, cgE = ca[:, None], cb[:, None], cg[:, None]
    den = 2.0 * (cgE - v * caE)
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    u = ((-1.0 + amc[:, None]) * v * v - 2.0 * amc[:, None] * cbE * v
         + 1.0 + amc[:, None]) / den
    s1sq = b2s[:, None] / jnp.maximum(1.0 + v * v - 2.0 * v * cbE, 1e-12)
    s1 = jnp.sqrt(jnp.maximum(s1sq, 0.0))
    s2 = u * s1
    s3 = v * s1
    ok = (ok0[:, None] & jnp.isfinite(v) & (v > 1e-9) & (u > 1e-9)
          & (s1 > 1e-9))                                   # [B, 4]

    # camera-frame points + 3-point absolute orientation via orthonormal
    # triads (exact for minimal, noise-free triplets)
    Y1 = s1[..., None] * f1[:, None, :]                    # [B, 4, 3]
    Y2 = s2[..., None] * f2[:, None, :]
    Y3 = s3[..., None] * f3[:, None, :]

    def triad(p1, p2, p3):
        e1 = p2 - p1
        e1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True),
                              1e-12)
        w = p3 - p1
        e2 = w - jnp.sum(w * e1, -1, keepdims=True) * e1
        e2 = e2 / jnp.maximum(jnp.linalg.norm(e2, axis=-1, keepdims=True),
                              1e-12)
        e3 = jnp.cross(e1, e2)
        return jnp.stack([e1, e2, e3], axis=-1)            # [..., 3, 3]

    Mw = triad(X1[:, None], X2[:, None], X3[:, None])      # [B, 1, 3, 3]
    Mc = triad(Y1, Y2, Y3)                                 # [B, 4, 3, 3]
    R = jnp.einsum("bvij,bvkj->bvik", Mc,
                   jnp.broadcast_to(Mw, Mc.shape))         # Mc @ Mw^T
    t = Y1 - jnp.einsum("bvij,bj->bvi", R, X1)
    ok = ok & jnp.isfinite(R).all((-2, -1)) & jnp.isfinite(t).all(-1)
    return (R.reshape(4 * B, 3, 3), t.reshape(4 * B, 3),
            ok.reshape(4 * B))


def _dlt_batch_jnp(su, sx):
    """Minimal-sample DLT in-jit: su [B,m,2] normalized rays, sx [B,m,3] 3D
    points -> (R [B,3,3], t [B,3], ok [B]). The 3D points are centered and
    scaled per sample so the 12x12 normal matrix is well conditioned in f32;
    the null vector comes from inverse power iteration (no eigh custom
    call)."""
    B, m, _ = su.shape
    c = sx.mean(1, keepdims=True)
    s = jnp.maximum(jnp.linalg.norm(sx - c, axis=2).mean(1), 1e-9)
    xn = (sx - c) / s[:, None, None]
    xh = jnp.concatenate([xn, jnp.ones((B, m, 1), su.dtype)], 2)
    z = jnp.zeros_like(xh)
    r0 = jnp.concatenate([xh, z, -su[:, :, 0:1] * xh], 2)
    r1 = jnp.concatenate([z, xh, -su[:, :, 1:2] * xh], 2)
    A = jnp.concatenate([r0, r1], 1)                       # [B, 2m, 12]
    G = jnp.einsum("bri,brj->bij", A, A)
    P = _smallest_evec(G).reshape(B, 3, 4)
    # cheirality: homogeneous sign making the sample's projective depths > 0
    w = jnp.einsum("bmi,bi->bm", xh, P[:, 2])
    P = P * jnp.where(jnp.median(w, axis=1) < 0, -1.0, 1.0)[:, None, None]
    M = P[:, :, :3]
    R = _project_so3(M)
    # RMS singular value ~ ||M||_F / sqrt(3) replaces S.mean (M ~ scaled
    # rotation for a good sample, so the spectrum is near-uniform)
    scale = jnp.maximum(jnp.linalg.norm(M, axis=(-2, -1)) / np.sqrt(3.0),
                        1e-12)
    tn = P[:, :, 3] / scale[:, None]
    # un-normalize: uv ~ R (x-c)/s + tn  =>  t = s*tn - R c (R scale-free)
    t = s[:, None] * tn - jnp.einsum("bij,bj->bi", R, c[:, 0])
    ok = jnp.abs(_det3(M)) > (1e-18 * jnp.maximum(scale, 1e-12) ** 3)
    return R, t, ok


def _plane_basis(xc):
    """Orthonormal (e1, e2, n) for the best-fit plane of centered points
    xc [B, N, 3]: n = smallest eigenvector of the 3x3 scatter (inverse power
    iteration), e1/e2 = Gram-Schmidt completion (the homography
    decomposition is invariant to in-plane basis rotation)."""
    C = jnp.einsum("bni,bnj->bij", xc, xc)
    n = _smallest_evec(C, iters=6)                         # [B, 3]
    ax = jnp.where(jnp.abs(n[:, 0:1]) < 0.7,
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], n.dtype),
                                    n.shape),
                   jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], n.dtype),
                                    n.shape))
    e1 = ax - jnp.sum(ax * n, -1, keepdims=True) * n
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1, axis=-1, keepdims=True), 1e-20)
    e2 = jnp.cross(n, e1)
    return e1, e2, n


def _homography_batch_jnp(su, sx):
    """Planar-safe pose hypotheses in-jit (mirror of _homography_pose_batch):
    per sample fit the best plane, fit uv ~ H [w,1] by normalized DLT
    (inverse power iteration on the 9x9 normal matrix), decompose
    H = [R e1, R e2, R c + t]."""
    B, N, _ = su.shape
    c = sx.mean(axis=1, keepdims=True)
    xc = sx - c
    e1, e2, nrm = _plane_basis(xc)
    w = jnp.stack([jnp.einsum("bnj,bj->bn", xc, e1),
                   jnp.einsum("bnj,bj->bn", xc, e2)], axis=-1)

    def norm_pts(p):
        m = p.mean(axis=1, keepdims=True)
        s = jnp.sqrt(2.0) / jnp.maximum(
            jnp.linalg.norm(p - m, axis=2).mean(axis=1), 1e-12)
        return (p - m) * s[:, None, None], m[:, 0], s

    wn, wm, ws = norm_pts(w)
    un, um, us = norm_pts(su)
    wh = jnp.concatenate([wn, jnp.ones((B, N, 1), su.dtype)], axis=-1)
    z = jnp.zeros_like(wh)
    r0 = jnp.concatenate([wh, z, -un[:, :, 0:1] * wh], 2)
    r1 = jnp.concatenate([z, wh, -un[:, :, 1:2] * wh], 2)
    A = jnp.concatenate([r0, r1], 1)                       # [B, 2N, 9]
    G = jnp.einsum("bri,brj->bij", A, A)
    Hn = _smallest_evec(G).reshape(B, 3, 3)
    dt = su.dtype
    zero = jnp.zeros(B, dt)
    one = jnp.ones(B, dt)
    Tu_inv = jnp.stack([
        jnp.stack([1.0 / us, zero, um[:, 0]], -1),
        jnp.stack([zero, 1.0 / us, um[:, 1]], -1),
        jnp.stack([zero, zero, one], -1)], 1)
    Tw = jnp.stack([
        jnp.stack([ws, zero, -ws * wm[:, 0]], -1),
        jnp.stack([zero, ws, -ws * wm[:, 1]], -1),
        jnp.stack([zero, zero, one], -1)], 1)
    H = jnp.einsum("bij,bjk,bkl->bil", Tu_inv, Hn, Tw)
    H = H * jnp.where(H[:, 2, 2] < 0, -1.0, 1.0)[:, None, None]
    lam = 2.0 / jnp.maximum(jnp.linalg.norm(H[:, :, 0], axis=1)
                            + jnp.linalg.norm(H[:, :, 1], axis=1), 1e-12)
    H = H * lam[:, None, None]
    r1c, r2c = H[:, :, 0], H[:, :, 1]
    Q = jnp.stack([r1c, r2c, jnp.cross(r1c, r2c)], axis=-1)
    Qr = _project_so3(Q)       # det(Q) > 0 by the cross-product completion
    E = jnp.stack([e1, e2, nrm], axis=-1)
    R = jnp.einsum("bij,bkj->bik", Qr, E)
    t = H[:, :, 2] - jnp.einsum("bij,bj->bi", R, c[:, 0])
    # rank guard handled downstream: degenerate fits produce non-finite or
    # badly-scoring hypotheses that RANSAC rejects
    ok = jnp.isfinite(t).all(axis=1) & jnp.isfinite(R).all(axis=(1, 2))
    return R, t, ok


@lru_cache(maxsize=64)
def _pnp_core(model: str, H: int, n_pad: int, batch: int,
              lo_rounds: int = 4, gn_iters: int = 8,
              families: str = "full"):
    """UNjitted RANSAC+LO program for `batch` queries of `n_pad` padded
    correspondences and `H` minimal samples — jitted by :func:`_compiled_pnp`,
    or composed into a larger fused program (localization QKA->PnP).

    ``families``:
      - ``"full"``: 6H pose hypotheses (P3P (4) + DLT + homography per
        sample) — the maximally robust program.
      - ``"p3p"``: 4H hypotheses from the minimal calibrated P3P family
        only. ~3x fewer hypotheses to score and, more importantly, none of
        the 12x12/9x9 null-space solves (unrolled Cholesky + inverse power
        iteration) that dominate the full program's arithmetic. Used as
        stage 1 of the staged RANSAC in
        :func:`absolute_pose_estimation_batch`: P3P is exact on planar
        scenes and its 3-point samples have the best clean-sample
        probability (w^3), so the extra families only pay off on queries
        the acceptance bar flags as hard."""
    from ..base.cameras import img_from_cam

    def reproj_err_Rt(params, R, t, X, xy, valid):
        # R [h,3,3], t [h,3] -> err [h,n]
        xc = jnp.einsum("hij,nj->hni", R, X) + t[:, None, :]
        zd = xc[..., 2]
        uv = xc[..., :2] / jnp.where(jnp.abs(zd) < 1e-12, 1e-12, zd)[..., None]
        pix = img_from_cam(model, params, uv)
        err = jnp.linalg.norm(pix - xy[None], axis=-1)
        big = jnp.asarray(jnp.inf, err.dtype)
        return jnp.where((zd > 0) & valid[None], err, big)

    def reproj_err_q(params, q, t, X, xy, valid):
        pix = world_to_pixel(model, params, q, t, X)
        from ..base.projection import calculate_depth
        zd = calculate_depth(q, t, X)
        err = jnp.linalg.norm(pix - xy, axis=-1)
        big = jnp.asarray(jnp.inf, err.dtype)
        return jnp.where((zd > 0) & valid, err, big)

    def run_single(X, xy, valid, params, samples, max_err):
        # xy [n,2] pixels, X [n,3], valid [n] bool, samples [H,6] int32;
        # ray normalization happens IN-program (the host Camera.cam_from_img
        # per query cost a device round trip each — profiled at 290ms of a
        # 485ms batch-8 call)
        from ..base.cameras import cam_from_img as _cam_from_img

        # unbatched core (Newton 2x2 undistort for radial models) -> vmap
        uv = jax.vmap(lambda p: _cam_from_img(model, params, p))(xy)
        su, sx = uv[samples], X[samples]
        # three hypothesis families per sample: minimal calibrated P3P
        # (4 solutions; w^3 clean-sample probability — the low-inlier-ratio
        # workhorse, and exact on planar scenes), 6-point DLT (general
        # scenes), and homography decomposition (planar redundancy)
        R0, t0_, ok0 = _p3p_batch_jnp(su, sx)
        if families == "p3p":
            R, t, ok = R0, t0_, ok0
        else:
            R1, t1, ok1 = _dlt_batch_jnp(su, sx)
            R2, t2, ok2 = _homography_batch_jnp(su, sx)
            R = jnp.concatenate([R0, R1, R2])
            t = jnp.concatenate([t0_, t1, t2])
            ok = jnp.concatenate([ok0, ok1, ok2])
        ok = ok & jnp.isfinite(R).all((-2, -1)) & jnp.isfinite(t).all(-1)
        R = jnp.where(ok[:, None, None], R, jnp.eye(3, dtype=R.dtype))
        t = jnp.where(ok[:, None], t, jnp.zeros_like(t))
        err = reproj_err_Rt(params, R, t, X, xy, valid)      # [6H, n]
        inl = (err < max_err) & ok[:, None]
        cnt = inl.sum(1)
        best = jnp.argmax(cnt)
        q0 = quat_normalize(rotmat_to_quat(R[best]))
        t0 = t[best]
        inl0 = inl[best]
        cnt0 = cnt[best]

        valid_f = valid.astype(uv.dtype)

        def gn_refine(q, t, w):
            # closed-form pose Jacobian (base.projection.project_with_jac) —
            # jacfwd over the 6-tangent costs ~7x the residual eval, and the
            # scan's sequential depth is the whole program's latency
            from ..base.projection import project_with_jac

            def weighted_cost(q, t):
                proj = world_to_pixel(model, params, q, t, X)
                return 0.5 * jnp.sum(((proj - xy) * w[:, None]) ** 2)

            def body(carry, _):
                q, t, lam, cost = carry
                pix, J_pose, _, _ = jax.vmap(
                    lambda Xi: project_with_jac(model, params, q, t, Xi))(X)
                r = (pix - xy) * w[:, None]                  # [n, 2]
                J = J_pose * w[:, None, None]                # [n, 2, 6]
                Hm = jnp.einsum("nij,nik->jk", J, J)
                g = jnp.einsum("nij,ni->j", J, r)
                D = jnp.clip(jnp.diag(Hm), 1e-8, 1e32)
                L = _chol_batch(Hm + lam * jnp.diag(D))
                d = -_chol_solve(L, g)
                q_new = quat_normalize(quat_mul(exp_quat(d[:3]), q))
                t_new = t + d[3:]
                new_cost = weighted_cost(q_new, t_new)
                accept = (new_cost < cost) & jnp.isfinite(new_cost) \
                    & jnp.isfinite(d).all()
                q = jnp.where(accept, q_new, q)
                t = jnp.where(accept, t_new, t)
                lam = jnp.where(accept, lam * 0.33, lam * 4.0)
                cost = jnp.where(accept, new_cost, cost)
                return (q, t, lam, cost), None

            (q, t, _, _), _ = jax.lax.scan(
                body, (q, t, jnp.asarray(1e-3, uv.dtype), weighted_cost(q, t)),
                None, length=gn_iters)
            return q, t

        def lo_round(carry, _):
            q, t, inl_m, bq, bt, binl, bcnt = carry
            w = inl_m.astype(uv.dtype) * valid_f
            enough = w.sum() >= 6.0
            q2, t2 = gn_refine(q, t, w)
            # a refine on <6 points (or one that diverged) must not poison
            q2 = jnp.where(enough & jnp.isfinite(q2).all(), q2, q)
            t2 = jnp.where(enough & jnp.isfinite(t2).all(), t2, t)
            err2 = reproj_err_q(params, q2, t2, X, xy, valid)
            inl2 = err2 < max_err
            cnt2 = inl2.sum()
            better = cnt2 > bcnt
            bq = jnp.where(better, q2, bq)
            bt = jnp.where(better, t2, bt)
            binl = jnp.where(better, inl2, binl)
            bcnt = jnp.maximum(cnt2, bcnt)
            return (q2, t2, inl2, bq, bt, binl, bcnt), None

        (q, t, _, bq, bt, binl, bcnt), _ = jax.lax.scan(
            lo_round, (q0, t0, inl0, q0, t0, inl0, cnt0),
            None, length=lo_rounds)
        return bq, bt, binl, bcnt

    return run_single if batch == 1 else jax.vmap(
        run_single, in_axes=(0, 0, 0, 0, 0, None))


@lru_cache(maxsize=32)
def _compiled_pnp(model: str, H: int, n_pad: int, batch: int,
                  lo_rounds: int = 4, gn_iters: int = 8,
                  families: str = "full"):
    return jax.jit(_pnp_core(model, H, n_pad, batch, lo_rounds, gn_iters,
                             families))


def _gen_samples(rng, n: int, H: int) -> np.ndarray:
    """[H, 6] distinct indices in [0, n) per row (vectorized host sampling)."""
    r = rng.random((H, n))
    return np.argpartition(r, 5, axis=1)[:, :6].astype(np.int32)


# Staged-RANSAC acceptance bar: a stage-1 (P3P-only) pose is final when its
# LO-refined consensus is BOTH large in absolute count and a healthy fraction
# of the correspondences. A wrong pose with >=40% support at the inlier
# threshold after 4 LO rounds requires a degenerate configuration that P3P
# (exact on planar scenes) does not produce; queries below the bar re-run
# the full P3P+DLT+homography program at full hypothesis count, so the
# failure mode of a too-strict bar is wasted work, never a worse pose.
STAGE_ACCEPT_RATIO = 0.4
STAGE_MIN_INLIERS = 12
STAGE1_MAX_SAMPLES = 256  # w^3 clean-sample odds need fewer samples than w^6


def _stage_accept(cnt: int, n: int, min_inlier_ratio: float) -> bool:
    return (cnt >= max(6, STAGE_MIN_INLIERS)
            and cnt >= min_inlier_ratio * n
            and cnt >= STAGE_ACCEPT_RATIO * n)


def _run_pnp_groups(groups, H: int, max_error_px: float, rng, mesh,
                    families: str):
    """Pack + dispatch one jitted program per (model, n_pad) group.

    ``groups``: {(model, n_pad): [(qi, xy, X, cam), ...]}. Returns
    {qi: (qvec_f64, tvec_f64, inliers[:n], cnt)}."""
    out = {}
    ndev = int(mesh.devices.size) if mesh is not None else 1
    for (model, n_pad), items in groups.items():
        from ..util.jit_cache import bucket
        B = len(items)
        B_pad = bucket(B, minimum=1)
        if ndev > 1:
            # mesh fan-out: the batch axis shards per chip (both are powers
            # of two, so divisibility holds)
            B_pad = max(B_pad, ndev)
        X_b = np.zeros((B_pad, n_pad, 3), np.float32)
        X_b[..., 2] = 10.0
        xy_b = np.zeros((B_pad, n_pad, 2), np.float32)
        valid_b = np.zeros((B_pad, n_pad), bool)
        k = len(items[0][3].params)
        par_b = np.zeros((B_pad, k), np.float32)
        par_b[:, 0] = 1.0
        samp_b = np.zeros((B_pad, H, 6), np.int32)
        for bi, (qi, xy, X, cam) in enumerate(items):
            n = len(xy)
            X_b[bi, :n] = X
            xy_b[bi, :n] = xy
            valid_b[bi, :n] = True
            par_b[bi] = np.asarray(cam.params, np.float32)
            samp_b[bi] = _gen_samples(rng, n, H)
        run = _compiled_pnp(model, H, n_pad, B_pad, families=families)
        # every host<->device transfer is a round trip on remote backends
        # (the axon tunnel adds ~10ms each) — upload the packed args as ONE
        # device_put and fetch the 4 outputs as ONE device_get
        if ndev > 1 and B_pad % ndev == 0:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P
            _shard = NamedSharding(mesh, _P(mesh.axis_names[0]))
            _repl = NamedSharding(mesh, _P())
            args = tuple(jax.device_put(a, _shard)
                         for a in (X_b, xy_b, valid_b, par_b, samp_b)) \
                + (jax.device_put(np.float32(max_error_px), _repl),)
        else:
            args = jax.device_put(
                (X_b, xy_b, valid_b, par_b, samp_b,
                 np.float32(max_error_px)))
        if B_pad == 1:
            args = tuple(a[0] for a in args[:5]) + (args[5],)
            outs = tuple(jnp.expand_dims(o, 0) for o in run(*args))
        else:
            outs = run(*args)
        q_np, t_np, inl_np, cnt_np = jax.device_get(outs)
        q_np = q_np.astype(np.float64)
        t_np = t_np.astype(np.float64)
        for bi, (qi, xy, X, cam) in enumerate(items):
            n = len(xy)
            out[qi] = (q_np[bi], t_np[bi], inl_np[bi, :n], int(cnt_np[bi]))
    return out


def absolute_pose_estimation_batch(queries, max_error_px: float = 12.0,
                                   max_iterations: int = 1000,
                                   seed: int = 0,
                                   min_inlier_ratio: float = 0.0,
                                   polish: bool = True,
                                   mesh=None,
                                   staged: bool = True):
    """Batched RANSAC PnP: one jitted program per (camera model, size bucket)
    group for the whole query batch. ``queries``: list of dicts with keys
    ``points2D`` [n,2], ``points3D`` [n,3], ``camera``. Returns one
    {success, qvec, tvec, num_inliers, inliers} per query (same semantics as
    :func:`absolute_pose_estimation`). ``mesh`` (jax.sharding.Mesh): shard
    the query batch axis over the device mesh (queries are independent —
    serving fan-out over chips).

    ``staged`` (default): stage 1 runs the cheap P3P-only program
    (<=STAGE1_MAX_SAMPLES 3-point samples, 4H hypotheses, no 12x12/9x9
    null-space solves) for ALL queries; only queries whose LO consensus
    misses the acceptance bar (:func:`_stage_accept`) escalate to the full
    P3P+DLT+homography program at full hypothesis count. Easy queries — the
    overwhelming serving majority — pay ~1/3 of the round-4 program;
    robustness on hard queries is unchanged because escalation re-runs
    everything the unstaged path would.

    Precision contract: the device RANSAC/LO loop runs in float32; when
    ``polish`` is true (default) the returned pose is re-refined on the
    winning inlier set with the float64 host Gauss-Newton
    (:func:`_pose_refinement_np`), so the pose the caller sees matches the
    reference's pycolmap/Ceres f64 path to well below the ETH3D AUC@1mm
    threshold. ``min_inlier_ratio`` is enforced post hoc on the final
    inlier count (hypothesis count is fixed at min(max_iterations, 512)
    samples rather than adaptive — see :func:`absolute_pose_estimation`)."""
    from ..util.jit_cache import bucket

    H = int(min(512, max(64, bucket(min(max_iterations, 512), minimum=64))))
    rng = np.random.default_rng(seed)
    results: list = [None] * len(queries)
    groups: Dict[tuple, list] = {}
    sizes: Dict[int, int] = {}
    for qi, q in enumerate(queries):
        xy = np.asarray(q["points2D"], np.float64).reshape(-1, 2)
        X = np.asarray(q["points3D"], np.float64).reshape(-1, 3)
        n = len(xy)
        if n < 6:
            results[qi] = dict(success=False, num_inliers=0,
                               inliers=np.zeros(n, bool))
            continue
        cam = q["camera"]
        sizes[qi] = n
        groups.setdefault((cam.model, bucket(n, minimum=16)), []).append(
            (qi, xy, X, cam))

    item_of = {qi: it for items in groups.values() for it in items
               for qi in [it[0]]}
    if staged:
        poses = _run_pnp_groups(groups, min(H, STAGE1_MAX_SAMPLES),
                                max_error_px, rng, mesh, "p3p")
        retry: Dict[tuple, list] = {}
        for key, items in groups.items():
            for it in items:
                qi = it[0]
                if not _stage_accept(poses[qi][3], sizes[qi],
                                     min_inlier_ratio):
                    retry.setdefault(key, []).append(it)
        if retry:
            n_retry = sum(len(v) for v in retry.values())
            logger.debug("PnP stage 2: %d/%d queries below the P3P "
                         "acceptance bar, running full program.",
                         n_retry, len(item_of))
            poses.update(_run_pnp_groups(retry, H, max_error_px, rng, mesh,
                                         "full"))
    else:
        poses = _run_pnp_groups(groups, H, max_error_px, rng, mesh, "full")

    for qi, (qv, tv, inl, cnt) in poses.items():
        _, xy, X, cam = item_of[qi]
        results[qi] = finalize_device_pose(
            cam, qv, tv, inl, cnt, xy, X, max_error_px, polish=polish,
            min_inlier_ratio=min_inlier_ratio)
    return results


def finalize_device_pose(cam, qvec, tvec, inliers, num_inliers, xy, X,
                         max_error_px: float, polish: bool = True,
                         min_inlier_ratio: float = 0.0) -> Dict:
    """Host-side finalization of a device RANSAC pose: success checks and
    the optional f64 polish on the winning inlier set. The device loop is
    f32, whose pose noise can sit at the AUC@1mm threshold; the polish uses
    a Cauchy loss at 1px scale (COLMAP RefineAbsolutePose semantics) —
    near-threshold mismatches inside the RANSAC inlier set must not drag
    the pose — and the polished pose is kept only if it does not shrink
    the consensus set."""
    n = len(xy)
    qvec = np.asarray(qvec, np.float64)
    ni = int(num_inliers)
    if ni < 6 or ni < min_inlier_ratio * n or not np.isfinite(qvec).all():
        return dict(success=False, num_inliers=0, inliers=np.zeros(n, bool))
    qv = qvec / np.linalg.norm(qvec)
    tv = np.asarray(tvec, np.float64)
    inl = np.asarray(inliers).astype(bool)
    if polish:
        # adaptive robust scale: COLMAP's fixed CauchyLoss(1.0) assumes
        # ~1px honest inlier noise; featuremetric-refined keypoints sit
        # 1-3px from the geometric optimum by design, and a 1px kernel
        # there fits only the sharpest (possibly biased) sub-population
        # (measured +15 deg on the sacre_coeur KA arm). 1.48*MAD of the
        # inlier residuals matches the kernel to the data's own scale.
        err0 = _reproj_errors(cam, qv, tv, X, xy)
        scale = max(1.0, 1.48 * float(np.median(err0[inl])))
        ref = _pose_refinement_np(cam, qv, tv, X[inl], xy[inl],
                                  loss_scale_px=scale)
        err_p = _reproj_errors(cam, ref["qvec"], ref["tvec"], X, xy)
        inl_p = err_p < max_error_px
        ni_p = int(inl_p.sum())
        if ni_p >= ni:
            qv, tv, inl, ni = ref["qvec"], ref["tvec"], inl_p, ni_p
    return dict(success=True, qvec=qv, tvec=tv, num_inliers=ni, inliers=inl)


def absolute_pose_estimation(points2D: np.ndarray, points3D: np.ndarray,
                             camera: Camera, max_error_px: float = 12.0,
                             min_inlier_ratio: float = 0.01,
                             max_iterations: int = 1000,
                             confidence: float = 0.9999,
                             seed: int = 0, polish: bool = True) -> Dict:
    """RANSAC PnP (device-batched). Returns {success, qvec, tvec, num_inliers,
    inliers}. One jitted program evaluates all minimal-sample hypotheses
    (P3P + DLT + planar homography families) and runs the LO-RANSAC
    refine/expand loop; equivalent of pycolmap.absolute_pose_estimation
    (reference localization/main.py:458-461), with (``polish=True``) a
    float64 host polish on the final inlier set so the returned pose matches
    the reference's Ceres f64 precision. Deviations from the adaptive
    pycolmap contract: the hypothesis count is FIXED at
    min(max_iterations, 512) samples (all evaluated in one device program —
    there is no early confidence-based termination, so ``confidence`` caps
    nothing and is accepted for signature compatibility);
    ``min_inlier_ratio`` is enforced post hoc on the winning inlier count."""
    xy = np.asarray(points2D, np.float64).reshape(-1, 2)
    n = len(xy)
    if n < 6:
        return dict(success=False, num_inliers=0, inliers=np.zeros(n, bool))
    return absolute_pose_estimation_batch(
        [dict(points2D=points2D, points3D=points3D, camera=camera)],
        max_error_px=max_error_px, max_iterations=max_iterations,
        seed=seed, min_inlier_ratio=min_inlier_ratio, polish=polish)[0]


def _absolute_pose_estimation_host(points2D: np.ndarray, points3D: np.ndarray,
                                   camera: Camera, max_error_px: float = 12.0,
                                   min_inlier_ratio: float = 0.01,
                                   max_iterations: int = 1000,
                                   confidence: float = 0.9999,
                                   seed: int = 0) -> Dict:
    """Host-numpy reference implementation (f64, adaptive termination) kept
    as the differential oracle for the jitted path."""
    xy = np.asarray(points2D, np.float64).reshape(-1, 2)
    X = np.asarray(points3D, np.float64).reshape(-1, 3)
    n = len(xy)
    if n < 6:
        return dict(success=False, num_inliers=0, inliers=np.zeros(n, bool))

    uv = camera.cam_from_img(xy)

    rng = np.random.default_rng(seed)
    best = dict(num_inliers=0, inliers=np.zeros(n, bool), qvec=None,
                tvec=None)
    # batched RANSAC: all minimal-sample DLTs solved with one batched SVD,
    # scoring vectorized per batch of hypotheses
    BATCH = 128
    tried = 0
    max_iter = max_iterations
    while tried < max_iter:
        b = min(BATCH, max_iter - tried)
        tried += b
        samples = np.stack([rng.choice(n, 6, replace=False)
                            for _ in range(b)])
        # two hypothesis families per sample: 11-DoF DLT (general scenes)
        # and homography decomposition (planar scenes, where DLT is
        # degenerate — e.g. building facades)
        Rs, ts, ok = _dlt_pose_batch(uv[samples], X[samples])
        Rh, th, okh = _homography_pose_batch(uv[samples], X[samples])
        cand = [(Rs, ts, ok), (Rh, th, okh)]
        for Rc, tc, okc in cand:
            for bi in np.nonzero(okc)[0]:
                err = _reproj_errors_Rt(camera, Rc[bi], tc[bi], X, xy)
                inl = err < max_error_px
                ni = int(inl.sum())
                if ni > best["num_inliers"]:
                    qvec = _rotmat_to_quat_np(Rc[bi])
                    best = dict(num_inliers=ni, inliers=inl, qvec=qvec,
                                tvec=tc[bi])
                    ratio = max(ni / n, min_inlier_ratio)
                    denom = np.log(max(1.0 - ratio ** 6, 1e-12))
                    if denom < 0:
                        max_iter = min(max_iterations,
                                       int(np.ceil(np.log(1 - confidence)
                                                   / denom)))
    if best["num_inliers"] < 6:
        return dict(success=False, num_inliers=0, inliers=np.zeros(n, bool))

    # LO-RANSAC: minimal-sample DLT poses are noise-sensitive, so the raw
    # consensus is small; iteratively refine on the inlier set and re-expand
    # it until the consensus stops growing (COLMAP's LORANSAC equivalent).
    inl = best["inliers"]
    qv, tv = best["qvec"], best["tvec"]
    best_lo = (int(inl.sum()), qv, tv, inl)
    for _ in range(8):
        ref = _pose_refinement_np(camera, qv, tv, X[inl], xy[inl])
        qv, tv = ref["qvec"], ref["tvec"]
        err = _reproj_errors(camera, qv, tv, X, xy)
        new_inl = err < max_error_px
        ni = int(new_inl.sum())
        if ni > best_lo[0]:
            best_lo = (ni, qv, tv, new_inl)
        if ni <= int(inl.sum()):
            break
        inl = new_inl
    ni, qv, tv, inl = best_lo
    return dict(success=True, qvec=qv, tvec=tv,
                num_inliers=ni, inliers=inl)
