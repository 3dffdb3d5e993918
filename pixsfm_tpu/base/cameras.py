"""COLMAP-compatible camera models, differentiable in jnp.

Mirrors the behavior (not the code) of COLMAP's camera models as used by the reference
(pixsfm/base/src/projection.h:77-90, pixsfm/base/src/undistortion.h:12-142): each model maps
normalized camera coordinates ``(u, v) = (x/z, y/z)`` to pixels (``img_from_cam``,
COLMAP ``WorldToImage``) and back (``cam_from_img``, COLMAP ``ImageToWorld``), where the
inverse distortion is solved by a fixed-iteration Newton solver that stays differentiable
(the reference templates an autodiff'd 100-iteration solver; here the iteration is
unrolled under ``lax.fori_loop`` with an analytic 2x2 distortion Jacobian, which XLA
compiles to straight-line vector code).

Model IDs/param layouts follow the public COLMAP convention:

====  ====================  =========================================
 id   name                  params
====  ====================  =========================================
 0    SIMPLE_PINHOLE        f, cx, cy
 1    PINHOLE               fx, fy, cx, cy
 2    SIMPLE_RADIAL         f, cx, cy, k
 3    RADIAL                f, cx, cy, k1, k2
 4    OPENCV                fx, fy, cx, cy, k1, k2, p1, p2
 5    OPENCV_FISHEYE        fx, fy, cx, cy, k1, k2, k3, k4
====  ====================  =========================================
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CAMERA_MODELS", "CameraModelSpec", "Camera",
    "img_from_cam", "cam_from_img",
    "focal_param_idxs", "principal_point_idxs", "extra_param_idxs",
]

NEWTON_UNDISTORT_ITERS = 25


@dataclass(frozen=True)
class CameraModelSpec:
    model_id: int
    name: str
    num_params: int
    focal_idxs: Tuple[int, ...]
    pp_idxs: Tuple[int, ...]
    extra_idxs: Tuple[int, ...]


_SPECS: List[CameraModelSpec] = [
    CameraModelSpec(0, "SIMPLE_PINHOLE", 3, (0,), (1, 2), ()),
    CameraModelSpec(1, "PINHOLE", 4, (0, 1), (2, 3), ()),
    CameraModelSpec(2, "SIMPLE_RADIAL", 4, (0,), (1, 2), (3,)),
    CameraModelSpec(3, "RADIAL", 5, (0,), (1, 2), (3, 4)),
    CameraModelSpec(4, "OPENCV", 8, (0, 1), (2, 3), (4, 5, 6, 7)),
    CameraModelSpec(5, "OPENCV_FISHEYE", 8, (0, 1), (2, 3), (4, 5, 6, 7)),
]

CAMERA_MODELS: Dict[str, CameraModelSpec] = {s.name: s for s in _SPECS}
CAMERA_MODEL_IDS: Dict[int, CameraModelSpec] = {s.model_id: s for s in _SPECS}


def focal_param_idxs(model: str) -> Tuple[int, ...]:
    return CAMERA_MODELS[model].focal_idxs


def principal_point_idxs(model: str) -> Tuple[int, ...]:
    return CAMERA_MODELS[model].pp_idxs


def extra_param_idxs(model: str) -> Tuple[int, ...]:
    return CAMERA_MODELS[model].extra_idxs


# ---------------------------------------------------------------------------
# distortion: (u, v) undistorted normalized -> distorted normalized
# ---------------------------------------------------------------------------

def _distort(model: str, params, uv):
    u, v = uv[..., 0], uv[..., 1]
    if model in ("SIMPLE_PINHOLE", "PINHOLE"):
        return uv
    if model == "SIMPLE_RADIAL":
        k = params[..., 3]
        r2 = u * u + v * v
        radial = 1.0 + k * r2
        return uv * radial[..., None]
    if model == "RADIAL":
        k1, k2 = params[..., 3], params[..., 4]
        r2 = u * u + v * v
        radial = 1.0 + r2 * (k1 + k2 * r2)
        return uv * radial[..., None]
    if model == "OPENCV":
        k1, k2 = params[..., 4], params[..., 5]
        p1, p2 = params[..., 6], params[..., 7]
        r2 = u * u + v * v
        radial = 1.0 + r2 * (k1 + k2 * r2)
        du = u * radial + 2.0 * p1 * u * v + p2 * (r2 + 2.0 * u * u)
        dv = v * radial + p1 * (r2 + 2.0 * v * v) + 2.0 * p2 * u * v
        return jnp.stack([du, dv], axis=-1)
    if model == "OPENCV_FISHEYE":
        k1, k2 = params[..., 4], params[..., 5]
        k3, k4 = params[..., 6], params[..., 7]
        r = jnp.sqrt(jnp.maximum(u * u + v * v, 1e-24))
        theta = jnp.arctan(r)
        t2 = theta * theta
        theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        scale = jnp.where(r > 1e-8, theta_d / r, 1.0)
        return uv * scale[..., None]
    raise ValueError(f"unknown camera model {model}")


def _undistort(model: str, params, uv_dist):
    """Fixed-iteration Newton inverse of ``_distort`` (differentiable).

    The reference solves the same problem with autodiff'd Newton + central differences
    (pixsfm/base/src/undistortion.h:13-64); here the 2x2 Jacobian comes from
    ``jax.jacfwd`` of the analytic distortion. The iteration count is static so the
    whole solve compiles to a fixed XLA loop.
    """
    if model in ("SIMPLE_PINHOLE", "PINHOLE"):
        return uv_dist

    def dist_fn(x):
        return _distort(model, params, x)

    def body(_, x):
        r, jvp1 = jax.jvp(dist_fn, (x,), (jnp.array([1.0, 0.0], x.dtype),))
        _, jvp2 = jax.jvp(dist_fn, (x,), (jnp.array([0.0, 1.0], x.dtype),))
        r = r - uv_dist
        # J columns are jvp1, jvp2; solve J dx = r (2x2 Cramer)
        det = jvp1[0] * jvp2[1] - jvp2[0] * jvp1[1]
        det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
        dx = jnp.stack([
            (jvp2[1] * r[0] - jvp2[0] * r[1]) / det,
            (jvp1[0] * r[1] - jvp1[1] * r[0]) / det,
        ])
        return x - dx

    return jax.lax.fori_loop(0, NEWTON_UNDISTORT_ITERS, body, uv_dist,
                             unroll=False)


# ---------------------------------------------------------------------------
# pixel <-> normalized camera plane
# ---------------------------------------------------------------------------

def _focal_pp(model: str, params):
    spec = CAMERA_MODELS[model]
    if len(spec.focal_idxs) == 1:
        fx = fy = params[..., spec.focal_idxs[0]]
    else:
        fx = params[..., spec.focal_idxs[0]]
        fy = params[..., spec.focal_idxs[1]]
    cx = params[..., spec.pp_idxs[0]]
    cy = params[..., spec.pp_idxs[1]]
    return fx, fy, cx, cy


def img_from_cam(model: str, params, uv):
    """Normalized camera coords (..., 2) -> pixel coords (..., 2). COLMAP WorldToImage."""
    d = _distort(model, params, uv)
    fx, fy, cx, cy = _focal_pp(model, params)
    return jnp.stack([fx * d[..., 0] + cx, fy * d[..., 1] + cy], axis=-1)


def distort_with_jac(model: str, params, uv):
    """Distortion map with hand-written Jacobians (unbatched; vmap for batches).

    Returns ``(d [2], J_uv [2, 2], J_extra [2, n_extra])`` where ``d`` equals
    ``_distort(model, params, uv)``, ``J_uv = dd/duv`` and ``J_extra`` are the
    columns w.r.t. the model's extra (distortion) parameters. Closed-form
    analogue of the derivative information Ceres Jets carry through the
    reference's distortion templates (pixsfm/base/src/projection.h:77-90) —
    used by the BA fast path so residual Jacobians avoid generic jacfwd over
    the full pose+intrinsics+point tangent.
    """
    dt = uv.dtype
    u, v = uv[0], uv[1]
    eye = jnp.eye(2, dtype=dt)
    if model in ("SIMPLE_PINHOLE", "PINHOLE"):
        return uv, eye, jnp.zeros((2, 0), dt)
    r2 = u * u + v * v
    uuT = jnp.outer(uv, uv)
    if model == "SIMPLE_RADIAL":
        k = params[3]
        radial = 1.0 + k * r2
        J_uv = radial * eye + 2.0 * k * uuT
        return uv * radial, J_uv, (uv * r2)[:, None]
    if model == "RADIAL":
        k1, k2 = params[3], params[4]
        radial = 1.0 + r2 * (k1 + k2 * r2)
        drad_dr2 = k1 + 2.0 * k2 * r2
        J_uv = radial * eye + 2.0 * drad_dr2 * uuT
        J_extra = jnp.stack([uv * r2, uv * (r2 * r2)], axis=1)
        return uv * radial, J_uv, J_extra
    if model == "OPENCV":
        k1, k2 = params[4], params[5]
        p1, p2 = params[6], params[7]
        radial = 1.0 + r2 * (k1 + k2 * r2)
        drad_dr2 = k1 + 2.0 * k2 * r2
        du = u * radial + 2.0 * p1 * u * v + p2 * (r2 + 2.0 * u * u)
        dv = v * radial + p1 * (r2 + 2.0 * v * v) + 2.0 * p2 * u * v
        ddu_du = radial + 2.0 * u * u * drad_dr2 + 2.0 * p1 * v + 6.0 * p2 * u
        ddv_dv = radial + 2.0 * v * v * drad_dr2 + 6.0 * p1 * v + 2.0 * p2 * u
        # d(du)/dv == d(dv)/du (the tangential terms are symmetric)
        off = 2.0 * u * v * drad_dr2 + 2.0 * p1 * u + 2.0 * p2 * v
        J_uv = jnp.stack([jnp.stack([ddu_du, off]),
                          jnp.stack([off, ddv_dv])])
        J_extra = jnp.stack([
            jnp.stack([u * r2, u * r2 * r2, 2.0 * u * v, r2 + 2.0 * u * u]),
            jnp.stack([v * r2, v * r2 * r2, r2 + 2.0 * v * v, 2.0 * u * v]),
        ])
        return jnp.stack([du, dv]), J_uv, J_extra
    if model == "OPENCV_FISHEYE":
        k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
        r = jnp.sqrt(jnp.maximum(r2, 1e-24))
        theta = jnp.arctan(r)
        t2 = theta * theta
        poly = 1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
        theta_d = theta * poly
        scale = jnp.where(r > 1e-8, theta_d / r, 1.0)
        dtd_dt = 1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2
                                              + t2 * (7.0 * k3
                                                      + t2 * 9.0 * k4)))
        dt_dr = 1.0 / (1.0 + r2)
        # d(scale)/dr / r, with the r->0 limit 2*(k1 - 1/3) from the Taylor
        # expansion theta_d/r = 1 + (k1 - 1/3) r^2 + O(r^4)
        dscale_dr_over_r = jnp.where(
            r > 1e-6,
            dtd_dt * dt_dr / r2 - theta_d / (r2 * r),
            2.0 * (k1 - 1.0 / 3.0))
        J_uv = scale * eye + dscale_dr_over_r * uuT
        tpow = jnp.where(r > 1e-8, 1.0 / r, 0.0) * jnp.stack(
            [theta ** 3, theta ** 5, theta ** 7, theta ** 9])
        J_extra = uv[:, None] * tpow[None, :]
        return uv * scale, J_uv, J_extra
    raise ValueError(f"unknown camera model {model}")


def img_from_cam_with_jac(model: str, params, uv):
    """``img_from_cam`` with analytic Jacobians (unbatched).

    Returns ``(pix [2], J_uv [2, 2], J_cam [2, k])`` — the pixel, its
    derivative w.r.t. normalized camera coords, and w.r.t. ALL k camera
    parameters (focal / principal point / distortion columns filled per the
    model's param layout).
    """
    spec = CAMERA_MODELS[model]
    d, Jd_uv, Jd_extra = distort_with_jac(model, params, uv)
    fx, fy, cx, cy = _focal_pp(model, params)
    f = jnp.stack([fx, fy])
    pix = f * d + jnp.stack([cx, cy])
    J_uv = f[:, None] * Jd_uv
    J_cam = jnp.zeros((2, spec.num_params), uv.dtype)
    if len(spec.focal_idxs) == 1:
        J_cam = J_cam.at[:, spec.focal_idxs[0]].set(d)
    else:
        J_cam = J_cam.at[0, spec.focal_idxs[0]].set(d[0])
        J_cam = J_cam.at[1, spec.focal_idxs[1]].set(d[1])
    J_cam = J_cam.at[0, spec.pp_idxs[0]].set(1.0)
    J_cam = J_cam.at[1, spec.pp_idxs[1]].set(1.0)
    if spec.extra_idxs:
        J_cam = J_cam.at[:, jnp.asarray(spec.extra_idxs)].set(
            f[:, None] * Jd_extra)
    return pix, J_uv, J_cam


def cam_from_img(model: str, params, xy):
    """Pixel coords (2,) -> normalized camera coords (2,). COLMAP ImageToWorld.

    Unbatched core (vmap for batches) because of the Newton 2x2 solve.
    """
    fx, fy, cx, cy = _focal_pp(model, params)
    uv_dist = jnp.stack([(xy[..., 0] - cx) / fx, (xy[..., 1] - cy) / fy], axis=-1)
    return _undistort(model, params, uv_dist)


@lru_cache(maxsize=None)
def img_from_cam_jit(model: str):
    """Cached jitted ``img_from_cam`` for host-side use (eager dispatch under the
    TPU tunnel is slow; repeated calls must hit the executable cache)."""
    return jax.jit(lambda params, uv: img_from_cam(model, params, uv))


@lru_cache(maxsize=None)
def cam_from_img_jit(model: str):
    """Cached jitted, batched ``cam_from_img``: (N,2) pixels -> (N,2) normalized."""
    return jax.jit(jax.vmap(lambda params, p: cam_from_img(model, params, p),
                            in_axes=(None, 0)))


# ---------------------------------------------------------------------------
# host-side camera record
# ---------------------------------------------------------------------------

@dataclass
class Camera:
    """Host-side camera (COLMAP Reconstruction camera record)."""
    camera_id: int
    model: str
    width: int
    height: int
    params: np.ndarray

    def __post_init__(self):
        self.params = np.asarray(self.params, dtype=np.float64)
        spec = CAMERA_MODELS[self.model]
        if len(self.params) != spec.num_params:
            raise ValueError(
                f"{self.model} expects {spec.num_params} params, got {len(self.params)}")

    @property
    def model_id(self) -> int:
        return CAMERA_MODELS[self.model].model_id

    @property
    def mean_focal_length(self) -> float:
        idxs = CAMERA_MODELS[self.model].focal_idxs
        return float(np.mean([self.params[i] for i in idxs]))

    def img_from_cam(self, uv):
        return np.asarray(img_from_cam_jit(self.model)(
            jnp.asarray(self.params), jnp.asarray(uv)))

    def cam_from_img(self, xy):
        xy = np.asarray(xy, dtype=np.float64)
        single = xy.ndim == 1
        batch = np.atleast_2d(xy)
        # pad to power-of-two buckets: repeated calls with varying batch sizes
        # must reuse the compiled undistortion program
        n = len(batch)
        n_pad = max(1 << int(np.ceil(np.log2(max(n, 1)))), 8)
        if n_pad > n:
            batch = np.concatenate(
                [batch, np.zeros((n_pad - n, 2), batch.dtype)])
        out = np.asarray(cam_from_img_jit(self.model)(
            jnp.asarray(self.params), jnp.asarray(batch)))[:n]
        return out[0] if single else out
