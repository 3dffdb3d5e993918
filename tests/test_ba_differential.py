"""Differential BA tests: our Schur LM vs an INDEPENDENT float64 oracle.

The oracle is pure numpy — textbook quaternion->matrix and Rodrigues
formulas, camera distortion re-derived by hand, Catmull-Rom interpolation
re-implemented from the textbook weights — solved by
scipy.optimize.least_squares (TRF) in native float64 with COMPLEX-STEP
Jacobians (machine-precision derivatives; finite differences stall TRF's
trust region on the interpolated cost surface). Nothing from pixsfm_tpu's
compute path is used on the oracle side, so any shared bug shows up as a
mismatch. This is the reference's oracle pattern
(bundle_optimizer_test.cc:141-188 checks pixsfm's geometric BA against
colmap::BundleAdjuster to 1e-4), extended with a featuremetric
(patch-interpolation) case so the residual assembly shared by all
featuremetric variants is externally validated, not just the geometric one.

Round-1 note: the previous oracle built residuals with jax and silently
truncated its requested float64 to f32 (x64 disabled). Rewriting it in
complex-capable numpy removes jax from the oracle entirely — full f64,
tighter tolerances.
"""

import numpy as np
import pytest
from scipy.optimize import least_squares

from pixsfm_tpu.bundle_adjustment import GeometricBundleAdjuster
from pixsfm_tpu.bundle_adjustment.problem import pack_ba_problem
from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction as synth
from tests.test_bundle_adjustment import perturb


# ---------------------------------------------------------------------------
# numpy oracle building blocks (independent, complex-step-safe re-derivations)
# ---------------------------------------------------------------------------

def _np_quat_to_rotmat(q):
    """Textbook [w,x,y,z] -> rotation matrix (unit q)."""
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _np_rodrigues(w):
    """Rotvec -> rotation matrix, complex-step safe (series near 0; the
    unconjugated dot keeps complex perturbations analytic)."""
    th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]],
                 dtype=w.dtype)
    if abs(th2) < 1e-12:
        A = 1.0 - th2 / 6.0
        B = 0.5 - th2 / 24.0
    else:
        th = np.sqrt(th2)
        A = np.sin(th) / th
        B = (1.0 - np.cos(th)) / th2
    return np.eye(3, dtype=w.dtype) + A * K + B * (K @ K)


def _np_distort(model, params, uv):
    u, v = uv[..., 0], uv[..., 1]
    if model in ("SIMPLE_PINHOLE", "PINHOLE"):
        return uv
    if model == "SIMPLE_RADIAL":
        radial = 1.0 + params[3] * (u * u + v * v)
        return uv * radial[..., None]
    if model == "RADIAL":
        r2 = u * u + v * v
        radial = 1.0 + r2 * (params[3] + params[4] * r2)
        return uv * radial[..., None]
    raise NotImplementedError(model)


def _np_focal_pp(model, params):
    if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL"):
        return params[0], params[0], params[1], params[2]
    return params[0], params[1], params[2], params[3]


def _np_project(model, params, R, t, X):
    """X [N,3] world -> pixels [N,2]. R is a 3x3 matrix."""
    x_cam = X @ R.T + t
    uv = x_cam[:, :2] / x_cam[:, 2:3]
    d = _np_distort(model, params, uv)
    fx, fy, cx, cy = _np_focal_pp(model, params)
    return np.stack([fx * d[:, 0] + cx, fy * d[:, 1] + cy], axis=1)


def _np_catmull_rom_w(t):
    t2, t3 = t * t, t * t * t
    return np.stack([-0.5 * t3 + t2 - 0.5 * t,
                     1.5 * t3 - 2.5 * t2 + 1.0,
                     -1.5 * t3 + 2.0 * t2 + 0.5 * t,
                     0.5 * t3 - 0.5 * t2], axis=-1)


def _np_bicubic(patch, r, c):
    """Clamped-tap separable Catmull-Rom at scalar (r, c): [C].
    Complex-step safe: tap indices from the real part (piecewise constant)."""
    H, W, _ = patch.shape
    br, bc = int(np.floor(np.real(r))), int(np.floor(np.real(c)))
    wr = _np_catmull_rom_w(r - br)
    wc = _np_catmull_rom_w(c - bc)
    ri = np.clip(br + np.arange(-1, 3), 0, H - 1)
    ci = np.clip(bc + np.arange(-1, 3), 0, W - 1)
    win = patch[np.ix_(ri, ci)]
    return np.einsum("a,abc,b->c", wr, win, wc)


class _Oracle:
    """Shared parameterization: pose tangents (left rotvec + dt), cams,
    points, with the packed problem's free masks. Jacobians by complex step
    over the supplied residual function."""

    def __init__(self, packed):
        self.packed = packed
        self.I = len(packed.image_ids)
        self.k = packed.cams.shape[1]
        pose_mask = np.repeat(packed.pose_free[:, None], 6, axis=1)
        pose_mask[:, 3:] &= packed.tvec_free
        self.masks = np.concatenate([pose_mask.reshape(-1),
                                     packed.cam_free.reshape(-1),
                                     np.repeat(packed.point_free, 3)])
        self.free_idx = np.nonzero(self.masks)[0]
        self.R0 = [_np_quat_to_rotmat(np.asarray(q, np.float64))
                   for q in packed.qvec]

    def unpack(self, theta_free):
        p = self.packed
        theta = np.zeros(self.masks.size, dtype=theta_free.dtype)
        theta[self.free_idx] = theta_free
        n_pose = 6 * self.I
        n_cam = p.cams.size
        dp = theta[:n_pose].reshape(self.I, 6)
        dc = theta[n_pose:n_pose + n_cam].reshape(p.cams.shape)
        dx = theta[n_pose + n_cam:].reshape(-1, 3)
        Rs = [_np_rodrigues(dp[i, :3]) @ self.R0[i] for i in range(self.I)]
        ts = np.asarray(p.tvec, np.float64) + dp[:, 3:]
        cams = np.asarray(p.cams, np.float64) + dc
        xyz = np.asarray(p.xyz, np.float64) + dx
        return Rs, ts, cams, xyz

    def solve(self, residual_of_theta):
        n = len(self.free_idx)
        h = 1e-200

        def res_real(theta_free):
            return np.real(residual_of_theta(theta_free))

        def jac(theta_free):
            cols = []
            for j in range(n):
                th = theta_free.astype(np.complex128)
                th[j] += 1j * h
                cols.append(np.imag(residual_of_theta(th)) / h)
            return np.stack(cols, axis=1)

        sol = least_squares(res_real, np.zeros(n), jac=jac, method="trf",
                            x_scale="jac", xtol=1e-14, ftol=1e-14,
                            gtol=1e-12, max_nfev=400)
        Rs, ts, cams, xyz = self.unpack(sol.x)
        return ([np.real(R) for R in Rs], np.real(ts), np.real(cams),
                np.real(xyz), 0.5 * float(np.sum(sol.fun ** 2)))


def _rot_angle_deg(Ra, Rb):
    """Geodesic angle between two rotation matrices (degrees)."""
    ctheta = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(ctheta, -1.0, 1.0)))


def oracle_geometric_ba(packed):
    orc = _Oracle(packed)
    model = packed.cam_model
    obs_img = np.asarray(packed.obs_img)
    obs_cam = np.asarray(packed.obs_cam)
    obs_pt = np.asarray(packed.obs_pt)
    obs_xy = np.asarray(packed.obs_xy, np.float64)

    def residuals(theta_free):
        Rs, ts, cams, xyz = orc.unpack(theta_free)
        out = np.empty((len(obs_img), 2), dtype=theta_free.dtype)
        for i in range(orc.I):
            sel = obs_img == i
            out[sel] = _np_project(model, cams[obs_cam[sel][0]], Rs[i],
                                   ts[i], xyz[obs_pt[sel]]) - obs_xy[sel]
        return out.reshape(-1)

    return orc.solve(residuals)


# ---------------------------------------------------------------------------
# geometric differential test
# ---------------------------------------------------------------------------

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
    R_s, t_s, c_s, x_s, cost_s = oracle_geometric_ba(packed)

    # final costs agree closely (both near the common local optimum);
    # tightened from 5% after the oracle moved to native float64
    assert out["final_cost"] <= cost_s * 1.01 + 1e-6, \
        f"ours {out['final_cost']} vs oracle {cost_s}"

    for slot, iid in enumerate(packed.image_ids):
        im = rec_ours.images[iid]
        ang = _rot_angle_deg(_np_quat_to_rotmat(np.asarray(im.qvec)),
                             R_s[slot])
        assert ang < 0.02, f"pose {slot} rotation off by {ang} deg"
        np.testing.assert_allclose(im.tvec, t_s[slot], atol=1.5e-3)
    errs = [np.linalg.norm(rec_ours.points3D[pid].xyz - x_s[s])
            for s, pid in enumerate(packed.point_ids)]
    assert np.median(errs) < 1.5e-3


# ---------------------------------------------------------------------------
# featuremetric differential test — validates the patch-residual assembly
# (projection -> patch-coordinate transform -> bicubic interpolation -> ref
# subtraction) shared by feature_reference/costmap/QBA strategies
# ---------------------------------------------------------------------------

def test_featuremetric_ba_matches_scipy(rng):
    import jax.numpy as jnp
    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.bundle_adjustment.main import (_RESIDUAL_BUILDERS,
                                                   _RESIDUAL_JAC_BUILDERS)
    from pixsfm_tpu.ops.schur import (BAObservations, BAOptions, BAState,
                                      ba_solve, make_pair_list)
    from pixsfm_tpu.util.jit_cache import interp_static_key

    rec = synth(n_images=3, n_points=12, noise_px=0.0, seed=7)
    packed_gt = pack_ba_problem(rec)
    model = packed_gt.cam_model
    O = len(packed_gt.obs_img)
    ps, C = 14, 4
    scale, ups = 0.25, 1.0

    # quadratic polynomial patches (Catmull-Rom reproduces quadratics
    # exactly, so the featuremetric surface is globally smooth and both
    # solvers converge to the same unique optimum — random smoothed noise is
    # multimodal at sub-pixel scale and stalls any trust-region method);
    # corner placed so the GT reprojection lands at patch coords ~(ps/2,ps/2)
    gr, gc = np.meshgrid(np.arange(ps, dtype=np.float64),
                         np.arange(ps, dtype=np.float64), indexing="ij")
    r0c0 = ps / 2.0
    quad = np.stack([(gr - r0c0) ** 2, (gc - r0c0) ** 2,
                     (gr - r0c0) * (gc - r0c0),
                     gr - r0c0, gc - r0c0], axis=-1)  # [ps, ps, 5]
    coef = rng.normal(0, 1, (O, 5, C)) * np.array(
        [0.05, 0.05, 0.03, 0.4, 0.4])[None, :, None]
    patches = np.einsum("hwq,oqc->ohwc", quad, coef).astype(np.float32)
    pix_gt = np.asarray(packed_gt.obs_xy, np.float64)
    corners = (pix_gt * scale - 0.5 - ps / 2.0).astype(np.float32)
    scales = np.full((O, 2), scale, np.float32)
    upsv = np.full((O,), ups, np.float32)

    # targets: oracle interpolation at the GT projection (f64)
    targets = np.stack([
        _np_bicubic(patches[i].astype(np.float64),
                    (pix_gt[i, 1] * scale - 0.5 - corners[i, 1]) * ups,
                    (pix_gt[i, 0] * scale - 0.5 - corners[i, 0]) * ups)
        for i in range(O)]).astype(np.float32)

    # perturb and pack the problem both solvers start from
    perturb(rec, rng, pose_rot=0.002, pose_t=0.01, point_sigma=0.01)
    packed = pack_ba_problem(rec, refine_focal_length=False,
                             refine_extra_params=False)
    assert np.array_equal(packed.obs_img, packed_gt.obs_img)

    # --- oracle: f64 TRF with complex-step Jacobians, identical residual
    orc = _Oracle(packed)
    obs_img = np.asarray(packed.obs_img)
    obs_cam = np.asarray(packed.obs_cam)
    obs_pt = np.asarray(packed.obs_pt)
    patches64 = patches.astype(np.float64)

    def residuals(theta_free):
        Rs, ts, cams, xyz = orc.unpack(theta_free)
        out = np.empty((O, C), dtype=theta_free.dtype)
        for i in range(O):
            ii = obs_img[i]
            pix = _np_project(model, cams[obs_cam[i]], Rs[ii], ts[ii],
                              xyz[obs_pt[i]][None])[0]
            pc = (pix * scale - 0.5 - corners[i]) * ups
            out[i] = _np_bicubic(patches64[i], pc[1], pc[0]) - targets[i]
        return out.reshape(-1)

    R_s, t_s, c_s, x_s, cost_s = orc.solve(residuals)

    # --- ours: ba_solve with the feature_reference residual (+analytic jac)
    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=False,
                                 check_bounds=False)
    ikey = interp_static_key(interp)
    rfn = _RESIDUAL_BUILDERS["feature_reference"](model, ikey)
    jfn = _RESIDUAL_JAC_BUILDERS["feature_reference"](model, ikey)
    ctx = (jnp.asarray(patches), jnp.asarray(corners), jnp.asarray(scales),
           jnp.asarray(upsv))
    pair_o1, pair_o2 = make_pair_list(packed.obs_pt, len(packed.point_ids))
    obs = BAObservations(
        img_idx=jnp.asarray(packed.obs_img),
        cam_idx=jnp.asarray(packed.obs_cam),
        pt_idx=jnp.asarray(packed.obs_pt),
        obs_data=(jnp.arange(O, dtype=jnp.int32), jnp.asarray(targets)),
        valid=jnp.ones((O,), bool),
        pair_o1=jnp.asarray(pair_o1), pair_o2=jnp.asarray(pair_o2))
    state0 = BAState(jnp.asarray(packed.qvec), jnp.asarray(packed.tvec),
                     jnp.asarray(packed.cams), jnp.asarray(packed.xyz))
    opts = BAOptions(max_iterations=60, obs_chunk=64)
    state, summary = ba_solve(
        rfn, state0, obs, RobustLoss("trivial"),
        jnp.asarray(packed.pose_free), jnp.asarray(packed.tvec_free),
        jnp.asarray(packed.cam_free), jnp.asarray(packed.point_free),
        opts=opts, ctx=ctx, residual_jac_fn=jfn)

    ours = float(summary["final_cost"])
    assert ours <= cost_s * 1.05 + 1e-7, f"ours {ours} vs oracle {cost_s}"
    # states land on the same optimum
    for slot in range(len(packed.image_ids)):
        ang = _rot_angle_deg(
            _np_quat_to_rotmat(np.asarray(state.qvec[slot], np.float64)),
            R_s[slot])
        assert ang < 0.05, f"pose {slot} rotation off by {ang} deg"
        np.testing.assert_allclose(np.asarray(state.tvec[slot]), t_s[slot],
                                   atol=5e-3)
    errs = np.linalg.norm(np.asarray(state.xyz) - x_s, axis=1)
    assert np.median(errs) < 5e-3
