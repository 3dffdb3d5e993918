"""Bundle adjustment orchestration (reference: pixsfm/bundle_adjustment/main.py).

Strategies (BundleAdjuster.create, reference ba/main.py:65-74):

- ``geometric``: classic reprojection-error BA (GeometricBundleOptimizer,
  geometric_bundle_optimizer.h:12-88) — also the differential-test target.
- ``feature_reference``: per-observation featuremetric error toward each track's
  robust reference descriptor (FeatureReferenceBundleOptimizer,
  feature_reference_bundle_optimizer.h:21-149).
- ``costmaps``: 1-D residuals over precomputed cost patches
  (CostMapBundleOptimizer, costmap_bundle_optimizer.h:17-132).
- ``patch_warp``: fronto-parallel patch warping (PatchWarpBundleOptimizer,
  patch_warp_bundle_optimizer.h:21-61).

All strategies funnel into :func:`pixsfm_tpu.ops.schur.ba_solve` with different
residual closures — the TPU analogue of the reference's CRTP ``AddResiduals``.
"""

from __future__ import annotations

import time
from copy import deepcopy
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..base import interpolation_default_conf, solver_default_conf
from ..base.cameras import img_from_cam
from ..base.geometry import apply_pose
from ..base.interpolation import InterpolationConfig, interpolate
from ..base.losses import make_loss
from ..config import merge
from ..features.featuremaps import FeatureView
from ..ops.schur import BAObservations, BAOptions, BAState, ba_solve, \
    make_pair_list
from ..sfm.model import Reconstruction
from .problem import (BundleAdjustmentSetup, PackedBA, default_problem_setup,
                      pack_ba_problem)

__all__ = ["BundleAdjuster", "GeometricBundleAdjuster",
           "FeatureReferenceBundleAdjuster", "CostMapBundleAdjuster",
           "PatchWarpBundleAdjuster"]


# ---------------------------------------------------------------------------
# cached compiled BA runners
#
# Residual builders are top-level factories keyed by static config so one
# jitted instance of the full Schur LM serves every call with the same shapes
# (problem sizes are padded to power-of-two buckets) — retraces through the
# remote TPU tunnel cost minutes.
# ---------------------------------------------------------------------------

def _safe_project(model, cam, qvec, tvec, X):
    x_cam = apply_pose(qvec, tvec, X)
    z = x_cam[2]
    z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    uv = x_cam[:2] / z
    return img_from_cam(model, cam, uv)


def _is_mixed(model):
    return isinstance(model, tuple) and len(model) > 1


def _switch_project(models, mi, cam, qvec, tvec, X):
    """Per-observation camera-model dispatch: static per-model projection
    code, traced branch selection (reference: the camera-switch macros in
    residuals/src/featuremetric.h:246-258)."""
    branches = [
        (lambda m: lambda a: _safe_project(m, *a))(m) for m in models]
    return jax.lax.switch(mi, branches, (cam, qvec, tvec, X))


def _build_geometric(model):
    """model: camera-model name, or a tuple of names for mixed-model
    problems — each observation then carries its model index and the
    projection branch is chosen with ``lax.switch`` (static per-model code,
    traced selection; jacfwd flows through the taken branch)."""
    if _is_mixed(model):
        models = model

        def residual_fn(qvec, tvec, cam, X, obs_slice, ctx):
            xy_obs, mi = obs_slice
            xy = _switch_project(models, mi, cam, qvec, tvec, X)
            return xy - xy_obs
        return residual_fn

    if isinstance(model, tuple):
        model = model[0]

    def residual_fn(qvec, tvec, cam, X, obs_slice, ctx):
        xy_obs = obs_slice
        return _safe_project(model, cam, qvec, tvec, X) - xy_obs
    return residual_fn


def _build_feature_reference(model, interp_key):
    from ..util.jit_cache import interp_from_key
    interp = interp_from_key(interp_key)
    mixed = _is_mixed(model)
    if isinstance(model, tuple) and not mixed:
        model = model[0]

    def residual_fn(qvec, tvec, cam, X, obs_slice, ctx):
        if mixed:
            row, target, mi = obs_slice
            xy = _switch_project(model, mi, cam, qvec, tvec, X)
        else:
            row, target = obs_slice
            xy = _safe_project(model, cam, qvec, tvec, X)
        patches, corners, scales, ups = ctx
        pc = (xy * scales[row] - 0.5 - corners[row]) * ups[row]
        from ..base.interpolation import (bounds_violation,
                                          interpolate_residual)
        f = interpolate_residual(patches, row, pc[1], pc[0], interp)
        r = f - target
        if interp.check_bounds:
            viol = bounds_violation(pc[1], pc[0], patches.shape[1],
                                    patches.shape[2])
            r = jnp.concatenate([r, viol[None]])
        return r
    return residual_fn


def _build_costmap(model, interp_key):
    from ..util.jit_cache import interp_from_key
    interp = interp_from_key(interp_key)
    mixed = _is_mixed(model)
    if isinstance(model, tuple) and not mixed:
        model = model[0]

    def residual_fn(qvec, tvec, cam, X, obs_slice, ctx):
        if mixed:
            row, mi = obs_slice
            xy = _switch_project(model, mi, cam, qvec, tvec, X)
        else:
            row = obs_slice
            xy = _safe_project(model, cam, qvec, tvec, X)
        patches, corners, scales, ups = ctx
        pc = (xy * scales[row] - 0.5 - corners[row]) * ups[row]
        from ..base.interpolation import (bounds_violation,
                                          interpolate_residual)
        r = interpolate_residual(patches, row, pc[1], pc[0], interp)
        if interp.check_bounds:
            viol = bounds_violation(pc[1], pc[0], patches.shape[1],
                                    patches.shape[2])
            r = jnp.concatenate([r, viol[None]])
        return r
    return residual_fn


def _build_feature_reference_window(model, interp_key):
    """Feature-reference residual with the patch window travelling PER
    OBSERVATION in ``obs_data`` instead of a shared replicated ``ctx`` stack.

    This is the multi-chip payload layout: under a sharded obs axis each
    chip's HBM holds only its shard's patch windows — the TPU analogue of
    the reference's per-subproblem FeatureView loads
    (featuremetric_keypoint_optimizer.h:117-137) and the layout that makes
    Aachen-scale feature payloads (~350 GB, README.md:291) shardable."""
    from ..util.jit_cache import interp_from_key
    interp = interp_from_key(interp_key)
    mixed = _is_mixed(model)
    if isinstance(model, tuple) and not mixed:
        model = model[0]

    def residual_fn(qvec, tvec, cam, X, obs_slice, ctx):
        if mixed:
            window, corner, scale, ups, target, mi = obs_slice
            xy = _switch_project(model, mi, cam, qvec, tvec, X)
        else:
            window, corner, scale, ups, target = obs_slice
            xy = _safe_project(model, cam, qvec, tvec, X)
        pc = (xy * scale - 0.5 - corner) * ups
        from ..base.interpolation import (bounds_violation,
                                          interpolate_residual)
        f = interpolate_residual(window[None], 0, pc[1], pc[0], interp)
        r = f - target
        if interp.check_bounds:
            viol = bounds_violation(pc[1], pc[0], window.shape[0],
                                    window.shape[1])
            r = jnp.concatenate([r, viol[None]])
        return r
    return residual_fn


def _build_costmap_window(model, interp_key):
    """Costmap residual with the cost patch travelling per observation in
    ``obs_data`` (multi-chip payload layout — see
    _build_feature_reference_window)."""
    from ..util.jit_cache import interp_from_key
    interp = interp_from_key(interp_key)
    mixed = _is_mixed(model)
    if isinstance(model, tuple) and not mixed:
        model = model[0]

    def residual_fn(qvec, tvec, cam, X, obs_slice, ctx):
        if mixed:
            window, corner, scale, ups, mi = obs_slice
            xy = _switch_project(model, mi, cam, qvec, tvec, X)
        else:
            window, corner, scale, ups = obs_slice
            xy = _safe_project(model, cam, qvec, tvec, X)
        pc = (xy * scale - 0.5 - corner) * ups
        from ..base.interpolation import (bounds_violation,
                                          interpolate_residual)
        r = interpolate_residual(window[None], 0, pc[1], pc[0], interp)
        if interp.check_bounds:
            viol = bounds_violation(pc[1], pc[0], window.shape[0],
                                    window.shape[1])
            r = jnp.concatenate([r, viol[None]])
        return r
    return residual_fn


def _build_patch_warp(model, interp_key, joint):
    # lazy import: the warp residual lives beside its strategy
    from .patch_warp import build_patch_warp_residual
    return build_patch_warp_residual(model, interp_key, joint)


_RESIDUAL_BUILDERS = {
    "geometric": _build_geometric,
    "feature_reference": _build_feature_reference,
    "feature_reference_window": _build_feature_reference_window,
    "costmap": _build_costmap,
    "costmap_window": _build_costmap_window,
    "patch_warp": _build_patch_warp,
}


# ---------------------------------------------------------------------------
# analytic-Jacobian fast path (ops/schur.py residual_jac_fn)
#
# Each builder returns residual_jac_fn(q, t, cam, X, obs_slice, ctx) ->
# (r [C], J [C, 6+k+3]) composed from project_with_jac (closed-form
# pose/intrinsics/point columns) and the analytic interpolation gradients —
# replacing generic jacfwd over the whole tangent in the BA residual hot
# loop (the reference gets the same structure from Ceres Jets,
# feature_reference.h:98-137). Returns None when the config needs the
# autodiff path (NCC normalization). Parity with jacfwd is asserted in
# tests/test_ba_jac_path.py.
# ---------------------------------------------------------------------------

def _jac_cat(Jp, Jc, Jx):
    return jnp.concatenate([Jp, Jc, Jx], axis=1)


def _switch_project_with_jac(models, mi, cam, qvec, tvec, X):
    """Mixed-model closed-form projection Jacobian: per-model branches with
    the intrinsics columns padded to the widest model's parameter count.
    Returns (pix [2], J [2, 6+k_max+3])."""
    from ..base.cameras import CAMERA_MODELS
    from ..base.projection import project_with_jac
    k_max = cam.shape[0]

    def branch(m):
        km = CAMERA_MODELS[m].num_params

        def f(a):
            cam_, q_, t_, X_ = a
            pix, Jp, Jc, Jx = project_with_jac(m, cam_[:km], q_, t_, X_)
            Jc = jnp.pad(Jc, ((0, 0), (0, k_max - km)))
            return pix, _jac_cat(Jp, Jc, Jx)
        return f

    return jax.lax.switch(mi, [branch(m) for m in models],
                          (cam, qvec, tvec, X))


def _build_geometric_jac(model):
    from ..base.projection import project_with_jac

    if _is_mixed(model):
        models = model

        def residual_jac_fn(qvec, tvec, cam, X, obs_slice, ctx):
            xy_obs, mi = obs_slice
            pix, J = _switch_project_with_jac(models, mi, cam, qvec, tvec, X)
            return pix - xy_obs, J
        return residual_jac_fn

    if isinstance(model, tuple):
        model = model[0]

    def residual_jac_fn(qvec, tvec, cam, X, obs_slice, ctx):
        xy_obs = obs_slice
        pix, Jp, Jc, Jx = project_with_jac(model, cam, qvec, tvec, X)
        return pix - xy_obs, _jac_cat(Jp, Jc, Jx)
    return residual_jac_fn


def _interp_residual_jac(interp, patches, row, pix, Jpix, scales_row,
                         ups_row, corners_row):
    """Shared featuremetric tail: patch-coords transform + interpolation +
    optional bounds-violation row, with the Jacobian chain composed by hand.
    Returns (f [C(+1)], J [C(+1), 6+k+3]) where f excludes the target."""
    from ..base.interpolation import (bounds_violation,
                                      interpolate_residual_with_grad)
    su = scales_row * ups_row                    # [2] d(patch coords)/d(pix)
    pc = (pix * scales_row - 0.5 - corners_row) * ups_row
    f, dfdr, dfdc = interpolate_residual_with_grad(
        patches, row, pc[1], pc[0], interp)
    J = dfdc[:, None] * (su[0] * Jpix[0])[None, :] \
        + dfdr[:, None] * (su[1] * Jpix[1])[None, :]
    if interp.check_bounds:
        H, W = patches.shape[1], patches.shape[2]
        viol = bounds_violation(pc[1], pc[0], H, W)
        one = jnp.float32(1.0)
        dv_dr = jnp.where(pc[1] > H - 1.0, one, 0.0) \
            - jnp.where(pc[1] < 0.0, one, 0.0)
        dv_dc = jnp.where(pc[0] > W - 1.0, one, 0.0) \
            - jnp.where(pc[0] < 0.0, one, 0.0)
        Jv = dv_dc * su[0] * Jpix[0] + dv_dr * su[1] * Jpix[1]
        f = jnp.concatenate([f, viol[None]])
        J = jnp.concatenate([J, Jv[None, :]], axis=0)
    return f, J


def _build_feature_reference_jac(model, interp_key):
    from ..util.jit_cache import interp_from_key
    from ..base.projection import project_with_jac
    interp = interp_from_key(interp_key)
    if interp.ncc_normalize:
        return None
    mixed = _is_mixed(model)
    if isinstance(model, tuple) and not mixed:
        model = model[0]

    def residual_jac_fn(qvec, tvec, cam, X, obs_slice, ctx):
        if mixed:
            row, target, mi = obs_slice
            pix, Jpix = _switch_project_with_jac(model, mi, cam, qvec, tvec,
                                                 X)
        else:
            row, target = obs_slice
            pix, Jp, Jc, Jx = project_with_jac(model, cam, qvec, tvec, X)
            Jpix = _jac_cat(Jp, Jc, Jx)
        patches, corners, scales, ups = ctx
        f, J = _interp_residual_jac(interp, patches, row, pix, Jpix,
                                    scales[row], ups[row], corners[row])
        r = f.at[:target.shape[0]].add(-target) if interp.check_bounds \
            else f - target
        return r, J
    return residual_jac_fn


def _build_costmap_jac(model, interp_key):
    from ..util.jit_cache import interp_from_key
    from ..base.projection import project_with_jac
    interp = interp_from_key(interp_key)
    if interp.ncc_normalize:
        return None
    mixed = _is_mixed(model)
    if isinstance(model, tuple) and not mixed:
        model = model[0]

    def residual_jac_fn(qvec, tvec, cam, X, obs_slice, ctx):
        if mixed:
            row, mi = obs_slice
            pix, Jpix = _switch_project_with_jac(model, mi, cam, qvec, tvec,
                                                 X)
        else:
            row = obs_slice
            pix, Jp, Jc, Jx = project_with_jac(model, cam, qvec, tvec, X)
            Jpix = _jac_cat(Jp, Jc, Jx)
        patches, corners, scales, ups = ctx
        return _interp_residual_jac(interp, patches, row, pix, Jpix,
                                    scales[row], ups[row], corners[row])
    return residual_jac_fn


def _build_feature_reference_window_jac(model, interp_key):
    from ..util.jit_cache import interp_from_key
    from ..base.projection import project_with_jac
    interp = interp_from_key(interp_key)
    if interp.ncc_normalize:
        return None
    mixed = _is_mixed(model)
    if isinstance(model, tuple) and not mixed:
        model = model[0]

    def residual_jac_fn(qvec, tvec, cam, X, obs_slice, ctx):
        if mixed:
            window, corner, scale, ups, target, mi = obs_slice
            pix, Jpix = _switch_project_with_jac(model, mi, cam, qvec, tvec,
                                                 X)
        else:
            window, corner, scale, ups, target = obs_slice
            pix, Jp, Jc, Jx = project_with_jac(model, cam, qvec, tvec, X)
            Jpix = _jac_cat(Jp, Jc, Jx)
        f, J = _interp_residual_jac(interp, window[None], 0, pix, Jpix,
                                    scale, ups, corner)
        r = f.at[:target.shape[0]].add(-target) if interp.check_bounds \
            else f - target
        return r, J
    return residual_jac_fn


def _build_costmap_window_jac(model, interp_key):
    from ..util.jit_cache import interp_from_key
    from ..base.projection import project_with_jac
    interp = interp_from_key(interp_key)
    if interp.ncc_normalize:
        return None
    mixed = _is_mixed(model)
    if isinstance(model, tuple) and not mixed:
        model = model[0]

    def residual_jac_fn(qvec, tvec, cam, X, obs_slice, ctx):
        if mixed:
            window, corner, scale, ups, mi = obs_slice
            pix, Jpix = _switch_project_with_jac(model, mi, cam, qvec, tvec,
                                                 X)
        else:
            window, corner, scale, ups = obs_slice
            pix, Jp, Jc, Jx = project_with_jac(model, cam, qvec, tvec, X)
            Jpix = _jac_cat(Jp, Jc, Jx)
        return _interp_residual_jac(interp, window[None], 0, pix, Jpix,
                                    scale, ups, corner)
    return residual_jac_fn


_RESIDUAL_JAC_BUILDERS = {
    "geometric": _build_geometric_jac,
    "feature_reference": _build_feature_reference_jac,
    "feature_reference_window": _build_feature_reference_window_jac,
    "costmap": _build_costmap_jac,
    "costmap_window": _build_costmap_window_jac,
}

from functools import lru_cache


@lru_cache(maxsize=64)
def _compiled_ba_run(residual_key, loss_key, opts):
    from ..base.losses import RobustLoss
    from ..ops.schur import ba_solve as _ba_solve

    residual_fn = _RESIDUAL_BUILDERS[residual_key[0]](*residual_key[1:])
    jac_builder = _RESIDUAL_JAC_BUILDERS.get(residual_key[0])
    residual_jac_fn = jac_builder(*residual_key[1:]) if jac_builder else None
    loss = RobustLoss(loss_key[0], list(loss_key[1]))

    @jax.jit
    def run(state0, obs, ctx, pose_free, tvec_free, cam_free, point_free,
            lam0=None, max_iters=None):
        return _ba_solve(residual_fn, state0, obs, loss, pose_free,
                         tvec_free, cam_free, point_free, opts=opts, ctx=ctx,
                         residual_jac_fn=residual_jac_fn, lam0=lam0,
                         max_iters=max_iters)

    return run


class BundleAdjuster:
    default_conf = {
        "strategy": "feature_reference",
        "apply": True,
        "interpolation": interpolation_default_conf,
        "level_indices": None,
        "max_tracks_per_problem": 10,
        "num_threads": -1,
        "optimizer": {
            "loss": {"name": "cauchy", "params": [0.25]},
            "solver": {**solver_default_conf, "parameter_tolerance": 0.0,
                       "use_inner_iterations": True, "num_threads": -1},
            "print_summary": False,
            "refine_focal_length": True,
            "refine_principal_point": False,
            "refine_extra_params": True,
            "refine_extrinsics": True,
        },
        "references": {
            "loss": {"name": "cauchy", "params": [0.25]},
            "iters": 100,
            "keep_observations": False,
            "compute_offsets3D": False,
            "num_threads": -1,
        },
        "repeats": 1,
        # multi-chip: shard the observation axis (and its patch payload)
        # over the local device mesh. The one-knob analogue of the
        # reference's ``optimizer.num_threads``
        # (parallel_optimizer.h:70-216, doc/general.md:109-113);
        # n_devices=None uses every local device.
        "parallel": {"enabled": False, "n_devices": None},
    }

    def __init__(self, conf=None):
        self.conf = merge(self.default_conf, conf or {})

    @classmethod
    def create(cls, conf=None):
        strategy_to_solver = {
            "feature_reference": FeatureReferenceBundleAdjuster,
            "costmaps": CostMapBundleAdjuster,
            "patch_warp": PatchWarpBundleAdjuster,
            "geometric": GeometricBundleAdjuster,
        }
        strategy = cls.default_conf["strategy"]
        if conf is not None and "strategy" in conf:
            strategy = conf["strategy"]
        return strategy_to_solver[strategy](conf)

    # -- shared -------------------------------------------------------------
    def _optimizer_flags(self):
        opt = self.conf.optimizer
        return dict(
            refine_focal_length=bool(opt.get("refine_focal_length", True)),
            refine_principal_point=bool(opt.get("refine_principal_point",
                                                False)),
            refine_extra_params=bool(opt.get("refine_extra_params", True)),
            refine_extrinsics=bool(opt.get("refine_extrinsics", True)),
        )

    def _ba_options(self, **overrides) -> BAOptions:
        return BAOptions.from_solver_conf(self.conf.optimizer.get("solver"),
                                          **overrides)

    def _parallel_mesh(self):
        """Device mesh when ``parallel.enabled`` and >1 device is available
        (else None). Routes every strategy's `_run_ba_cached` through
        SPMD-sharded observations — the public-pipeline multi-chip path."""
        par = self.conf.get("parallel") or {}
        if not par.get("enabled"):
            return None
        import jax as _jax
        n = par.get("n_devices") or len(_jax.devices())
        n = min(int(n), len(_jax.devices()))
        if n <= 1:
            return None
        from ..parallel import make_mesh
        return make_mesh(n)

    def _run_ba_cached(self, reconstruction: Reconstruction,
                       packed: PackedBA, residual_key, obs_data, ctx,
                       loss, opts: BAOptions, obs_valid=None,
                       src_idx=None) -> Dict:
        """Run BA through the cached compiled program with bucket padding.

        ``src_idx``: optional per-observation second pose block (patch-warp
        joint source poses — ops/schur BAObservations.src_idx)."""
        from ..util.jit_cache import bucket

        t0 = time.time()
        mesh = self._parallel_mesh()
        ndev = int(mesh.devices.size) if mesh is not None else 1
        O = len(packed.obs_img)
        Np = len(packed.point_ids)
        if O == 0 or Np == 0:
            # nothing to optimize (e.g. an empty triangulation): no-op
            # success, like the reference's SetUp over zero residual blocks
            logger.info("BA: empty problem (no observations); skipping.")
            return dict(initial_cost=0.0, final_cost=0.0, iterations=0,
                        time=time.time() - t0)
        O_pad = bucket(O + 1)          # always >=1 padded obs slot (pair pad)
        if ndev > 1:                   # shardable obs axis
            O_pad = -(-O_pad // ndev) * ndev
        Np_pad = bucket(Np, minimum=4)

        def pad_to(a, n, fill=0):
            a = np.asarray(a)
            if len(a) >= n:
                return a
            return np.concatenate(
                [a, np.full((n - len(a),) + a.shape[1:], fill, a.dtype)])

        # solver-by-size switch (reference bundle_optimizer.h:180-191): dense
        # Schur for small camera systems, matrix-free PCG beyond. Measured on
        # v5e (80k obs / 3.2M pairs): the dense pair reduction costs ~1s per
        # million pairs per LM iteration while the inexact-Newton CG path
        # (loose forcing tolerance, one-hot segment reductions) costs ~23ms
        # and reaches the same final cost — so dense only pays off for small
        # pair lists where its exact steps can save LM iterations.
        M = 6 * len(packed.image_ids) + packed.cams.size
        track_lens = np.bincount(packed.obs_pt, minlength=max(Np, 1))
        n_pairs = int(np.sum(track_lens.astype(np.int64) ** 2))
        if opts.linear_solver == "dense" and (M > 1500 or n_pairs > 20_000):
            import dataclasses
            opts = dataclasses.replace(opts, linear_solver="cg")
        if opts.linear_solver == "cg":
            pair_o1 = pair_o2 = np.zeros(4, np.int32) + O  # unused by CG
        else:
            pair_o1, pair_o2 = make_pair_list(packed.obs_pt, Np)
        Q_pad = bucket(len(pair_o1), minimum=4)
        if ndev > 1:
            Q_pad = -(-Q_pad // ndev) * ndev
        pair_o1 = pad_to(pair_o1, Q_pad, O)   # pad pairs -> invalid obs slot
        pair_o2 = pad_to(pair_o2, Q_pad, O)

        # large-Np regime: past the point-side one-hot budget, prefer the
        # point-major GRID obs ordering (slot = point*T + rank, exactly
        # Np_pad*T slots): point reductions become reshape-sums and
        # point->obs broadcasts become reshapes — no gathers at all in the
        # CG hot loop (the [Np, T]-table fallback pays ~10 GB/s lane-axis
        # gathers on TPU). Fall back to the table when the grid would
        # inflate the obs axis (long tracks) or not tile the obs chunks.
        from ..ops.schur import _ONEHOT_BUDGET, make_point_major
        pt_slot = None
        grid_src = None
        T_max = int(track_lens.max(initial=1))
        T_b = max(1 << int(np.ceil(np.log2(max(T_max, 1)))), 4)
        large_pts = Np_pad * opts.obs_chunk > _ONEHOT_BUDGET
        O_grid = Np_pad * T_b
        if (ndev == 1 and src_idx is None and opts.linear_solver == "cg"
                and large_pts
                and O_grid <= 2 * O_pad and O_grid % opts.obs_chunk == 0):
            import dataclasses
            order = np.argsort(packed.obs_pt, kind="stable")
            sorted_pts = np.asarray(packed.obs_pt)[order]
            starts = np.searchsorted(sorted_pts, np.arange(Np_pad),
                                     side="left")
            slot = sorted_pts * T_b + (np.arange(O) - starts[sorted_pts])
            grid_src = np.zeros(O_grid, np.int64)   # holes copy obs 0
            grid_valid = np.zeros(O_grid, bool)
            real_valid = (np.ones(O, bool) if obs_valid is None
                          else np.asarray(obs_valid, bool))
            grid_src[slot] = order
            grid_valid[slot] = real_valid[order]
            opts = dataclasses.replace(opts, obs_grid_T=T_b)
            O_pad = O_grid
        elif ndev == 1 and src_idx is None and large_pts \
                and Np_pad * T_b <= 4 * O_pad:
            pt_slot = jnp.asarray(
                make_point_major(packed.obs_pt, Np_pad, O_pad))
        # image axis: the CG matvec reduces over the FULL observation axis,
        # so its one-hot budget is I * O_pad (not chunked). The grid/
        # transposed regime uses fused one-hot matmuls instead of a table.
        img_slot = None
        n_img = len(packed.image_ids)
        img_lens = np.bincount(packed.obs_img, minlength=max(n_img, 1))
        Ti = int(img_lens.max(initial=1))
        Ti_b = max(1 << int(np.ceil(np.log2(max(Ti, 1)))), 4)
        if (ndev == 1 and grid_src is None and n_img * O_pad > _ONEHOT_BUDGET
                and n_img * Ti_b <= 4 * O_pad):
            img_slot = jnp.asarray(
                make_point_major(packed.obs_img, n_img, O_pad))

        if grid_src is None:
            valid = np.zeros(O_pad, bool)
            valid[:O] = (True if obs_valid is None
                         else np.asarray(obs_valid, bool))

            def prep(a):
                return pad_to(a, O_pad)
        else:
            valid = grid_valid

            def prep(a):
                return np.asarray(a)[grid_src]
        obs = BAObservations(
            img_idx=jnp.asarray(prep(packed.obs_img)),
            cam_idx=jnp.asarray(prep(packed.obs_cam)),
            pt_idx=(jnp.asarray(prep(packed.obs_pt)) if grid_src is None
                    else jnp.asarray((np.arange(O_grid) // T_b)
                                     .astype(np.int32))),
            obs_data=jax.tree_util.tree_map(
                lambda a: jnp.asarray(prep(a)), obs_data),
            valid=jnp.asarray(valid),
            pair_o1=jnp.asarray(pair_o1), pair_o2=jnp.asarray(pair_o2),
            pt_slot=pt_slot, img_slot=img_slot,
            src_idx=None if src_idx is None
            else jnp.asarray(prep(np.asarray(src_idx, np.int32))))
        xyz = pad_to(packed.xyz, Np_pad).astype(np.float32)
        xyz[Np:] = [0.0, 0.0, 10.0]  # padded points safely in front
        state0 = BAState(jnp.asarray(packed.qvec), jnp.asarray(packed.tvec),
                         jnp.asarray(packed.cams), jnp.asarray(xyz))

        if mesh is not None:
            # multi-chip placement: observations (+ their payload, incl.
            # patch windows in the *_window residuals) shard over the mesh;
            # parameters/ctx stay replicated. XLA SPMD turns the normal-
            # equation segment reductions into ICI psums (SURVEY.md 2.9).
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P
            _shard = NamedSharding(mesh, _P(mesh.axis_names[0]))
            _repl = NamedSharding(mesh, _P())

            def _put_s(a):
                return jax.device_put(a, _shard)

            obs = obs._replace(
                img_idx=_put_s(obs.img_idx), cam_idx=_put_s(obs.cam_idx),
                pt_idx=_put_s(obs.pt_idx),
                obs_data=jax.tree_util.tree_map(_put_s, obs.obs_data),
                valid=_put_s(obs.valid),
                pair_o1=_put_s(obs.pair_o1), pair_o2=_put_s(obs.pair_o2),
                src_idx=None if obs.src_idx is None
                else _put_s(obs.src_idx))
            state0 = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, _repl), state0)
            ctx = jax.tree_util.tree_map(
                lambda a: jax.device_put(jnp.asarray(a), _repl), ctx)
            logger.info("BA: sharding %d observations over %d devices.",
                        O, ndev)

        # a-priori memory estimate (reference NumNonZerosJacobian warning,
        # bundle_optimizer.h:200-208): the per-chunk Jacobian intermediate is
        # [obs_chunk, C, 9+k] f32 plus the gathered patches
        k = packed.cams.shape[1]
        C_est = (np.asarray(obs_data[1]).shape[-1]
                 if isinstance(obs_data, tuple) and len(obs_data) > 1
                 and hasattr(obs_data[1], "shape") else 2)
        jac_bytes = min(O_pad, opts.obs_chunk) * C_est * (9 + k) * 4
        if jac_bytes > 2 * 2 ** 30:
            logger.warning(
                "BA: per-chunk Jacobian intermediate ~%.1f GB; reduce "
                "obs_chunk (currently %d).", jac_bytes / 2 ** 30,
                opts.obs_chunk)

        free_args = (jnp.asarray(packed.pose_free),
                     jnp.asarray(packed.tvec_free),
                     jnp.asarray(packed.cam_free),
                     jnp.asarray(pad_to(packed.point_free, Np_pad, False)))
        seg = int(opts.segment_iterations)
        if seg <= 0:
            run = _compiled_ba_run(residual_key,
                                   (loss.name, tuple(loss.params)), opts)
            state, summary = run(state0, obs, ctx, *free_args)
            out = {k: float(v) for k, v in summary.items()
                   if k not in ("lam", "done")}
        else:
            # segmented dispatch: re-enter the compiled LM loop every `seg`
            # iterations with warm-restarted damping. Progress is reported
            # and Ctrl-C lands between segments with the best-so-far state
            # kept (reference PyInterruptCallback semantics,
            # base/src/callbacks.h:10-37).
            import dataclasses
            seg_opts = dataclasses.replace(opts, max_iterations=seg)
            run = _compiled_ba_run(residual_key,
                                   (loss.name, tuple(loss.params)), seg_opts)
            state = state0
            lam = jnp.asarray(opts.initial_lambda, jnp.float32)
            out = {}
            iters_total = 0
            interrupted = False
            try:
                while iters_total < opts.max_iterations:
                    cap = min(seg, opts.max_iterations - iters_total)
                    state_n, summary = run(state, obs, ctx, *free_args,
                                           lam0=lam,
                                           max_iters=jnp.asarray(
                                               cap, jnp.int32))
                    s = {k: float(v) for k, v in summary.items()}
                    state = state_n
                    lam = summary["lam"]
                    iters_total += int(s["iterations"])
                    out.setdefault("initial_cost", s["initial_cost"])
                    out["final_cost"] = s["final_cost"]
                    logger.info("BA progress: cost %.6g (%d/%d iterations)",
                                s["final_cost"], iters_total,
                                opts.max_iterations)
                    if s["done"] or int(s["iterations"]) < cap:
                        break
            except KeyboardInterrupt:
                interrupted = True
                logger.warning("BA interrupted; keeping the state of the "
                               "last completed segment (%d iterations).",
                               iters_total)
            out.setdefault("initial_cost", float("nan"))
            out.setdefault("final_cost", out["initial_cost"])
            out["iterations"] = iters_total
            out["interrupted"] = interrupted
        packed.unpack_into(reconstruction, np.asarray(state.qvec),
                           np.asarray(state.tvec), np.asarray(state.cams),
                           np.asarray(state.xyz)[:Np])
        out["time"] = time.time() - t0
        logger.info("BA Time: %.3fs, cost change: %.6g --> %.6g (%d iters)",
                    out["time"], out["initial_cost"], out["final_cost"],
                    int(out["iterations"]))
        self._maybe_print_summary(out, packed)
        return out

    def _maybe_print_summary(self, out, packed):
        if not self.conf.optimizer.get("print_summary"):
            return
        logger.info(
            "BA summary:\n  images: %d (cameras: %d)\n  points: %d\n"
            "  observations: %d\n  initial cost: %.6g\n  final cost: %.6g\n"
            "  cost change: %.3f%%\n  iterations: %d\n  wall time: %.3fs",
            len(packed.image_ids), len(packed.camera_ids),
            len(packed.point_ids), len(packed.obs_img),
            out["initial_cost"], out["final_cost"],
            100.0 * (out["initial_cost"] - out["final_cost"])
            / max(out["initial_cost"], 1e-12),
            int(out["iterations"]), out["time"])

    def _run_ba(self, reconstruction: Reconstruction, packed: PackedBA,
                residual_fn, obs_data, loss, opts: BAOptions,
                pair_arrays=None, src_idx=None) -> Dict:
        t0 = time.time()
        O = len(packed.obs_img)
        if O == 0 or len(packed.point_ids) == 0:
            logger.info("BA: empty problem (no observations); skipping.")
            return dict(initial_cost=0.0, final_cost=0.0, iterations=0,
                        time=time.time() - t0)
        if pair_arrays is None:
            pair_arrays = make_pair_list(packed.obs_pt, len(packed.point_ids))
        obs = BAObservations(
            img_idx=jnp.asarray(packed.obs_img),
            cam_idx=jnp.asarray(packed.obs_cam),
            pt_idx=jnp.asarray(packed.obs_pt),
            obs_data=obs_data,
            valid=jnp.ones((O,), bool),
            pair_o1=jnp.asarray(pair_arrays[0]),
            pair_o2=jnp.asarray(pair_arrays[1]),
            src_idx=None if src_idx is None
            else jnp.asarray(src_idx, jnp.int32))
        state0 = BAState(jnp.asarray(packed.qvec), jnp.asarray(packed.tvec),
                         jnp.asarray(packed.cams), jnp.asarray(packed.xyz))
        state, summary = ba_solve(
            residual_fn, state0, obs, loss,
            pose_free=jnp.asarray(packed.pose_free),
            tvec_free=jnp.asarray(packed.tvec_free),
            cam_free=jnp.asarray(packed.cam_free),
            point_free=jnp.asarray(packed.point_free), opts=opts)
        packed.unpack_into(reconstruction, np.asarray(state.qvec),
                           np.asarray(state.tvec), np.asarray(state.cams),
                           np.asarray(state.xyz))
        out = {k: float(v) for k, v in summary.items()}
        out["time"] = time.time() - t0
        logger.info("BA Time: %.3fs, cost change: %.6g --> %.6g (%d iters)",
                    out["time"], out["initial_cost"], out["final_cost"],
                    int(out["iterations"]))
        self._maybe_print_summary(out, packed)
        return out

    def refine(self, reconstruction: Reconstruction, *args, **kwargs) -> Dict:
        raise NotImplementedError

    def refine_multilevel(self, reconstruction, feature_manager,
                          problem_setup=None) -> Dict:
        level_indices = self.conf.get("level_indices")
        levels = (level_indices if level_indices not in (None, "all")
                  else list(reversed(range(feature_manager.num_levels))))
        outputs: Dict[str, list] = {}
        for _ in range(int(self.conf.get("repeats", 1))):
            for level in levels:
                out = self.refine(reconstruction,
                                  feature_manager.fset(level),
                                  problem_setup=problem_setup)
                for k, v in out.items():
                    outputs.setdefault(k, []).append(v)
        return outputs


class GeometricBundleAdjuster(BundleAdjuster):
    """Reprojection-error BA (reference: geometric_bundle_optimizer.h:12-88 +
    ba/main.py geometric strategy). Loss default trivial like COLMAP."""

    default_conf = deepcopy(BundleAdjuster.default_conf)
    default_conf["strategy"] = "geometric"
    default_conf["optimizer"]["loss"] = {"name": "trivial", "params": []}

    def refine(self, reconstruction: Reconstruction, feature_set=None,
               problem_setup=None) -> Dict:
        flags = self._optimizer_flags()
        packed = pack_ba_problem(reconstruction, problem_setup, **flags)
        loss = make_loss(self.conf.optimizer.get("loss"))
        opts = self._ba_options()
        if len(packed.cam_models) > 1:
            obs_data = (np.asarray(packed.obs_xy, np.float32),
                        packed.cam_model_idx[packed.obs_cam])
            key = ("geometric", packed.cam_models)
        else:
            obs_data = np.asarray(packed.obs_xy, np.float32)
            key = ("geometric", packed.cam_model)
        return self._run_ba_cached(reconstruction, packed, key,
                                   obs_data, (), loss, opts)

    # geometric BA needs no features
    def refine_multilevel(self, reconstruction, feature_manager=None,
                          problem_setup=None) -> Dict:
        out = self.refine(reconstruction, None, problem_setup=problem_setup)
        return {k: [v] for k, v in out.items()}


class FeatureReferenceBundleAdjuster(BundleAdjuster):
    """Featuremetric BA toward per-track robust references (reference:
    feature_reference_bundle_optimizer.h:21-149, ba/main.py:105-154)."""

    default_conf = deepcopy(BundleAdjuster.default_conf)
    default_conf["strategy"] = "feature_reference"

    def refine(self, reconstruction: Reconstruction, feature_set,
               problem_setup=None, references=None) -> Dict:
        from .references import extract_references

        flags = self._optimizer_flags()
        packed = pack_ba_problem(reconstruction, problem_setup, **flags)
        # mixed camera models: per-observation lax.switch projection (same
        # mechanism as the geometric strategy); homogeneous scenes keep the
        # single static model
        mixed = len(packed.cam_models) > 1
        model = packed.cam_models if mixed else packed.cam_model
        interp = InterpolationConfig.from_conf(self.conf.get("interpolation"))
        loss = make_loss(self.conf.optimizer.get("loss"))
        opts = self._ba_options()

        view = FeatureView.from_reconstruction(feature_set, reconstruction,
                                               packed.point_ids)
        pf = view.packed

        if references is None:
            _mesh = self._parallel_mesh()
            _sh = None
            if _mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as _P
                _sh = NamedSharding(_mesh, _P(_mesh.axis_names[0]))
            references = extract_references(
                reconstruction, feature_set, view, self.conf.references,
                interp, point3D_ids=packed.point_ids, sharding=_sh)

        # per-observation patch + target descriptor arrays; observations
        # without an extracted patch or a reference get weight 0
        O = len(packed.obs_img)
        rows = np.zeros(O, np.int32)
        obs_valid = np.ones(O, bool)
        pids_of_obs = np.asarray(packed.point_ids)[packed.obs_pt] if O \
            else np.zeros(0, np.int64)
        C_ref = len(next(iter(references.values())).descriptor) \
            if references else 1
        targets = np.zeros((O, C_ref), np.float32)
        for i in range(O):
            name = reconstruction.images[int(packed.obs_image_id[i])].name
            row = pf.row_or(name, int(packed.obs_p2D_idx[i]))
            ref = references.get(int(pids_of_obs[i]))
            if row < 0 or ref is None:
                obs_valid[i] = False
                continue
            rows[i] = row
            targets[i] = ref.descriptor
        if not obs_valid.all():
            logger.warning("feature_reference BA: %d/%d observations have no "
                           "patch/reference; excluded.",
                           int((~obs_valid).sum()), O)

        from ..util.jit_cache import interp_static_key

        if self._parallel_mesh() is not None:
            # multi-chip payload layout: each observation carries its own
            # patch window in obs_data, so the feature payload shards over
            # the mesh with the observations (each chip's HBM holds only its
            # shard — the Aachen-scale story, reference README.md:291).
            windows = np.asarray(pf.patches)[rows].astype(np.float32)
            obs_data = (windows,
                        pf.corners[rows].astype(np.float32),
                        pf.scales[rows].astype(np.float32),
                        pf.upsampling[rows].astype(np.float32),
                        targets)
            if mixed:
                mi = packed.cam_model_idx[packed.obs_cam].astype(np.int32)
                obs_data = obs_data + (mi,)
            return self._run_ba_cached(
                reconstruction, packed,
                ("feature_reference_window", model, interp_static_key(interp)),
                obs_data, (), loss, opts, obs_valid=obs_valid)

        ctx = (jnp.asarray(pf.patches),
               jnp.asarray(pf.corners.astype(np.float32)),
               jnp.asarray(pf.scales.astype(np.float32)),
               jnp.asarray(pf.upsampling.astype(np.float32)))
        if mixed:
            mi = packed.cam_model_idx[packed.obs_cam].astype(np.int32)
            obs_data = (rows, targets, mi)
        else:
            obs_data = (rows, targets)
        return self._run_ba_cached(
            reconstruction, packed,
            ("feature_reference", model, interp_static_key(interp)),
            obs_data, ctx, loss, opts, obs_valid=obs_valid)


class CostMapBundleAdjuster(BundleAdjuster):
    """BA over precomputed costmaps (reference: costmap_bundle_optimizer.h:17-132).
    Implemented in costmaps.py; this class wires extraction + solve."""

    default_conf = deepcopy(BundleAdjuster.default_conf)
    default_conf["strategy"] = "costmaps"
    default_conf["costmaps"] = {
        "loss": {"name": "cauchy", "params": [0.25]},
        "as_gradientfield": True,
        "compute_cross_derivative": False,
        "num_threads": -1,
        "dense_cut_size": 100,
        "upsampling_factor": 1,
    }

    def refine(self, reconstruction: Reconstruction, feature_set,
               problem_setup=None) -> Dict:
        from .costmaps import costmap_ba
        return costmap_ba(self, reconstruction, feature_set, problem_setup)


class PatchWarpBundleAdjuster(BundleAdjuster):
    """Patch-warping BA (reference: patch_warp_bundle_optimizer.h:21-61).
    Implemented in patch_warp.py."""

    default_conf = deepcopy(BundleAdjuster.default_conf)
    default_conf["strategy"] = "patch_warp"
    default_conf["interpolation"] = {
        "nodes": [[float(dx), float(dy)] for dy in (-1.5, -0.5, 0.5, 1.5)
                  for dx in (-1.5, -0.5, 0.5, 1.5)],
        "mode": "BICUBIC", "l2_normalize": False, "ncc_normalize": True,
    }
    default_conf["optimizer"]["regularize_source"] = {"n_nodes": 0}
    # joint source-pose optimization (second pose block per observation in
    # the Schur structure); only active when refine_extrinsics is on
    default_conf["optimizer"]["optimize_source_poses"] = True

    def refine(self, reconstruction: Reconstruction, feature_set,
               problem_setup=None) -> Dict:
        from .patch_warp import patch_warp_ba
        return patch_warp_ba(self, reconstruction, feature_set, problem_setup)
