"""Costmap extraction + costmap BA (reference:
pixsfm/bundle_adjustment/src/costmap_extractor.h:39-435 and
costmap_bundle_optimizer.h:17-132).

Costmaps shrink the BA residual from C=128 to 1 and let the dense features be freed
after extraction (low-memory strategy, reference README "costmaps"). Per observation,
the cost patch stores ``(cost, dcost/dr, dcost/dc[, dcost/drdc])`` where
``cost = 0.5 * rho(||f - ref||^2)`` over the feature patch, with derivatives via
central differences of the (optionally L2-normalized) feature channels dotted with
the residual (costmap_extractor.h:252-321).

TPU design: the whole extraction is a single batched elementwise program over
``[O, ps, ps, C]`` patches — no loops, no gathers. Costmap BA then runs the standard
Schur LM with a 1-D gradient-field residual (POLYGRADIENTFIELD interpolation,
l2_normalize=False — reference ba/main.py:269-275).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..base.interpolation import InterpolationConfig
from ..base.losses import RobustLoss, make_loss
from ..features.featuremaps import (FeatureMap, FeaturePatch, FeatureSet,
                                    FeatureView)
from ..sfm.model import Reconstruction
from .problem import pack_ba_problem
from .references import extract_references

__all__ = ["extract_costmaps", "costmap_ba"]


def _costmap_kernel(patches, refs, loss: RobustLoss, l2_normalize: bool,
                    compute_cross: bool):
    """patches [O, ps, ps, C] (storage dtype), refs [O, C] -> [O, ps, ps, 3|4].

    Fast path of the reference (scale==1: direct reads + central differences,
    costmap_extractor.h:252-279), batched over all observations at once.
    """
    f = patches.astype(jnp.float32)
    if l2_normalize:
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-20)

    # central differences with edge clamping (same padding as Grid2D clamp)
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dfdr = 0.5 * (fp[:, 2:, 1:-1] - fp[:, :-2, 1:-1])
    dfdc = 0.5 * (fp[:, 1:-1, 2:] - fp[:, 1:-1, :-2])

    res = f - refs[:, None, None, :]
    s = jnp.sum(res * res, axis=-1)
    cost = 0.5 * loss(s)
    w = loss.weight(s)
    rdotr = jnp.sum(res * dfdr, axis=-1)
    rdotc = jnp.sum(res * dfdc, axis=-1)
    dcostdr = w * rdotr
    dcostdc = w * rdotc
    small = cost <= 1e-8
    dcostdr = jnp.where(small, 0.0, dcostdr)
    dcostdc = jnp.where(small, 0.0, dcostdc)
    chans = [cost, dcostdr, dcostdc]
    if compute_cross:
        # analytic cross derivative (costmap_extractor rho[2] term):
        #   d2cost/drdc = rho''(s) * 2 (res.f_c)(res.f_r)
        #               + rho'(s) * (f_r.f_c + res.f_rc)
        # rho'' via forward-mode AD of the elementwise IRLS weight
        rho2 = jax.jvp(loss.weight, (s,), (jnp.ones_like(s),))[1]
        f_rc = 0.5 * (jnp.pad(dfdr, ((0, 0), (0, 0), (1, 1), (0, 0)),
                              mode="edge")[:, :, 2:]
                      - jnp.pad(dfdr, ((0, 0), (0, 0), (1, 1), (0, 0)),
                                mode="edge")[:, :, :-2])
        dcostdrc = (rho2 * 2.0 * rdotc * rdotr
                    + w * (jnp.sum(dfdr * dfdc, axis=-1)
                           + jnp.sum(res * f_rc, axis=-1)))
        dcostdrc = jnp.where(small, 0.0, dcostdrc)
        chans.append(dcostdrc)
    return jnp.stack(chans, axis=-1)


def _costmap_kernel_upsampled(patches, refs, loss: RobustLoss,
                              l2_normalize: bool, up: int):
    """General path (reference costmap_extractor.h:280-321): cost patch sampled
    at ``1/up`` pixel steps via bicubic interpolation of the feature patch, with
    dcost/dr = rho' * (residual . dfdr) from interpolated feature gradients."""
    from ..base.interpolation import interpolate_with_grad

    cfg = InterpolationConfig(mode="BICUBIC", l2_normalize=l2_normalize)
    O, ps, _, C = patches.shape
    out = ps * up
    ys = (jnp.arange(out, dtype=jnp.float32)) / up
    xs = (jnp.arange(out, dtype=jnp.float32)) / up

    def per_patch(patch, ref):
        def per_row(y):
            def per_px(x):
                f, dfdr, dfdc = interpolate_with_grad(patch, y, x, cfg)
                res = f - ref
                s = jnp.sum(res * res)
                cost = 0.5 * loss(s)
                w = loss.weight(s)
                small = cost <= 1e-8
                dr = jnp.where(small, 0.0, w * jnp.dot(res, dfdr))
                dc = jnp.where(small, 0.0, w * jnp.dot(res, dfdc))
                return jnp.stack([cost, dr, dc])
            return jax.vmap(per_px)(xs)
        return jax.vmap(per_row)(ys)

    return jax.vmap(per_patch)(patches.astype(jnp.float32), refs)


def extract_costmaps(reconstruction: Reconstruction, feature_set: FeatureSet,
                     conf, references_conf, interp: InterpolationConfig,
                     point3D_ids=None) -> Tuple[FeatureSet, Dict]:
    """Build a costmap FeatureSet (one cost patch per observation) and the
    references used. Runs reference extraction inline like the reference
    (costmap_extractor.h:186-189)."""
    t0 = time.time()
    get = conf.get if hasattr(conf, "get") else lambda k, d=None: d
    loss = make_loss(get("loss", {"name": "cauchy", "params": [0.25]}))
    compute_cross = bool(get("compute_cross_derivative", False))

    packed_ids = (sorted(reconstruction.points3D.keys())
                  if point3D_ids is None else list(point3D_ids))
    view = FeatureView.from_reconstruction(feature_set, reconstruction,
                                           packed_ids)
    refs = extract_references(reconstruction, feature_set, view,
                              references_conf, interp,
                              point3D_ids=packed_ids)

    pf = view.packed
    # per-observation rows + reference targets
    obs = []
    for pid in packed_ids:
        if pid not in refs:
            continue
        p3D = reconstruction.points3D[pid]
        for iid, p2D_idx in p3D.track:
            im = reconstruction.images[iid]
            row = pf.row_or(im.name, int(p2D_idx))
            if row < 0:   # observation was never extracted
                continue
            obs.append((row, pid, im.name, int(p2D_idx)))
    if not obs:
        return FeatureSet(3, feature_set.patch_size, "float32"), refs

    rows = np.asarray([o[0] for o in obs], np.int32)
    targets = np.stack([refs[o[1]].descriptor for o in obs]).astype(np.float32)

    up = int(get("upsampling_factor", 1) or 1)

    @jax.jit
    def run(patches, targets):
        if up > 1:
            return _costmap_kernel_upsampled(patches, targets, loss,
                                             interp.l2_normalize, up)
        return _costmap_kernel(patches, targets, loss, interp.l2_normalize,
                               compute_cross)

    cost_patches = np.asarray(run(jnp.asarray(pf.patches)[jnp.asarray(rows)],
                                  jnp.asarray(targets)))

    out_c = 4 if (compute_cross and up == 1) else 3
    cset = FeatureSet(out_c, feature_set.patch_size * up, "float32")
    for i, (row, pid, name, p2D_idx) in enumerate(obs):
        fmap = cset.maps.setdefault(name, FeatureMap(is_sparse=True))
        fmap.patches[p2D_idx] = FeaturePatch(
            cost_patches[i], pf.corners[row], pf.scales[row],
            float(pf.upsampling[row]) * up)
    logger.info("Costmap extraction: %.3fs (%d patches)", time.time() - t0,
                len(obs))
    return cset, refs


def costmap_ba(adjuster, reconstruction: Reconstruction,
               feature_set: FeatureSet, problem_setup=None) -> Dict:
    """Costmap BA strategy driver (reference: ba/main.py:243-286)."""
    conf = adjuster.conf
    interp_feat = InterpolationConfig.from_conf(conf.get("interpolation"))
    cm_conf = conf.get("costmaps", {})
    cset, refs = extract_costmaps(reconstruction, feature_set, cm_conf,
                                  conf.references, interp_feat)

    flags = adjuster._optimizer_flags()
    packed = pack_ba_problem(reconstruction, problem_setup, **flags)
    # mixed camera models: per-observation lax.switch projection (see
    # _build_costmap); homogeneous scenes keep the single static model
    mixed = len(packed.cam_models) > 1
    model = packed.cam_models if mixed else packed.cam_model
    loss = make_loss(conf.optimizer.get("loss"))
    opts = adjuster._ba_options()

    # costmap interpolation: gradient field, no normalization
    n_chan = cset.channels
    interp_cm = InterpolationConfig(
        mode="BICUBICGRADIENTFIELD" if n_chan == 4 else "POLYGRADIENTFIELD",
        l2_normalize=False)

    view = FeatureView(cset, _required_from_packed(reconstruction, packed))
    pf = view.packed
    O = len(packed.obs_img)
    rows = np.zeros(O, np.int32)
    obs_valid = np.ones(O, bool)
    for i in range(O):
        name = reconstruction.images[int(packed.obs_image_id[i])].name
        row = pf.row_or(name, int(packed.obs_p2D_idx[i]))
        if row < 0:   # no costmap (observation skipped at extraction)
            obs_valid[i] = False
        else:
            rows[i] = row

    from ..util.jit_cache import interp_static_key

    if adjuster._parallel_mesh() is not None:
        # multi-chip payload layout: each observation carries its own cost
        # patch in obs_data so the costmap payload shards over the mesh with
        # the observations (each chip's HBM holds only its shard) — same
        # layout as feature_reference_window
        windows = np.asarray(pf.patches)[rows].astype(np.float32)
        obs_data = (windows,
                    pf.corners[rows].astype(np.float32),
                    pf.scales[rows].astype(np.float32),
                    pf.upsampling[rows].astype(np.float32))
        if mixed:
            obs_data = obs_data + (
                packed.cam_model_idx[packed.obs_cam].astype(np.int32),)
        return adjuster._run_ba_cached(
            reconstruction, packed,
            ("costmap_window", model, interp_static_key(interp_cm)),
            obs_data, (), loss, opts, obs_valid=obs_valid)

    ctx = (jnp.asarray(pf.patches),
           jnp.asarray(pf.corners.astype(np.float32)),
           jnp.asarray(pf.scales.astype(np.float32)),
           jnp.asarray(pf.upsampling.astype(np.float32)))
    obs_data = ((rows, packed.cam_model_idx[packed.obs_cam].astype(np.int32))
                if mixed else rows)
    return adjuster._run_ba_cached(
        reconstruction, packed,
        ("costmap", model, interp_static_key(interp_cm)),
        obs_data, ctx, loss, opts, obs_valid=obs_valid)


def _required_from_packed(reconstruction, packed) -> Dict[str, list]:
    req: Dict[str, list] = {}
    for i in range(len(packed.obs_img)):
        name = reconstruction.images[int(packed.obs_image_id[i])].name
        req.setdefault(name, []).append(int(packed.obs_p2D_idx[i]))
    return req
