"""Patch-warp (photometric) BA (reference:
pixsfm/residuals/src/featuremetric.h:77-188 + patch_warp_bundle_optimizer.h:21-61).

Residual per observation: project the 3D point into the *source* view (the track's
reference observation), offset the interpolation nodes in source pixel space, lift
each node to 3D at the source depth (fronto-parallel assumption,
``PixelToWorld``), reproject the lifted nodes into the *target* view, interpolate
the target patch at the warped nodes (NCC-normalized across nodes for photometric
use) and subtract the source/reference node descriptors.

Two coupling modes:

- **joint** (default when ``refine_extrinsics`` is on): the source pose is a
  second optimized parameter block per observation (``BAObservations.src_idx``)
  — the Schur solver carries the full img<->src<->intrinsics cross terms, like
  the reference's single Ceres cost functor over both poses
  (patch_warp_bundle_optimizer.h:21-61). Disable with
  ``optimizer.optimize_source_poses: false``.
- **constant source**: source pose/intrinsics enter as per-observation
  constants. Exact for the shipped ``photometric`` preset
  (``refine_extrinsics: false``, configs/photometric.yaml).

Source *intrinsics* are constants in both modes (the reference also keeps the
source camera's intrinsics fixed inside the warp).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..base.cameras import cam_from_img, img_from_cam
from ..base.geometry import apply_pose, quat_conj, quat_normalize, quat_rotate
from ..base.interpolation import (InterpolationConfig, bounds_violation,
                                  interpolate,
                                  interpolate_residual,
                                  ncc_normalize)
from ..base.losses import make_loss
from ..features.featuremaps import FeatureView
from ..sfm.model import Reconstruction
from .problem import pack_ba_problem
from .references import extract_references

__all__ = ["patch_warp_ba", "build_patch_warp_residual"]


def _make_model_dispatch(model):
    """(models tuple | single model) -> (_ifc, _cfi) projection dispatchers
    (mixed scenes switch per-observation with lax.switch; static otherwise)."""
    models = model if isinstance(model, tuple) else (model,)
    mixed = len(models) > 1
    single = models[0]
    if mixed:
        def _ifc(mi, cam_, uv):
            return jax.lax.switch(
                mi, [(lambda m: lambda a: img_from_cam(m, a[0], a[1]))(m)
                     for m in models], (cam_, uv))

        def _cfi(mi, cam_, xy):
            return jax.lax.switch(
                mi, [(lambda m: lambda a: cam_from_img(m, a[0], a[1]))(m)
                     for m in models], (cam_, xy))
    else:
        def _ifc(mi, cam_, uv):
            return img_from_cam(single, cam_, uv)

        def _cfi(mi, cam_, xy):
            return cam_from_img(single, cam_, xy)
    return _ifc, _cfi


def build_patch_warp_residual(model, interp_key, joint: bool):
    """Cacheable patch-warp residual builder for the compiled-BA registry
    (main._RESIDUAL_BUILDERS["patch_warp"]). The TARGET patch window travels
    per observation in ``obs_data`` (like feature_reference_window) so the
    photometric payload shards over the device mesh with the observations;
    everything else the warp needs (source pose/camera/scale, reference
    node descriptors, model indices) is per-observation data too — ``ctx``
    stays empty and the jitted program is cached per
    ``(model, interp_key, joint)``.

    ``joint``: the source pose is a second optimized block delivered by the
    solver (``BAObservations.src_idx``; reference couples both poses in one
    Ceres functor, patch_warp_bundle_optimizer.h:21-61); otherwise the
    source pose rides in ``obs_data`` as constants."""
    from ..util.jit_cache import interp_from_key

    interp = interp_from_key(interp_key)
    nodes = jnp.asarray(interp.nodes_array())        # [n_nodes, 2] (dx, dy)
    _ifc, _cfi = _make_model_dispatch(model)
    interp_single = InterpolationConfig(
        mode=interp.mode, l2_normalize=interp.l2_normalize,
        ncc_normalize=False, nodes=[[0.0, 0.0]])

    def warp_residual(qvec, tvec, cam, sq, st, scam, sscale, window, corner,
                      scale, ups, target, v, X, tmi, smi):
        """Source-node lift at source depth -> target patch window.

        Operand-level sanitization: bucket padding zero-fills the per-obs
        payload, and this residual (unlike the gather-only window residuals)
        DIVIDES by source scale / depth and normalizes the source quaternion
        — a padded row would produce NaN that the w=0 mask cannot absorb
        (NaN*0=NaN through the loss). Degenerate operands are replaced by
        finite dummies; real observations take the true branch, so gradients
        are untouched."""
        sq = jnp.where(jnp.sum(sq * sq) > 1e-12, sq,
                       jnp.asarray([1.0, 0.0, 0.0, 0.0], sq.dtype))
        # zero-padded source camera: unit-focal pinhole dummy (cam_from_img
        # divides by the focal)
        scam = jnp.where(jnp.abs(scam[0]) > 1e-8, scam,
                         jnp.zeros_like(scam).at[0].set(1.0))
        sscale = jnp.where(jnp.abs(sscale) > 1e-8, sscale, 1.0)
        scale = jnp.where(jnp.abs(scale) > 1e-8, scale, 1.0)
        ups = jnp.where(jnp.abs(ups) > 1e-8, ups, 1.0)
        x_src = apply_pose(sq, st, X)
        depth = jnp.where(jnp.abs(x_src[2]) > 1e-6, x_src[2], 1.0)
        uv_s = x_src[:2] / depth
        xy_s = _ifc(smi, scam, uv_s)

        def warp_node(node):
            xy_n = xy_s + node / sscale
            uvn = _cfi(smi, scam, xy_n)
            x_cam_n = jnp.concatenate([uvn * depth, depth[None]])
            qinv = quat_conj(quat_normalize(sq))
            Xn = quat_rotate(qinv, x_cam_n - st)
            x_t = apply_pose(qvec, tvec, Xn)
            zt = jnp.where(jnp.abs(x_t[2]) > 1e-6, x_t[2], 1.0)
            xy_t = _ifc(tmi, cam, x_t[:2] / zt)
            pc = (xy_t * scale - 0.5 - corner) * ups
            f_n = interpolate_residual(window[None], 0, pc[1], pc[0],
                                       interp_single)
            viol = bounds_violation(pc[1], pc[0], window.shape[0],
                                    window.shape[1])
            return f_n, viol

        f, viol = jax.vmap(warp_node)(nodes)    # [n_nodes, C], [n_nodes]
        if interp.ncc_normalize:
            f = ncc_normalize(f)
        r = f.reshape(-1) - target
        if interp.check_bounds:
            # reference semantics: ALL warped nodes must stay inside the
            # patch (patch_interpolator.h EvaluateNNodes is_inside &= per
            # node); the total violation joins the residual so boundary-
            # crossing steps cost more and get rejected
            r = jnp.concatenate([r, jnp.sum(viol)[None]])
        return r * v

    if joint:
        def residual_fn(qvec, tvec, src_qvec, src_tvec, cam, X, obs_slice,
                        ctx):
            (window, corner, scale, ups, scam, sscale, target, v, tmi,
             smi) = obs_slice
            return warp_residual(qvec, tvec, cam, src_qvec, src_tvec, scam,
                                 sscale, window, corner, scale, ups, target,
                                 v, X, tmi, smi)
    else:
        def residual_fn(qvec, tvec, cam, X, obs_slice, ctx):
            (window, corner, scale, ups, sq, st, scam, sscale, target, v,
             tmi, smi) = obs_slice
            return warp_residual(qvec, tvec, cam, sq, st, scam, sscale,
                                 window, corner, scale, ups, target, v, X,
                                 tmi, smi)
    return residual_fn


def patch_warp_ba(adjuster, reconstruction: Reconstruction, feature_set,
                  problem_setup=None) -> Dict:
    conf = adjuster.conf
    interp = InterpolationConfig.from_conf(conf.get("interpolation"))
    if interp.n_nodes < 2:
        raise ValueError("patch_warp BA needs n_nodes > 1 interpolation nodes")
    loss = make_loss(conf.optimizer.get("loss"))
    opts = adjuster._ba_options()
    flags = adjuster._optimizer_flags()
    joint_src = bool(conf.optimizer.get("optimize_source_poses", True)) \
        and flags["refine_extrinsics"]

    packed = pack_ba_problem(reconstruction, problem_setup, **flags)
    # mixed camera models: the warp projects through BOTH the source and the
    # target camera, so each observation carries two model indices and every
    # projection op dispatches with lax.switch (static per-model code)
    models = packed.cam_models
    mixed = len(models) > 1
    model = packed.cam_model
    slot_of_image = {int(iid): s for s, iid in enumerate(packed.image_ids)}
    cam_slot = {int(c): s for s, c in enumerate(packed.camera_ids)}

    view = FeatureView.from_reconstruction(feature_set, reconstruction,
                                           packed.point_ids)
    pf = view.packed

    ref_conf = dict(conf.references.to_dict()
                    if hasattr(conf.references, "to_dict")
                    else conf.references)
    refs = extract_references(reconstruction, feature_set, view, ref_conf,
                              interp, point3D_ids=packed.point_ids)

    # per-observation target patch + constant source data
    O = len(packed.obs_img)
    rows = np.zeros(O, np.int32)
    src_q = np.tile(np.array([1, 0, 0, 0], np.float32), (O, 1))
    src_t = np.zeros((O, 3), np.float32)
    src_cam = packed.cams[packed.obs_cam].astype(np.float32).copy()
    src_scale = np.ones((O, 2), np.float32)
    src_idx = np.zeros(O, np.int32)
    tgt_mi = packed.cam_model_idx[packed.obs_cam].astype(np.int32)
    src_mi = tgt_mi.copy()
    targets = np.zeros((O, interp.n_nodes * pf.channels), np.float32)
    valid = np.zeros(O, bool)
    for i in range(O):
        iid = int(packed.obs_image_id[i])
        pid = packed.point_ids[int(packed.obs_pt[i])]
        ref = refs.get(pid)
        if ref is None:
            continue
        im = reconstruction.images[iid]
        row = pf.row_or(im.name, int(packed.obs_p2D_idx[i]))
        if row < 0:   # observation was never extracted
            continue
        rows[i] = row
        s_iid, s_p2D = ref.source
        s_im = reconstruction.images[s_iid]
        s_cam = reconstruction.cameras[s_im.camera_id]
        src_q[i] = s_im.qvec
        src_t[i] = s_im.tvec
        # source params may be narrower than the padded width (mixed models)
        s_params = np.asarray(s_cam.params, np.float32)
        src_cam[i] = 0.0
        src_cam[i, :len(s_params)] = s_params
        src_mi[i] = packed.cam_model_idx[cam_slot[int(s_im.camera_id)]]
        src_scale[i] = pf.scales[pf.row(s_im.name, s_p2D)]
        targets[i] = ref.descriptor
        valid[i] = True
        if joint_src:
            slot = slot_of_image.get(int(s_iid))
            if slot is None:
                # source view outside the problem (partial BA): fall back to
                # constant-source mode for every observation
                logger.warning(
                    "patch_warp: source image %d not in the problem; "
                    "treating all source poses as constant.", s_iid)
                joint_src = False
            else:
                src_idx[i] = slot

    # per-obs payload in the window layout (feature_reference_window
    # convention): the target patch window + its coordinate transform travel
    # with each observation, so a mesh-sharded obs axis carries its share of
    # the photometric payload in its own chip's HBM, and the whole solve runs
    # through the bucket-padded compiled-program cache (_run_ba_cached).
    from ..util.jit_cache import interp_static_key

    windows = np.asarray(pf.patches)[rows].astype(np.float32)
    pcorners = pf.corners[rows].astype(np.float32)
    pscales = pf.scales[rows].astype(np.float32)
    pups = pf.upsampling[rows].astype(np.float32)
    valid_f = valid.astype(np.float32)
    key_model = models if mixed else model
    ikey = interp_static_key(interp)

    if joint_src:
        obs_data = (windows, pcorners, pscales, pups, src_cam, src_scale,
                    targets, valid_f, tgt_mi, src_mi)
        out = adjuster._run_ba_cached(
            reconstruction, packed, ("patch_warp", key_model, ikey, True),
            obs_data, (), loss, opts, obs_valid=valid, src_idx=src_idx)
    else:
        obs_data = (windows, pcorners, pscales, pups,
                    src_q, src_t, src_cam, src_scale,
                    targets, valid_f, tgt_mi, src_mi)
        out = adjuster._run_ba_cached(
            reconstruction, packed, ("patch_warp", key_model, ikey, False),
            obs_data, (), loss, opts, obs_valid=valid)
    out["num_residuals"] = int(valid.sum())
    out["joint_source_poses"] = joint_src
    return out
