"""Patch-warp (photometric) BA (reference:
pixsfm/residuals/src/featuremetric.h:77-188 + patch_warp_bundle_optimizer.h:21-61).

Residual per observation: project the 3D point into the *source* view (the track's
reference observation), offset the interpolation nodes in source pixel space, lift
each node to 3D at the source depth (fronto-parallel assumption,
``PixelToWorld``), reproject the lifted nodes into the *target* view, interpolate
the target patch at the warped nodes (NCC-normalized across nodes for photometric
use) and subtract the source/reference node descriptors.

Note: the source pose/intrinsics enter as constants here (per-observation arrays)
rather than as a second optimized parameter block. The reference's shipped
``photometric`` preset sets ``refine_extrinsics: false`` (configs/photometric.yaml),
for which this is exact; joint source-target pose coupling is future work.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..base.cameras import cam_from_img, img_from_cam
from ..base.geometry import apply_pose, quat_conj, quat_normalize, quat_rotate
from ..base.interpolation import (InterpolationConfig, interpolate,
                                  ncc_normalize)
from ..base.losses import make_loss
from ..features.featuremaps import FeatureView
from ..sfm.model import Reconstruction
from .problem import pack_ba_problem
from .references import extract_references

__all__ = ["patch_warp_ba"]


def patch_warp_ba(adjuster, reconstruction: Reconstruction, feature_set,
                  problem_setup=None) -> Dict:
    conf = adjuster.conf
    interp = InterpolationConfig.from_conf(conf.get("interpolation"))
    if interp.n_nodes < 2:
        raise ValueError("patch_warp BA needs n_nodes > 1 interpolation nodes")
    loss = make_loss(conf.optimizer.get("loss"))
    opts = adjuster._ba_options()
    flags = adjuster._optimizer_flags()
    if flags["refine_extrinsics"]:
        logger.warning("patch_warp: source poses are treated as constant; "
                       "with refine_extrinsics=true the source side of each "
                       "residual does not vary (photometric preset uses "
                       "refine_extrinsics=false).")

    packed = pack_ba_problem(reconstruction, problem_setup, **flags)
    model = packed.cam_model

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
    targets = np.zeros((O, interp.n_nodes * pf.channels), np.float32)
    valid = np.zeros(O, bool)
    for i in range(O):
        iid = int(packed.obs_image_id[i])
        pid = packed.point_ids[int(packed.obs_pt[i])]
        ref = refs.get(pid)
        if ref is None:
            continue
        im = reconstruction.images[iid]
        rows[i] = pf.row(im.name, int(packed.obs_p2D_idx[i]))
        s_iid, s_p2D = ref.source
        s_im = reconstruction.images[s_iid]
        s_cam = reconstruction.cameras[s_im.camera_id]
        src_q[i] = s_im.qvec
        src_t[i] = s_im.tvec
        src_cam[i] = s_cam.params
        src_scale[i] = pf.scales[pf.row(s_im.name, s_p2D)]
        targets[i] = ref.descriptor
        valid[i] = True

    patches = jnp.asarray(pf.patches)
    corners = jnp.asarray(pf.corners.astype(np.float32))
    scales = jnp.asarray(pf.scales.astype(np.float32))
    ups = jnp.asarray(pf.upsampling.astype(np.float32))
    nodes = jnp.asarray(interp.nodes_array())  # [n, 2] (dx, dy)
    C = pf.channels

    obs_data = (jnp.asarray(rows), jnp.asarray(src_q), jnp.asarray(src_t),
                jnp.asarray(src_cam), jnp.asarray(src_scale),
                jnp.asarray(targets), jnp.asarray(valid.astype(np.float32)))

    interp_single = InterpolationConfig(
        mode=interp.mode, l2_normalize=interp.l2_normalize,
        ncc_normalize=False, nodes=[[0.0, 0.0]])

    def residual_fn(qvec, tvec, cam, X, obs_slice):
        row, sq, st, scam, sscale, target, v = obs_slice
        # project into source; fronto-parallel node lift at source depth
        x_src = apply_pose(sq, st, X)
        depth = x_src[2]
        uv_s = x_src[:2] / depth
        xy_s = img_from_cam(model, scam, uv_s)

        def warp_node(node):
            xy_n = xy_s + node / sscale
            uvn = cam_from_img(model, scam, xy_n)
            x_cam_n = jnp.concatenate([uvn * depth, depth[None]])
            qinv = quat_conj(quat_normalize(sq))
            Xn = quat_rotate(qinv, x_cam_n - st)
            # reproject into target
            x_t = apply_pose(qvec, tvec, Xn)
            xy_t = img_from_cam(model, cam, x_t[:2] / x_t[2])
            pc = (xy_t * scales[row] - 0.5 - corners[row]) * ups[row]
            return interpolate(patches[row], pc[1], pc[0], interp_single)

        f = jax.vmap(warp_node)(nodes)          # [n_nodes, C]
        if interp.ncc_normalize:
            f = ncc_normalize(f)
        r = f.reshape(-1) - target
        return r * v

    out = adjuster._run_ba(reconstruction, packed, residual_fn, obs_data,
                           loss, opts)
    out["num_residuals"] = int(valid.sum())
    return out
