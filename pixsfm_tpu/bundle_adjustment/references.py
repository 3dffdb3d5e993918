"""Robust per-track reference descriptors (reference:
pixsfm/bundle_adjustment/src/reference_extractor.h:57-363 + base/src/irls_optim.h:23-71).

For every 3D point: interpolate each track observation's descriptor at the point's
*reprojected* location, compute a robust (IRLS) mean over the track, and keep the
observation whose descriptor is closest to that mean (``closest_to_robust_mean``,
reference_extractor.h:239-298). Optionally keeps all observations + costs (for
localization's ``nearest`` mode) and 3D node offsets for patch-warp BA.

TPU design: tracks are padded to a common length and the IRLS loop runs as one
``vmap``-ed ``fori_loop`` over all points at once — the reference instead bins points
and runs per-bin threads (parallel_optimizer.h).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..base.interpolation import InterpolationConfig, interpolate_nodes
from ..base.losses import RobustLoss, make_loss
from ..sfm.model import Reconstruction

__all__ = ["Reference", "extract_references", "robust_mean_irls"]


@dataclass
class Reference:
    """Per-point3D reference (reference: features/src/references.{h,cc})."""
    source: Tuple[int, int]               # (image_id, p2D_idx) of chosen obs
    descriptor: np.ndarray                # [n_nodes * C] flattened
    node_offsets3D: Optional[np.ndarray] = None  # [n_nodes, 3]
    observations: Optional[List[Tuple[int, int]]] = None
    costs: Optional[np.ndarray] = None    # [T] distance to robust mean
    track_descriptors: Optional[np.ndarray] = None  # [T, n_nodes * C]

    @property
    def channels(self) -> int:
        return self.descriptor.shape[-1]

    def has_observations(self) -> bool:
        return self.observations is not None


from functools import lru_cache


@lru_cache(maxsize=32)
def _compiled_node_eval(interp_key):
    from ..util.jit_cache import interp_from_key

    interp = interp_from_key(interp_key)

    @jax.jit
    def run(patches, r, c):
        def one(p, rr, cc):
            return interpolate_nodes(p, rr, cc, interp).reshape(-1)
        return jax.vmap(one)(patches, r, c)

    return run


@lru_cache(maxsize=32)
def _compiled_irls(loss_key, iters: int, l2_normalize: bool):
    loss = RobustLoss(loss_key[0], list(loss_key[1]))

    @jax.jit
    def run(td, tv):
        return jax.vmap(lambda d, v: robust_mean_irls(
            d, v, loss, iters, l2_normalize=l2_normalize))(td, tv)

    return run


def robust_mean_irls(descriptors: jnp.ndarray, valid: jnp.ndarray,
                     loss: RobustLoss, iters: int,
                     l2_normalize: bool = True) -> jnp.ndarray:
    """IRLS robust mean over axis 0 of [T, D] descriptors (irls_optim.h:23-71).

    valid: [T] mask. Re-normalizes the mean each iteration when l2_normalize.
    """
    v = valid.astype(jnp.float32)[:, None]

    def normalize(m):
        if l2_normalize:
            return m / jnp.maximum(jnp.linalg.norm(m), 1e-12)
        return m

    mean0 = normalize(jnp.sum(descriptors * v, axis=0)
                      / jnp.maximum(jnp.sum(v), 1.0))

    def body(_, mean):
        d2 = jnp.sum((descriptors - mean) ** 2, axis=1)
        w = loss.weight(d2) * valid.astype(jnp.float32)
        m = jnp.sum(descriptors * w[:, None], axis=0) \
            / jnp.maximum(jnp.sum(w), 1e-12)
        return normalize(m)

    return jax.lax.fori_loop(0, iters, body, mean0)


def extract_references(reconstruction: Reconstruction, feature_set, view,
                       conf, interp: InterpolationConfig,
                       point3D_ids: Optional[Sequence[int]] = None,
                       keep_observations: Optional[bool] = None,
                       sharding=None) -> Dict[int, Reference]:
    """Compute references for all (or the given) points.

    conf: the ``references`` config subtree ({loss, iters, keep_observations,
    compute_offsets3D}).

    ``sharding``: optional ``jax.sharding.NamedSharding`` over the batch axis
    — both device stages (per-observation descriptor interpolation and
    per-point IRLS) are embarrassingly parallel, so sharding their inputs
    data-parallels the extraction over the mesh with zero cross-chip
    communication (the multi-chip analogue of the reference's per-bin thread
    pool, reference_extractor.h:125-162). Use
    ``parallel.sharded.sharded_reference_extraction`` for the packaged form.
    """
    import time
    t0 = time.time()
    get = conf.get if hasattr(conf, "get") else lambda k, d=None: d
    loss = make_loss(get("loss", {"name": "cauchy", "params": [0.25]}))
    iters = int(get("iters", 100) or 100)
    if keep_observations is None:
        keep_observations = bool(get("keep_observations", False))
    compute_offsets = bool(get("compute_offsets3D", False))

    pids = list(point3D_ids if point3D_ids is not None
                else sorted(reconstruction.points3D.keys()))
    if not pids:
        return {}

    pf = view.packed
    n_nodes = interp.n_nodes
    C = pf.channels
    D = n_nodes * C

    # flatten all track observations; reprojected locations batched per image
    from ..localization.pnp import project_np

    per_image: Dict[int, list] = {}
    for s, pid in enumerate(pids):
        for (iid, p2D_idx) in reconstruction.points3D[pid].track:
            per_image.setdefault(iid, []).append((s, pid, int(p2D_idx)))
    obs_pt, obs_row, obs_xy, obs_track = [], [], [], []
    for iid, items in per_image.items():
        im = reconstruction.images[iid]
        cam = reconstruction.cameras[im.camera_id]
        X = np.stack([reconstruction.points3D[pid].xyz for _, pid, _ in items])
        xy, depth = project_np(cam, im.qvec, im.tvec, X)
        for (s, pid, p2D_idx), xyi, z in zip(items, xy, depth):
            if z <= 1e-6:
                continue
            row = pf.row_or(im.name, p2D_idx)
            if row < 0:       # observation was never extracted
                continue
            obs_pt.append(s)
            obs_row.append(row)
            obs_xy.append(xyi)
            obs_track.append((iid, p2D_idx))
    if not obs_pt:
        return {}

    obs_pt = np.asarray(obs_pt, np.int64)
    obs_row = np.asarray(obs_row, np.int32)
    obs_xy = np.asarray(obs_xy, np.float64)

    # batched descriptor interpolation at reprojections (cached compile;
    # batch padded to power-of-two buckets)
    from ..util.jit_cache import bucket, interp_static_key

    n_devices = (int(np.prod(list(sharding.mesh.shape.values())))
                 if sharding is not None else 1)

    def stage(x):
        x = jnp.asarray(x)
        return jax.device_put(x, sharding) if sharding is not None else x

    n_obs = len(obs_row)
    n_pad = -(-bucket(n_obs) // n_devices) * n_devices
    if isinstance(pf.patches, np.ndarray):
        patches_g = np.asarray(pf.patches)[obs_row]
        if n_pad > n_obs:
            patches_g = np.concatenate(
                [patches_g, np.zeros((n_pad - n_obs,) + patches_g.shape[1:],
                                     patches_g.dtype)])
    else:
        # device-resident packed patches: gather on device (padded rows point
        # at row 0; their interpolated descriptors are sliced off below)
        row_pad = np.zeros(n_pad, np.int32)
        row_pad[:n_obs] = obs_row
        patches_g = jnp.take(pf.patches, jnp.asarray(row_pad), axis=0)

    def pad(a, fill=0.0):
        a = np.asarray(a, np.float32)
        return a if n_pad == n_obs else np.concatenate(
            [a, np.full((n_pad - n_obs,) + a.shape[1:], fill, np.float32)])

    corners = pad(pf.corners[obs_row])
    scales = pad(pf.scales[obs_row], 1.0)
    ups = pad(pf.upsampling[obs_row], 1.0)
    xy_p = pad(obs_xy)
    pc = (xy_p * scales - 0.5 - corners) * ups[:, None]

    run = _compiled_node_eval(interp_static_key(interp))
    desc = np.asarray(run(stage(patches_g), stage(pc[:, 1]),
                          stage(pc[:, 0])))[:n_obs]

    # pad tracks to T_max and run IRLS batched over points (points axis
    # padded to the mesh size when sharded)
    counts = np.bincount(obs_pt, minlength=len(pids))
    from ..util.jit_cache import bucket
    T = bucket(int(counts.max()) if len(counts) else 1, minimum=2)
    n_pts = -(-len(pids) // n_devices) * n_devices
    track_desc = np.zeros((n_pts, T, D), np.float32)
    track_valid = np.zeros((n_pts, T), bool)
    # slot within track, vectorized: rank of each observation among its
    # track's observations (stable sort keeps the original order per track)
    obs_pt = np.asarray(obs_pt)
    obs_slot = np.zeros(len(obs_pt), np.int64)
    if len(obs_pt):
        order = np.argsort(obs_pt, kind="stable")
        sorted_pt = obs_pt[order]
        new_grp = np.r_[True, sorted_pt[1:] != sorted_pt[:-1]]
        starts = np.nonzero(new_grp)[0]
        ranks = np.arange(len(obs_pt)) - np.repeat(
            starts, np.diff(np.r_[starts, len(obs_pt)]))
        obs_slot[order] = ranks
        track_desc[obs_pt, obs_slot] = desc
        track_valid[obs_pt, obs_slot] = True

    run_irls = _compiled_irls((loss.name, tuple(loss.params)), iters,
                              interp.l2_normalize)
    means = np.asarray(run_irls(stage(track_desc), stage(track_valid)))

    # per-point: observation closest to the robust mean
    d2 = np.sum((track_desc - means[:, None, :]) ** 2, axis=2)
    d2[~track_valid] = np.inf
    best = np.argmin(d2, axis=1)

    refs: Dict[int, Reference] = {}
    # map (point_slot, slot) -> original track element
    track_elems: Dict[Tuple[int, int], Tuple[int, int]] = {}
    for i, s in enumerate(obs_pt):
        track_elems[(int(s), int(obs_slot[i]))] = obs_track[i]

    from ..util.misc import progress_iter
    for s, pid in progress_iter(list(enumerate(pids)), desc="references",
                                min_items=2000):
        if counts[s] == 0:
            continue
        b = int(best[s])
        ref = Reference(
            source=track_elems[(s, b)],
            descriptor=track_desc[s, b].copy())
        if keep_observations:
            ref.observations = [track_elems[(s, t)]
                                for t in range(int(counts[s]))]
            ref.costs = d2[s, :int(counts[s])].copy()
            ref.track_descriptors = track_desc[s, :int(counts[s])].copy()
        if compute_offsets:
            ref.node_offsets3D = _node_offsets3D(
                reconstruction, ref.source, pids[s], pf, interp)
        refs[pid] = ref

    logger.info("Reference extraction: %.3fs (%d points)",
                time.time() - t0, len(refs))
    return refs


def _node_offsets3D(reconstruction: Reconstruction, source: Tuple[int, int],
                    pid: int, pf, interp: InterpolationConfig) -> np.ndarray:
    """Back-project interpolation node offsets to 3D at the source observation's
    depth (reference: reference_extractor.h:331-363). Used by patch-warp BA."""
    from ..base.projection import pixel_to_world

    iid, p2D_idx = source
    im = reconstruction.images[iid]
    cam = reconstruction.cameras[im.camera_id]
    p3D = reconstruction.points3D[pid]
    x_cam = im.world_to_camera(p3D.xyz)[0]
    depth = x_cam[2]
    xy = cam.img_from_cam(x_cam[:2] / x_cam[2])
    row = pf.row(im.name, int(p2D_idx))
    scale = pf.scales[row]

    nodes = interp.nodes_array()  # (dx, dy) in featuremap px
    offsets = np.zeros((len(nodes), 3))
    X0 = np.asarray(pixel_to_world(cam.model, jnp.asarray(cam.params),
                                   jnp.asarray(im.qvec), jnp.asarray(im.tvec),
                                   jnp.asarray(xy), depth))
    for i, (dx, dy) in enumerate(nodes):
        xy_n = xy + np.array([dx, dy]) / scale
        Xn = np.asarray(pixel_to_world(cam.model, jnp.asarray(cam.params),
                                       jnp.asarray(im.qvec),
                                       jnp.asarray(im.tvec),
                                       jnp.asarray(xy_n), depth))
        offsets[i] = Xn - X0
    return offsets
