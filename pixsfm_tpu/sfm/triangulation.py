"""Multi-view triangulation with known poses (the ETH3D-style flow).

The reference delegates triangulation to COLMAP via hloc
(``hloc.triangulation.main``; reference refine_hloc.py:94-115). Neither is
available here, so this module provides a standalone triangulator: tracks come
from the match graph (union-find MSF), each track is triangulated by the batched
DLT (mid-point via SVD of stacked projection constraints), and observations are
filtered by reprojection error and triangulation angle — the same acceptance
rules COLMAP's triangulator applies.

TPU design: all tracks triangulate in one padded vmapped SVD batch.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..base.graph import Graph, compute_track_labels
from .model import Image, Point3D, Reconstruction

__all__ = ["triangulate_tracks", "triangulate_reconstruction"]


@jax.jit
def _tri_solve(A):
    def one(Ai):
        _, _, Vt = jnp.linalg.svd(Ai, full_matrices=False)
        X = Vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
    return jax.vmap(one)(A)


def _triangulate_batch(P_rows: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """P_rows: [N, T, 2, 4] per-observation DLT constraint pairs; valid [N, T].
    Returns [N, 3] triangulated points (homogeneous SVD). T is padded to
    power-of-two buckets so repeated calls reuse the compiled program."""
    from ..util.jit_cache import bucket

    N, T = valid.shape
    T_pad = bucket(T, minimum=2)
    if T_pad > T:
        P_rows = np.concatenate(
            [P_rows, np.zeros((N, T_pad - T, 2, 4), P_rows.dtype)], axis=1)
        valid = np.concatenate(
            [valid, np.zeros((N, T_pad - T), bool)], axis=1)
    A = jnp.asarray(P_rows).reshape(N, -1, 4)
    m = jnp.repeat(jnp.asarray(valid), 2, axis=1)[..., None]
    return np.asarray(_tri_solve(A * m))


def triangulate_tracks(
        reconstruction: Reconstruction,
        graph: Graph,
        keypoints: Dict[str, np.ndarray],
        track_labels: Optional[np.ndarray] = None,
        max_reproj_error: float = 4.0,
        min_tri_angle_deg: float = 1.5,
        min_track_length: int = 2) -> Reconstruction:
    """Triangulate all graph tracks into ``reconstruction`` (poses must be set).

    Observations failing the reprojection-error test are dropped; tracks with
    fewer than ``min_track_length`` surviving observations or too-small maximum
    triangulation angle are rejected.
    """
    if track_labels is None:
        track_labels = compute_track_labels(graph)
    image_ids_arr, feature_idxs = graph.nodes_array()
    name_of = graph.image_id_to_name

    # per-image projection matrices (normalized coords), centers, and
    # batched undistorted keypoints (one device call per image, not per node)
    name_to_image = {im.name: im for im in reconstruction.images.values()}
    P_of: Dict[str, np.ndarray] = {}
    center_of: Dict[str, np.ndarray] = {}
    uv_of: Dict[str, np.ndarray] = {}
    for name, im in name_to_image.items():
        R = im.rotation_matrix()
        P_of[name] = np.hstack([R, im.tvec[:, None]])
        center_of[name] = im.projection_center()
        if name in keypoints and len(keypoints[name]):
            cam = reconstruction.cameras[im.camera_id]
            uv_of[name] = cam.cam_from_img(np.asarray(keypoints[name]))

    n_tracks = int(track_labels.max()) + 1 if graph.num_nodes else 0
    track_nodes: List[List[int]] = [[] for _ in range(n_tracks)]
    for nid in range(graph.num_nodes):
        track_nodes[track_labels[nid]].append(nid)

    # build padded DLT batch
    T = max((len(t) for t in track_nodes), default=0)
    if T == 0:
        return reconstruction
    tracks = [t for t in track_nodes if len(t) >= min_track_length]
    N = len(tracks)
    rows = np.zeros((N, T, 2, 4), np.float64)
    valid = np.zeros((N, T), bool)
    uv_all = np.zeros((N, T, 2), np.float64)

    for ti, nodes in enumerate(tracks):
        for k, nid in enumerate(nodes):
            name = name_of[int(image_ids_arr[nid])]
            im = name_to_image.get(name)
            if im is None or name not in uv_of:
                continue
            uv = uv_of[name][int(feature_idxs[nid])]
            P = P_of[name]
            rows[ti, k, 0] = uv[0] * P[2] - P[0]
            rows[ti, k, 1] = uv[1] * P[2] - P[1]
            uv_all[ti, k] = uv
            valid[ti, k] = True

    X = _triangulate_batch(rows, valid)

    # batched acceptance: reprojection errors computed per image in numpy
    from ..localization.pnp import _reproj_errors
    obs_err: Dict[Tuple[int, int], float] = {}
    per_image: Dict[str, List[Tuple[int, int, int]]] = {}
    for ti, nodes in enumerate(tracks):
        if not np.isfinite(X[ti]).all():
            continue
        for k, nid in enumerate(nodes):
            if not valid[ti, k]:
                continue
            name = name_of[int(image_ids_arr[nid])]
            if name in name_to_image:
                per_image.setdefault(name, []).append(
                    (ti, k, int(feature_idxs[nid])))
    for name, items in per_image.items():
        im = name_to_image[name]
        cam = reconstruction.cameras[im.camera_id]
        Xs = X[[it[0] for it in items]]
        xys = keypoints[name][[it[2] for it in items]]
        errs = _reproj_errors(cam, im.qvec, im.tvec, Xs, xys)
        for (ti, k, _), e in zip(items, errs):
            obs_err[(ti, k)] = float(e)

    min_angle = np.deg2rad(min_tri_angle_deg)
    next_pid = (max(reconstruction.points3D.keys()) + 1
                if reconstruction.points3D else 0)
    n_accepted = 0
    for ti, nodes in enumerate(tracks):
        xyz = X[ti]
        if not np.isfinite(xyz).all():
            continue
        track = []
        dirs = []
        for k, nid in enumerate(nodes):
            if not valid[ti, k]:
                continue
            name = name_of[int(image_ids_arr[nid])]
            im = name_to_image[name]
            if obs_err.get((ti, k), np.inf) > max_reproj_error:
                continue
            track.append((im.image_id, int(feature_idxs[nid])))
            d = xyz - center_of[name]
            dirs.append(d / np.linalg.norm(d))
        if len(track) < min_track_length:
            continue
        # max pairwise triangulation angle
        dirs = np.asarray(dirs)
        cosangles = np.clip(dirs @ dirs.T, -1, 1)
        if np.arccos(cosangles).max() < min_angle:
            continue
        pid = next_pid
        next_pid += 1
        reconstruction.add_point3D(Point3D(pid, xyz, track=track))
        for iid, p2D_idx in track:
            im = reconstruction.images[iid]
            if p2D_idx >= len(im.point3D_ids):
                pad = p2D_idx + 1 - len(im.point3D_ids)
                im.point3D_ids = np.concatenate(
                    [im.point3D_ids, np.full(pad, -1, np.int64)])
                im.xys = np.vstack([im.xys, np.zeros((pad, 2))])
            im.point3D_ids[p2D_idx] = pid
            im.xys[p2D_idx] = keypoints[im.name][p2D_idx]
        n_accepted += 1
    logger.info("Triangulated %d / %d tracks.", n_accepted, N)
    return reconstruction


def triangulate_reconstruction(
        reference_model: Reconstruction,
        graph: Graph,
        keypoints: Dict[str, np.ndarray],
        **kwargs) -> Reconstruction:
    """Fresh reconstruction with poses/cameras from ``reference_model`` and
    points triangulated from the match graph (the hloc triangulation flow with
    known ground-truth poses)."""
    rec = Reconstruction()
    for cam in reference_model.cameras.values():
        rec.add_camera(cam)
    for im in reference_model.images.values():
        new = Image(im.image_id, im.name, im.camera_id, im.qvec.copy(),
                    im.tvec.copy())
        kps = keypoints.get(im.name)
        if kps is not None:
            new.xys = np.asarray(kps, np.float64).copy()
            new.point3D_ids = np.full(len(kps), -1, np.int64)
        rec.add_image(new)
    return triangulate_tracks(rec, graph, keypoints, **kwargs)
