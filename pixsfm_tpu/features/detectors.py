"""Keypoint detection + exhaustive descriptor matching front-end.

The reference delegates detection/matching to hloc method configs
(reference pixsfm/eval/eth3d/config.py:30-137: sift / superpoint / r2d2);
here the same method names are first-class:

- ``sift``: OpenCV SIFT + BF ratio matching (host — tiny workload).
- ``superpoint`` / ``r2d2``: the Flax models (``features/models/``) with
  static-K jitted detection, and matching as one batched device matmul
  over L2-normalized descriptors (mutual nearest neighbor + ratio test,
  masked for padded slots) — MXU work, no per-pair host loops.

All detectors return COLMAP-convention keypoints (pixel centers at +0.5).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import logger

__all__ = ["detect_directory", "match_exhaustive", "detect_and_match_dir",
           "mutual_nn_ratio_match", "match_loftr_dir",
           "aggregate_semidense_matches"]


def _load_rgb(path, max_edge):
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    scale = 1.0
    if max(img.shape[:2]) > max_edge:
        scale = max_edge / max(img.shape[:2])
        img = cv2.resize(img, None, fx=scale, fy=scale,
                         interpolation=cv2.INTER_AREA)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0, \
        scale


def _pad_to(img, H, W):
    h, w = img.shape[:2]
    out = np.zeros((H, W, 3), np.float32)
    out[:h, :w] = img
    return out


def detect_directory(image_dir: Path, names: List[str], method: str = "sift",
                     max_edge: int = 1600, n_features: int = 8000,
                     conf: Optional[dict] = None):
    """Detect keypoints for every image. Returns (kps, descs, valid) dicts:
    kps[name] [N, 2] float64 (+0.5 center convention, full-resolution
    coordinates), descs[name] [N, C] float32, valid only meaningful for the
    static-K learned detectors (boolean [N])."""
    if method == "sift":
        import cv2

        sift = cv2.SIFT_create(nfeatures=n_features)
        kps, descs = {}, {}
        for name in names:
            img = cv2.imread(str(image_dir / name), cv2.IMREAD_GRAYSCALE)
            scale = 1.0
            if max(img.shape) > max_edge:
                scale = max_edge / max(img.shape)
                img = cv2.resize(img, None, fx=scale, fy=scale)
            kp, des = sift.detectAndCompute(img, None)
            kps[name] = (np.array([k.pt for k in kp], np.float64) + 0.5) \
                / scale
            descs[name] = des
        return kps, descs, {n: np.ones(len(kps[n]), bool) for n in names}

    from .models import get_model

    model_conf = dict(conf or {})
    model_conf.setdefault("max_keypoints", min(n_features, 4096))
    model = get_model(method)(model_conf)
    if not hasattr(model, "detect"):
        raise ValueError(f"model {method!r} has no detect()")

    # bucket identical padded shapes so the jitted program compiles once
    kps, descs, valid = {}, {}, {}
    loaded = {n: _load_rgb(image_dir / n, max_edge) for n in names}
    H = max(im.shape[0] for im, _ in loaded.values())
    W = max(im.shape[1] for im, _ in loaded.values())
    # round the pad target up to a multiple of 64 (detector strides) so a
    # handful of odd sizes share one compile
    H, W = -(-H // 64) * 64, -(-W // 64) * 64
    for name in names:
        img, scale = loaded[name]
        out = model.detect(_pad_to(img, H, W)[None])
        ok = np.asarray(out["valid"][0])
        # reject detections inside the padding margin
        xy = np.asarray(out["keypoints"][0])
        ok = ok & (xy[:, 0] < img.shape[1] - 0.5) \
            & (xy[:, 1] < img.shape[0] - 0.5)
        kps[name] = (xy.astype(np.float64) + 0.5) / scale
        descs[name] = np.asarray(out["descriptors"][0], np.float32)
        valid[name] = ok
    return kps, descs, valid


def mutual_nn_ratio_match(d1, d2, v1, v2, ratio: float = 0.95,
                          min_similarity: float = -1.0):
    """Masked mutual-NN + ratio matching of L2-normalized descriptor sets
    ([K1, C], [K2, C] with validity masks) — device matmul + argmax.

    Returns (pairs [M, 2] int64, scores [M] f32) on host."""
    import jax.numpy as jnp

    sim = jnp.asarray(d1) @ jnp.asarray(d2).T            # [K1, K2] cosine
    neg = -jnp.inf
    sim = jnp.where(jnp.asarray(v1)[:, None] & jnp.asarray(v2)[None, :],
                    sim, neg)
    nn12 = jnp.argmax(sim, axis=1)
    nn21 = jnp.argmax(sim, axis=0)
    best = jnp.max(sim, axis=1)
    # ratio test in distance space: d^2 = 2 - 2 sim for unit vectors
    sim2 = sim.at[jnp.arange(sim.shape[0]), nn12].set(neg)
    second = jnp.max(sim2, axis=1)
    d_best = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
    d_second = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 1e-12))
    keep = (nn21[nn12] == jnp.arange(sim.shape[0])) \
        & (best > min_similarity) \
        & (d_best < ratio * d_second) \
        & jnp.isfinite(best)
    idx = np.flatnonzero(np.asarray(keep))
    pairs = np.stack([idx, np.asarray(nn12)[idx]], axis=1).astype(np.int64)
    return pairs, np.asarray(best)[idx].astype(np.float32)


def match_exhaustive(names: List[str], descs: Dict, valid: Dict,
                     method: str = "sift", ratio: float = None,
                     min_matches: int = 15) -> Tuple[Dict, Dict]:
    """All-pairs matching. Returns (matches, scores) dicts keyed by
    (name_i, name_j) with i < j in ``names`` order."""
    matches, scores = {}, {}
    if method == "sift":
        import cv2

        bf = cv2.BFMatcher(cv2.NORM_L2)
        r = 0.8 if ratio is None else ratio
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                if descs[names[i]] is None or descs[names[j]] is None:
                    continue
                raw = bf.knnMatch(descs[names[i]], descs[names[j]], k=2)
                good = [m for m, n in raw if m.distance < r * n.distance]
                if len(good) < min_matches:
                    continue
                m = np.array([[g.queryIdx, g.trainIdx] for g in good],
                             np.int64)
                matches[(names[i], names[j])] = m
                scores[(names[i], names[j])] = np.array(
                    [1.0 - g.distance / 512.0 for g in good], np.float32)
        return matches, scores

    # reference match_configs (pixsfm/eval/eth3d/config.py:95-119): learned
    # descriptors use mutual NN + a *similarity* threshold (distance
    # threshold sqrt(2*(1-sim))), no ratio test.
    SIM_THRESH = {"superpoint": 0.755, "d2net": 0.8, "r2d2": 0.9}
    if ratio is None and method in SIM_THRESH:
        r, min_sim = np.inf, SIM_THRESH[method]
    else:
        r, min_sim = (0.95 if ratio is None else ratio), -1.0
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            m, s = mutual_nn_ratio_match(descs[names[i]], descs[names[j]],
                                         valid[names[i]], valid[names[j]],
                                         ratio=r, min_similarity=min_sim)
            if len(m) < min_matches:
                continue
            matches[(names[i], names[j])] = m
            scores[(names[i], names[j])] = s
    return matches, scores


def detect_and_match_dir(image_dir: Path, names: List[str],
                         method: str = "sift", max_edge: int = 1600,
                         n_features: int = 8000,
                         detector_conf: Optional[dict] = None,
                         ratio: float = None):
    """Full front-end: detect + exhaustive match. Returns
    (kps, matches, scores); geometric verification is the caller's job
    (``sfm.two_view.verify_all_pairs``)."""
    kps, descs, valid = detect_directory(image_dir, names, method=method,
                                         max_edge=max_edge,
                                         n_features=n_features,
                                         conf=detector_conf)
    n_det = {n: int(np.sum(valid[n])) for n in names}
    logger.info("detect[%s]: %d images, %.0f keypoints/image", method,
                len(names), np.mean(list(n_det.values())))
    matches, scores = match_exhaustive(names, descs, valid, method=method,
                                       ratio=ratio)
    return kps, matches, scores


# ---------------------------------------------------------------------------
# detector-free (LoFTR) front-end: match first, aggregate matches to features
# ---------------------------------------------------------------------------

def aggregate_semidense_matches(pair_matches: Dict, cell_size: float = 1.0):
    """Turn per-pair semi-dense match coordinates into per-image keypoint
    lists + index matches (the reference's loftr flow: "we match first and
    then aggregate matches to features", eval config cell_size 1 — max one
    keypoint per quantization cell, reference eval/eth3d/config.py:120-131).

    pair_matches: {(name0, name1): (xy0 [M,2], xy1 [M,2], conf [M])} with
    full-resolution +0.5-convention coordinates. Returns (kps, matches,
    scores): kps[name] [N,2] = per-cell running-mean coordinates;
    matches[(n0,n1)] [K,2] int64 keypoint indices (duplicate cell pairs
    keep the highest-confidence instance)."""
    ids: Dict[str, Dict[Tuple[int, int], int]] = {}
    sums: Dict[str, list] = {}
    counts: Dict[str, list] = {}

    def kp_id(name, xy):
        cell = (int(np.floor(xy[0] / cell_size)),
                int(np.floor(xy[1] / cell_size)))
        table = ids.setdefault(name, {})
        if cell not in table:
            table[cell] = len(table)
            sums.setdefault(name, []).append(np.array(xy, np.float64))
            counts.setdefault(name, []).append(1)
        else:
            i = table[cell]
            sums[name][i] += xy
            counts[name][i] += 1
        return table[cell]

    matches, scores = {}, {}
    for (n0, n1), (xy0, xy1, conf) in pair_matches.items():
        best: Dict[Tuple[int, int], Tuple[float, int, int]] = {}
        for k in range(len(xy0)):
            i0 = kp_id(n0, xy0[k])
            i1 = kp_id(n1, xy1[k])
            c = float(conf[k])
            if (i0, i1) not in best or c > best[(i0, i1)][0]:
                best[(i0, i1)] = (c, i0, i1)
        # one-to-one within the pair (the contract of the detector-based
        # matchers): several matches can quantize into the same source cell
        # with DIFFERENT target cells — keep only the highest-confidence
        # assignment per i0 and per i1 (greedy by confidence), otherwise
        # track building merges multiple observations of one image into a
        # single track
        used0, used1 = set(), set()
        vals = []
        for c, i0, i1 in sorted(best.values(), reverse=True):
            if i0 in used0 or i1 in used1:
                continue
            used0.add(i0)
            used1.add(i1)
            vals.append((c, i0, i1))
        if vals:
            vals.sort(key=lambda t: (t[1], t[2]))
            matches[(n0, n1)] = np.array([[i0, i1] for _, i0, i1 in vals],
                                         np.int64)
            scores[(n0, n1)] = np.array([c for c, _, _ in vals], np.float32)

    kps = {name: np.stack(sums[name]) / np.array(counts[name])[:, None]
           for name in sums}
    return kps, matches, scores


def match_loftr_dir(image_dir: Path, names: List[str],
                    max_edge: int = 1024, matcher_conf: Optional[dict] = None,
                    cell_size: float = 1.0, min_matches: int = 15):
    """Detector-free front-end: exhaustive LoFTR pair matching + semi-dense
    aggregation. Same return contract as ``detect_and_match_dir`` —
    (kps, matches, scores) with full-resolution +0.5 keypoints — so the
    downstream graph/KA/SfM stages are method-agnostic.

    Images are padded to one shared /64 bucket so every pair reuses a
    single jitted program; matches landing in the padding are rejected."""
    import cv2

    from .models.loftr import LoFTR

    matcher = LoFTR(matcher_conf or {})
    loaded = {}
    for name in names:
        img = cv2.imread(str(image_dir / name), cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(
                f"cannot read image {image_dir / name} (missing or not a "
                "decodable image)")
        scale = 1.0
        if max(img.shape) > max_edge:
            scale = max_edge / max(img.shape)
            img = cv2.resize(img, None, fx=scale, fy=scale)
        loaded[name] = (img.astype(np.float32) / 255.0, scale)
    H = max(im.shape[0] for im, _ in loaded.values())
    W = max(im.shape[1] for im, _ in loaded.values())
    H, W = -(-H // 64) * 64, -(-W // 64) * 64
    padded = {n: (_pad_to(im[..., None], H, W)[..., 0], s)
              for n, (im, s) in loaded.items()}

    pair_matches = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            n0, n1 = names[i], names[j]
            (im0, s0), (im1, s1) = padded[n0], padded[n1]
            mk0, mk1, conf, valid = matcher.match_pair(im0, im1)
            h0, w0 = loaded[n0][0].shape
            h1, w1 = loaded[n1][0].shape
            keep = valid \
                & (mk0[:, 0] < w0 - 0.5) & (mk0[:, 1] < h0 - 0.5) \
                & (mk1[:, 0] < w1 - 0.5) & (mk1[:, 1] < h1 - 0.5)
            if keep.sum() < min_matches:
                continue
            pair_matches[(n0, n1)] = ((mk0[keep] + 0.5) / s0,
                                      (mk1[keep] + 0.5) / s1,
                                      conf[keep])
    kps, matches, scores = aggregate_semidense_matches(pair_matches,
                                                       cell_size=cell_size)
    for n in names:
        kps.setdefault(n, np.zeros((0, 2), np.float64))
    n_kp = {n: len(kps[n]) for n in names}
    logger.info("loftr: %d images, %.0f keypoints/image, %d matched pairs",
                len(names), np.mean(list(n_kp.values())), len(matches))
    return kps, matches, scores
