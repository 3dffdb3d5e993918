"""Two-view geometric match verification (fundamental-matrix LO-RANSAC).

The reference consumes matches already verified by hloc/COLMAP's two-view
geometry stage; this module provides the equivalent filter for raw descriptor
matches so the built-in mapper/triangulator receive clean tracks.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["verify_matches", "verify_all_pairs"]


def _normalize(pts: np.ndarray):
    c = pts.mean(axis=0)
    s = np.sqrt(2.0) / max(np.mean(np.linalg.norm(pts - c, axis=1)), 1e-9)
    T = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1.0]])
    return (pts - c) * s, T


def _fit_F(x1h: np.ndarray, x2h: np.ndarray) -> np.ndarray:
    A = np.einsum("ni,nj->nij", x2h, x1h).reshape(len(x1h), 9)
    _, _, Vt = np.linalg.svd(A)
    F = Vt[-1].reshape(3, 3)
    U, S, Vt2 = np.linalg.svd(F)
    S = np.array([S[0], S[1], 0.0])
    return U @ np.diag(S) @ Vt2


def _sampson_px(F, x1h, x2h):
    Fx1 = x1h @ F.T
    Ftx2 = x2h @ F
    num = np.einsum("ni,ni->n", x2h, Fx1) ** 2
    den = (Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2
           + Ftx2[:, 1] ** 2)
    return num / np.maximum(den, 1e-18)


def verify_matches(kps1: np.ndarray, kps2: np.ndarray, matches: np.ndarray,
                   max_error_px: float = 3.0, iters: int = 1000,
                   seed: int = 0) -> np.ndarray:
    """Return the boolean inlier mask of ``matches`` under the best fundamental
    matrix (LO-RANSAC, Sampson error in pixels)."""
    n = len(matches)
    if n < 8:
        return np.ones(n, bool)
    p1 = np.asarray(kps1, np.float64)[matches[:, 0]]
    p2 = np.asarray(kps2, np.float64)[matches[:, 1]]
    n1, T1 = _normalize(p1)
    n2, T2 = _normalize(p2)
    x1h = np.hstack([n1, np.ones((n, 1))])
    x2h = np.hstack([n2, np.ones((n, 1))])
    # threshold in normalized units: scale by the mean normalization factor
    s = 0.5 * (T1[0, 0] + T2[0, 0])
    t2 = (max_error_px * s) ** 2

    rng = np.random.default_rng(seed)
    best_inl = np.zeros(n, bool)
    for _ in range(iters):
        idx = rng.choice(n, 8, replace=False)
        F = _fit_F(x1h[idx], x2h[idx])
        inl = _sampson_px(F, x1h, x2h) < t2
        if inl.sum() > best_inl.sum():
            for _ in range(3):
                if inl.sum() < 8:
                    break
                F = _fit_F(x1h[inl], x2h[inl])
                new = _sampson_px(F, x1h, x2h) < t2
                if new.sum() <= inl.sum():
                    break
                inl = new
            if inl.sum() > best_inl.sum():
                best_inl = inl
    return best_inl


def verify_all_pairs(matches: Dict[Tuple[str, str], np.ndarray],
                     keypoints: Dict[str, np.ndarray],
                     scores: Optional[Dict] = None,
                     max_error_px: float = 3.0,
                     min_num_inliers: int = 15):
    """Filter every pair's matches; drops pairs with too few inliers."""
    out_m, out_s = {}, {} if scores is not None else None
    for (n1, n2), m in matches.items():
        inl = verify_matches(keypoints[n1], keypoints[n2], np.asarray(m),
                             max_error_px=max_error_px)
        if inl.sum() < min_num_inliers:
            continue
        out_m[(n1, n2)] = np.asarray(m)[inl]
        if scores is not None and (n1, n2) in scores:
            out_s[(n1, n2)] = np.asarray(scores[(n1, n2)])[inl]
    return out_m, out_s
