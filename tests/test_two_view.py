"""Two-view geometry: F-verification and Bougnoux focal self-calibration."""

import numpy as np

from pixsfm_tpu.sfm.two_view import (estimate_focal_bougnoux,
                                     estimate_pair_focal, verify_matches)


def _two_view_setup(f1=950.0, f2=1250.0, seed=3, n=120, noise=0.0):
    rng = np.random.default_rng(seed)
    pp1, pp2 = (512.0, 384.0), (500.0, 400.0)
    K1 = np.array([[f1, 0, pp1[0]], [0, f1, pp1[1]], [0, 0, 1.0]])
    K2 = np.array([[f2, 0, pp2[0]], [0, f2, pp2[1]], [0, 0, 1.0]])
    a = rng.normal(0, 0.25, 3)
    th = np.linalg.norm(a)
    k = a / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
    t = rng.normal(0, 1, 3)
    t /= np.linalg.norm(t)

    X = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 6.0])
    x1 = (K1 @ (X / X[:, 2:]).T).T[:, :2]
    Xc2 = (R @ X.T).T + t
    x2 = (K2 @ (Xc2 / Xc2[:, 2:]).T).T[:, :2]
    x1 += rng.normal(0, noise, x1.shape)
    x2 += rng.normal(0, noise, x2.shape)

    Tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F = np.linalg.inv(K2).T @ (Tx @ R) @ np.linalg.inv(K1)
    return x1, x2, F, pp1, pp2, (f1, f2)


def test_bougnoux_exact():
    """Exact F -> exact focal recovery for several focal combinations."""
    for seed, (f1, f2) in enumerate([(900, 1200), (1100, 1100),
                                     (1500, 800)]):
        _, _, F, pp1, pp2, _ = _two_view_setup(f1, f2, seed=seed + 1)
        e1, e2 = estimate_focal_bougnoux(F, pp1, pp2)
        np.testing.assert_allclose(e1, f1, rtol=1e-6)
        np.testing.assert_allclose(e2, f2, rtol=1e-6)


def test_pair_focal_from_matches():
    """RANSAC F + Bougnoux on noisy correspondences with outliers."""
    x1, x2, _, pp1, pp2, (f1, f2) = _two_view_setup(noise=0.3, n=150)
    rng = np.random.default_rng(0)
    x2_out = x2.copy()
    x2_out[:20] += rng.uniform(40, 120, (20, 2))   # 13% outliers
    matches = np.stack([np.arange(len(x1))] * 2, axis=1)
    e1, e2, ninl = estimate_pair_focal(x1, x2_out, matches, pp1, pp2,
                                       max_error_px=2.0)
    assert ninl > 100
    assert abs(e1 - f1) / f1 < 0.15, (e1, f1)
    assert abs(e2 - f2) / f2 < 0.15, (e2, f2)


def test_verify_matches_rejects_outliers():
    x1, x2, _, _, _, _ = _two_view_setup(noise=0.2, n=100)
    rng = np.random.default_rng(1)
    x2_out = x2.copy()
    # random directions: a one-quadrant shift can stay near the epipolar
    # line (F only constrains point-to-line)
    ang = rng.uniform(0, 2 * np.pi, 25)
    mag = rng.uniform(30, 90, 25)
    x2_out[:25] += mag[:, None] * np.stack([np.cos(ang), np.sin(ang)], axis=1)
    matches = np.stack([np.arange(len(x1))] * 2, axis=1)
    inl = verify_matches(x1, x2_out, matches, max_error_px=2.0)
    assert inl[25:].mean() > 0.95
    assert inl[:25].mean() < 0.25


def test_homography_pose_planar():
    """Planar two-view init: the 8-point E is degenerate (it keeps full
    Sampson support for a wrong pose), the calibrated-homography
    decomposition recovers the true motion."""
    from pixsfm_tpu.sfm.mapper import (_essential_from_matches,
                                       _homography_pose_from_matches)

    rng = np.random.default_rng(0)
    n = 150
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  np.full(n, 5.0)], axis=1)
    th = 0.15
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    t = np.array([0.8, 0.1, 0.05])
    X2 = (R @ X.T).T + t
    uv1 = X[:, :2] / X[:, 2:] + rng.normal(0, 5e-4, (n, 2))
    uv2 = X2[:, :2] / X2[:, 2:] + rng.normal(0, 5e-4, (n, 2))

    sol = _homography_pose_from_matches(uv1, uv2, iters=300)
    assert sol is not None
    Rr, tr, inl, front = sol
    assert inl.sum() > 0.9 * n
    assert front > 45
    np.testing.assert_allclose(Rr, R, atol=5e-2)
    tdir = tr / np.linalg.norm(tr)
    np.testing.assert_allclose(tdir, t / np.linalg.norm(t), atol=5e-2)

    # the E solution keeps high support but a wrong pose -> the mapper's
    # model-selection rule (H support >= 0.85 * E support) must pick H
    solE = _essential_from_matches(uv1, uv2, iters=400)
    if solE is not None:
        assert int(inl.sum()) >= 0.85 * int(solE[2].sum())
