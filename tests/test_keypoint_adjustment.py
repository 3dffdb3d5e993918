"""KA end-to-end on synthetic features: matched keypoints must converge to the
root keypoint's position in a shared smooth feature field (the KA objective's
global optimum when patches are cut from the same field)."""

import numpy as np
import pytest

from pixsfm_tpu.base.graph import (compute_root_labels, compute_score_labels,
                                   compute_track_labels)
from pixsfm_tpu.features.featuremaps import (FeatureMap, FeaturePatch,
                                             FeatureSet, FeatureManager)
from pixsfm_tpu.keypoint_adjustment import (
    FeatureMetricKeypointAdjuster, KeypointAdjuster,
    TopologicalReferenceKeypointAdjuster, build_matching_graph,
    find_problem_labels,
)


def smooth_field(H=96, W=96, C=8, seed=0):
    """Low-frequency random field: sum of random sinusoids per channel."""
    rng = np.random.default_rng(seed)
    y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    field = np.zeros((H, W, C), np.float32)
    for c in range(C):
        for _ in range(4):
            fx, fy = rng.uniform(0.02, 0.12, 2)
            ph = rng.uniform(0, 2 * np.pi, 2)
            field[..., c] += rng.uniform(0.3, 1.0) * (
                np.sin(2 * np.pi * fx * x + ph[0])
                * np.sin(2 * np.pi * fy * y + ph[1]))
    return field


def make_scene(n_kps=12, ps=16, seed=0, n_images=3, noise_px=1.2):
    """Images all observe the same field; keypoints perturbed except in image 0."""
    rng = np.random.default_rng(seed)
    field = smooth_field(seed=seed)
    H, W, C = field.shape
    true_xy = rng.uniform(ps, min(H, W) - ps, size=(n_kps, 2))

    fset = FeatureSet(channels=C, patch_size=ps, dtype="float32")
    keypoints = {}
    names = [f"im{i}.jpg" for i in range(n_images)]
    scale = np.array([1.0, 1.0])
    for i, name in enumerate(names):
        kps = true_xy.copy()
        if i > 0:
            kps = kps + rng.uniform(-noise_px, noise_px, size=kps.shape)
        corners = np.floor(kps - ps / 2).astype(np.int64)
        patches = np.stack([
            field[cy:cy + ps, cx:cx + ps] for cx, cy in corners])
        fmap = FeatureMap.from_arrays(patches, list(range(n_kps)), corners,
                                      scale)
        fset.emplace(name, fmap)
        keypoints[name] = kps.astype(np.float64)

    matches = {}
    for i in range(n_images):
        for j in range(i + 1, n_images):
            m = np.stack([np.arange(n_kps), np.arange(n_kps)], axis=1)
            matches[(names[i], names[j])] = m
    return field, true_xy, fset, keypoints, matches, names


class _Manager:
    def __init__(self, fset):
        self._fset = fset
        self.num_levels = 1

    def fset(self, i):
        return self._fset


@pytest.mark.parametrize("adjuster_cls", [
    FeatureMetricKeypointAdjuster, TopologicalReferenceKeypointAdjuster])
def test_ka_converges_to_truth(adjuster_cls):
    field, true_xy, fset, keypoints, matches, names = make_scene(seed=3)
    graph = build_matching_graph(matches)
    adj = adjuster_cls({"interpolation": {"mode": "BICUBIC",
                                          "l2_normalize": True},
                        "optimizer": {"loss": {"name": "trivial",
                                               "params": []}}})
    before_err = np.mean([np.linalg.norm(keypoints[n] - true_xy, axis=1).mean()
                          for n in names[1:]])
    out = adj.refine_multilevel(keypoints, _Manager(fset), graph)
    # roots (image untouched by noise may not be root; compare agreement of all
    # matched keypoints with their track mates instead of absolute truth)
    after_err = np.mean([np.linalg.norm(keypoints[n] - keypoints[names[0]],
                                        axis=1).mean() for n in names[1:]])
    assert after_err < 0.55, f"keypoints did not converge: {after_err}"
    assert after_err < before_err * 0.6
    assert "initial_cost" in out and out["final_cost"][0] <= \
        out["initial_cost"][0] + 1e-6


def test_find_problem_labels():
    track_labels = [0, 0, 0, 1, 1, 2, 2, 2, 2]
    labels, bins = find_problem_labels(track_labels, max_per_problem=5)
    labels = np.asarray(labels)
    # tracks stay whole
    for t in set(track_labels):
        ls = labels[np.asarray(track_labels) == t]
        assert len(set(ls.tolist())) == 1
    assert all(b <= 5 or b == max(bins) for b in bins)


def test_adjuster_factory():
    adj = KeypointAdjuster.create({"strategy": "topological_reference"})
    assert isinstance(adj, TopologicalReferenceKeypointAdjuster)
    adj = KeypointAdjuster.create(None)
    assert isinstance(adj, FeatureMetricKeypointAdjuster)


def make_dense_scene(n_kps=10, seed=0, n_images=3, noise_px=1.2,
                     H=48, W=80, C=8):
    """Non-square DENSE featuremaps (one kDensePatchId patch per image).

    Regression scene for the square-patch assumption that broke dense query
    maps (reshape(n*ps, ps, C) on a 765x1020 map): H != W on purpose."""
    from pixsfm_tpu.features.featuremaps import kDensePatchId

    rng = np.random.default_rng(seed)
    field = smooth_field(H=H, W=W, C=C, seed=seed)
    margin = 6.0
    true_xy = np.stack([rng.uniform(margin, W - margin, n_kps),
                        rng.uniform(margin, H - margin, n_kps)], axis=1)

    fset = FeatureSet(channels=C, patch_size=max(H, W), dtype="float32")
    keypoints = {}
    names = [f"im{i}.jpg" for i in range(n_images)]
    for i, name in enumerate(names):
        kps = true_xy.copy()
        if i > 0:
            kps = kps + rng.uniform(-noise_px, noise_px, size=kps.shape)
        fmap = FeatureMap(is_sparse=False)
        fmap.patches[kDensePatchId] = FeaturePatch(
            field.copy(), np.array([0, 0], np.int64), np.array([1.0, 1.0]))
        fset.emplace(name, fmap)
        keypoints[name] = kps.astype(np.float64)

    matches = {}
    for i in range(n_images):
        for j in range(i + 1, n_images):
            m = np.stack([np.arange(n_kps), np.arange(n_kps)], axis=1)
            matches[(names[i], names[j])] = m
    return field, true_xy, fset, keypoints, matches, names


@pytest.mark.parametrize("adjuster_cls", [
    FeatureMetricKeypointAdjuster, TopologicalReferenceKeypointAdjuster])
def test_ka_dense_nonsquare(adjuster_cls):
    """Both KA strategies work on non-square dense featuremaps (the window
    row-view and the bound boxes must use H and W separately)."""
    field, true_xy, fset, keypoints, matches, names = make_dense_scene(seed=7)
    graph = build_matching_graph(matches)
    adj = adjuster_cls({"interpolation": {"mode": "BICUBIC",
                                          "l2_normalize": True},
                        "optimizer": {"loss": {"name": "trivial",
                                               "params": []}}})
    before_err = np.mean([np.linalg.norm(keypoints[n] - true_xy, axis=1).mean()
                          for n in names[1:]])
    adj.refine_multilevel(keypoints, _Manager(fset), graph)
    after_err = np.mean([np.linalg.norm(keypoints[n] - keypoints[names[0]],
                                        axis=1).mean() for n in names[1:]])
    assert after_err < 0.55, f"dense KA did not converge: {after_err}"
    assert after_err < before_err * 0.6


def test_evaluate_descriptors_dense_nonsquare():
    """evaluate_descriptors windowed path on a non-square dense map matches
    direct per-query interpolation."""
    import jax.numpy as jnp
    from pixsfm_tpu.base.interpolation import InterpolationConfig, interpolate
    from pixsfm_tpu.keypoint_adjustment.solver import evaluate_descriptors

    rng = np.random.default_rng(11)
    H, W, C = 40, 72, 8
    field = smooth_field(H=H, W=W, C=C, seed=11)
    n = 37
    kps = np.stack([rng.uniform(3, W - 3, n), rng.uniform(3, H - 3, n)],
                   axis=1)
    packed = field[None]  # [1, H, W, C]
    rows = np.zeros(n, np.int64)
    corners = np.zeros((n, 2), np.float32)
    scales = np.ones((n, 2), np.float32)
    ups = np.ones(n, np.float32)
    for l2 in (False, True):
        interp = InterpolationConfig(mode="BICUBIC", l2_normalize=l2)
        got = evaluate_descriptors(packed, rows, kps, corners, scales, ups,
                                   interp, query_chunk=16)
        uv = kps - 0.5
        want = np.stack([
            np.asarray(interpolate(jnp.asarray(field), jnp.asarray(v),
                                   jnp.asarray(u), interp))
            for u, v in uv])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ka_compaction_matches_plain():
    """Segmented convergence compaction reaches the same solution as the
    single-segment solve (warm-restarted damping changes the trajectory,
    not the optimum)."""
    field, true_xy, fset, keypoints, matches, names = make_scene(seed=5)
    graph = build_matching_graph(matches)

    results = {}
    for seg in (0, 5):
        kps = {k: v.copy() for k, v in keypoints.items()}
        adj = FeatureMetricKeypointAdjuster(
            {"interpolation": {"mode": "BICUBIC", "l2_normalize": True},
             "compaction_segment": seg})
        out = adj.refine_multilevel(kps, _Manager(fset), graph)
        results[seg] = (kps, out["final_cost"][0])

    for n in names:
        np.testing.assert_allclose(results[0][0][n], results[5][0][n],
                                   atol=0.05)
    assert abs(results[0][1] - results[5][1]) < 0.05 * max(results[0][1],
                                                           1e-6)


def test_multinode_ncc_ka_consensus():
    """Multi-node NCC featuremetric KA (the reference's EvaluateNodes
    residual, residuals/src/featuremetric.h:54-55): with C=1 identity
    'features' a single-point residual is an aperture problem, but the
    16-node NCC window must drive every track to photometric consensus
    (track spread -> 0) within the 4 px bound."""
    from pixsfm_tpu.features.featuremaps import FeatureMap, FeatureSet
    from pixsfm_tpu.keypoint_adjustment import (FeatureMetricKeypointAdjuster,
                                                build_matching_graph)

    rng = np.random.default_rng(0)
    n_kps, ps = 20, 16
    H = W = 96
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    field = (np.sin(0.37 * xx) * np.sin(0.41 * yy)
             + 0.3 * np.sin(0.13 * xx + 0.2 * yy))[..., None].astype(
        np.float32)
    true_xy = rng.uniform(ps, min(H, W) - ps, size=(n_kps, 2))
    names = [f"im{i}.jpg" for i in range(3)]
    fset = FeatureSet(channels=1, patch_size=ps, dtype="float32")
    kps0 = {}
    for name in names:
        kp = true_xy + rng.uniform(-1.0, 1.0, true_xy.shape)
        corners = np.floor(kp - ps / 2).astype(np.int64)
        patches = np.stack([field[cy:cy + ps, cx:cx + ps]
                            for cx, cy in corners])
        fset.emplace(name, FeatureMap.from_arrays(
            patches, list(range(n_kps)), corners, np.array([1.0, 1.0])))
        kps0[name] = kp.astype(np.float64)
    matches = {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            matches[(names[i], names[j])] = np.stack(
                [np.arange(n_kps)] * 2, axis=1)
    graph = build_matching_graph(matches)

    class _Mgr:
        num_levels = 1

        def fset(self, i):
            return fset

    nodes = [[dx, dy] for dy in (-1.5, -0.5, 0.5, 1.5)
             for dx in (-1.5, -0.5, 0.5, 1.5)]
    ka = FeatureMetricKeypointAdjuster({
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False,
                          "ncc_normalize": True, "nodes": nodes},
        "optimizer": {"loss": {"name": "trivial", "params": []},
                      "bound": 4.0},
        "max_kps_per_problem": 8})
    kps = {k: v.copy() for k, v in kps0.items()}
    out = ka.refine_multilevel(kps, _Mgr(), graph)
    assert np.sum(out["final_cost"]) < 0.01 * np.sum(out["initial_cost"])

    def spread(kd):
        a = np.stack([kd[n] for n in names])
        return np.linalg.norm(a - a.mean(0), axis=-1).mean()

    assert spread(kps) < 0.05 * spread(kps0)
