"""Costmap and patch-warp BA strategies on the synthetic featuremetric scene."""

import numpy as np
import pytest

from pixsfm_tpu.bundle_adjustment import (CostMapBundleAdjuster,
                                          PatchWarpBundleAdjuster)
from tests.test_feature_reference_ba import (featuremetric_scene,
                                             track_consistency)
from tests.test_bundle_adjustment import perturb


def test_costmap_extraction_values():
    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.bundle_adjustment.costmaps import extract_costmaps

    rec, fset = featuremetric_scene(seed=7, n_points=10)
    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=False)
    cset, refs = extract_costmaps(
        rec, fset, {"loss": {"name": "trivial", "params": []}},
        {"loss": {"name": "cauchy", "params": [0.25]}, "iters": 10}, interp)
    assert cset.channels == 3
    # cost at the observation's own pixel should be small near the keypoint
    # (descriptors agree at true geometry)
    some = next(iter(cset.maps.values()))
    patch = next(iter(some.patches.values()))
    assert patch.data.shape[-1] == 3
    assert np.isfinite(patch.data).all()
    # minimum cost near patch center (keypoint at center of cut window)
    cost = patch.data[..., 0]
    cmin = np.unravel_index(np.argmin(cost), cost.shape)
    center = np.array(cost.shape) / 2
    assert np.linalg.norm(np.asarray(cmin) - center) < 3.0


def test_costmap_ba_aligns_points(rng):
    rec, fset = featuremetric_scene(seed=8)
    for p in rec.points3D.values():
        p.xyz = p.xyz + rng.normal(0, 0.01, 3)
    spread_before = track_consistency(rec)
    adj = CostMapBundleAdjuster({
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
        "optimizer": {"loss": {"name": "trivial", "params": []},
                      "refine_extrinsics": False,
                      "refine_focal_length": False,
                      "refine_extra_params": False,
                      "solver": {"max_num_iterations": 30,
                                 "use_inner_iterations": False}},
        "references": {"loss": {"name": "cauchy", "params": [0.25]},
                       "iters": 10},
        "costmaps": {"loss": {"name": "trivial", "params": []}},
    })
    out = adj.refine(rec, fset)
    spread_after = track_consistency(rec)
    assert out["final_cost"] < out["initial_cost"]
    assert spread_after < spread_before * 0.6, \
        f"{spread_before} -> {spread_after}"


def test_patch_warp_ba_aligns_points(rng):
    rec, fset = featuremetric_scene(seed=9)
    for p in rec.points3D.values():
        p.xyz = p.xyz + rng.normal(0, 0.008, 3)
    spread_before = track_consistency(rec)
    nodes = [[float(dx), float(dy)] for dy in (-1.5, -0.5, 0.5, 1.5)
             for dx in (-1.5, -0.5, 0.5, 1.5)]
    adj = PatchWarpBundleAdjuster({
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False,
                          "ncc_normalize": False, "nodes": nodes},
        "optimizer": {"loss": {"name": "trivial", "params": []},
                      "refine_extrinsics": False,
                      "refine_focal_length": False,
                      "refine_extra_params": False,
                      "solver": {"max_num_iterations": 25,
                                 "use_inner_iterations": False}},
        "references": {"loss": {"name": "cauchy", "params": [0.25]},
                       "iters": 10, "compute_offsets3D": False},
    })
    out = adj.refine(rec, fset)
    spread_after = track_consistency(rec)
    assert out["final_cost"] < out["initial_cost"]
    assert spread_after < spread_before * 0.6, \
        f"{spread_before} -> {spread_after}"


def test_costmap_cross_derivative(rng):
    """compute_cross_derivative adds an analytic d2cost/drdc channel that
    matches finite differences of dcost/dr, and BA runs on the 4-channel
    (BICUBICGRADIENTFIELD) costmaps."""
    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.bundle_adjustment.costmaps import extract_costmaps

    rec, fset = featuremetric_scene(seed=18, n_points=8)
    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=False)
    cset, _ = extract_costmaps(
        rec, fset, {"loss": {"name": "cauchy", "params": [0.25]},
                    "compute_cross_derivative": True},
        {"loss": {"name": "cauchy", "params": [0.25]}, "iters": 5}, interp)
    assert cset.channels == 4
    some = next(iter(cset.maps.values()))
    patch = next(iter(some.patches.values())).data
    assert np.isfinite(patch).all()
    # interior: cross channel ~ central difference of dcost/dr along columns
    num = 0.5 * (patch[2:-2, 3:-1, 1] - patch[2:-2, 1:-3, 1])
    ana = patch[2:-2, 2:-2, 3]
    mask = np.abs(num) > 1e-5
    if mask.sum() > 4:
        rel = np.abs(ana[mask] - num[mask]) / (np.abs(num[mask]) + 1e-3)
        assert np.median(rel) < 0.5, np.median(rel)

    # the 4-channel costmap drives BA end-to-end
    for p in rec.points3D.values():
        p.xyz = p.xyz + rng.normal(0, 0.01, 3)
    adj = CostMapBundleAdjuster({
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
        "optimizer": {"loss": {"name": "trivial", "params": []},
                      "refine_extrinsics": False,
                      "refine_focal_length": False,
                      "refine_extra_params": False,
                      "solver": {"max_num_iterations": 20,
                                 "use_inner_iterations": False}},
        "references": {"loss": {"name": "cauchy", "params": [0.25]},
                       "iters": 10},
        "costmaps": {"loss": {"name": "trivial", "params": []},
                     "compute_cross_derivative": True},
    })
    out = adj.refine(rec, fset)
    assert out["final_cost"] < out["initial_cost"]


def test_patch_warp_joint_source_poses(rng):
    """With refine_extrinsics on, the source pose of each warp is a second
    optimized block (BAObservations.src_idx): perturbed poses + points are
    jointly recovered."""
    rec, fset = featuremetric_scene(seed=10)
    true_t = {iid: im.tvec.copy() for iid, im in rec.images.items()}
    perturb(rec, rng, pose_rot=0.002, pose_t=0.004, point_sigma=0.004)
    err_before = np.mean([np.linalg.norm(im.tvec - true_t[iid])
                          for iid, im in rec.images.items()])
    spread_before = track_consistency(rec)
    nodes = [[float(dx), float(dy)] for dy in (-1.5, -0.5, 0.5, 1.5)
             for dx in (-1.5, -0.5, 0.5, 1.5)]
    adj = PatchWarpBundleAdjuster({
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False,
                          "ncc_normalize": False, "nodes": nodes},
        "optimizer": {"loss": {"name": "trivial", "params": []},
                      "refine_extrinsics": True,
                      "refine_focal_length": False,
                      "refine_extra_params": False,
                      "solver": {"max_num_iterations": 30,
                                 "use_inner_iterations": False}},
        "references": {"loss": {"name": "cauchy", "params": [0.25]},
                       "iters": 10, "compute_offsets3D": False},
    })
    out = adj.refine(rec, fset)
    assert out["joint_source_poses"] is True
    assert out["final_cost"] < out["initial_cost"]
    spread_after = track_consistency(rec)
    err_after = np.mean([np.linalg.norm(im.tvec - true_t[iid])
                         for iid, im in rec.images.items()])
    assert spread_after < spread_before * 0.6, \
        f"{spread_before} -> {spread_after}"
    assert err_after < err_before, f"{err_before} -> {err_after}"


def test_patch_warp_constant_source_flag(rng):
    """optimize_source_poses=false keeps the constant-source path even with
    refine_extrinsics on."""
    rec, fset = featuremetric_scene(seed=11, n_images=3, n_points=12)
    for p in rec.points3D.values():
        p.xyz = p.xyz + rng.normal(0, 0.005, 3)
    nodes = [[-0.5, -0.5], [0.5, -0.5], [-0.5, 0.5], [0.5, 0.5]]
    adj = PatchWarpBundleAdjuster({
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False,
                          "ncc_normalize": False, "nodes": nodes},
        "optimizer": {"loss": {"name": "trivial", "params": []},
                      "refine_extrinsics": True,
                      "optimize_source_poses": False,
                      "refine_focal_length": False,
                      "refine_extra_params": False,
                      "solver": {"max_num_iterations": 10,
                                 "use_inner_iterations": False}},
        "references": {"loss": {"name": "cauchy", "params": [0.25]},
                       "iters": 5, "compute_offsets3D": False},
    })
    out = adj.refine(rec, fset)
    assert out["joint_source_poses"] is False
    assert out["final_cost"] < out["initial_cost"]


def test_costmap_upsampled():
    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.bundle_adjustment.costmaps import extract_costmaps

    rec, fset = featuremetric_scene(seed=17, n_points=6)
    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=False)
    cset, refs = extract_costmaps(
        rec, fset, {"loss": {"name": "trivial", "params": []},
                    "upsampling_factor": 2},
        {"loss": {"name": "cauchy", "params": [0.25]}, "iters": 5}, interp)
    some = next(iter(cset.maps.values()))
    patch = next(iter(some.patches.values()))
    ps = fset.patch_size
    assert patch.data.shape == (2 * ps, 2 * ps, 3)
    assert patch.upsampling_factor == 2.0
    assert np.isfinite(patch.data).all()
    # upsampled costmap at even indices matches the unit-scale costmap values
    cset1, _ = extract_costmaps(
        rec, fset, {"loss": {"name": "trivial", "params": []}},
        {"loss": {"name": "cauchy", "params": [0.25]}, "iters": 5}, interp)
    p1 = cset1.maps[list(cset1.maps)[0]]
    name = list(cset.maps)[0]
    k = list(cset.maps[name].patches)[0]
    a = cset.maps[name].patches[k].data[::2, ::2, 0]
    b = cset1.maps[name].patches[k].data[..., 0]
    np.testing.assert_allclose(a, b, atol=1e-3)
