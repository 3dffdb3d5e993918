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
