"""Mixed camera models in the FEATUREMETRIC BA strategies.

The geometric strategy has supported per-observation lax.switch projection
since round 1 (test_bundle_adjustment.py::test_mixed_camera_models); these
tests cover the lift into feature_reference / costmap / patch_warp
(reference: the camera-switch macros in residuals/src/featuremetric.h:246-258
make every Ceres functor model-generic).

Trick shared with the geometric test: convert half the cameras from
SIMPLE_RADIAL to RADIAL with k2=0 — identical projection, different
parameter layout — so the synthetic patches stay consistent while the
problem genuinely carries two models.
"""

import numpy as np
import pytest

from pixsfm_tpu.base.cameras import Camera
from pixsfm_tpu.bundle_adjustment import (CostMapBundleAdjuster,
                                          FeatureReferenceBundleAdjuster,
                                          PatchWarpBundleAdjuster)
from tests.test_feature_reference_ba import (featuremetric_scene, perturb,
                                             track_consistency)


def split_cameras_mixed(rec):
    """Give each image its own camera; convert odd slots to RADIAL (k2=0)."""
    shared = rec.cameras[list(rec.cameras)[0]]
    for j, iid in enumerate(sorted(rec.images)):
        im = rec.images[iid]
        cid = 100 + j
        params = np.asarray(shared.params, np.float64).copy()
        model = shared.model
        if j % 2 == 1:
            model = "RADIAL"
            params = np.concatenate([params, [0.0]])
        rec.add_camera(Camera(cid, model, shared.width, shared.height,
                              params))
        im.camera_id = cid
    return rec


def test_mixed_feature_reference_ba(rng):
    rec, fset = featuremetric_scene(seed=6)
    split_cameras_mixed(rec)
    perturb(rec, rng, pose_rot=0.002, pose_t=0.01, point_sigma=0.02)
    spread_before = track_consistency(rec)
    adj = FeatureReferenceBundleAdjuster({
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
        "optimizer": {"loss": {"name": "trivial", "params": []},
                      "refine_focal_length": False,
                      "refine_extra_params": False,
                      "solver": {"max_num_iterations": 30,
                                 "use_inner_iterations": False}},
        "references": {"loss": {"name": "cauchy", "params": [0.25]},
                       "iters": 20},
    })
    out = adj.refine(rec, fset)
    spread_after = track_consistency(rec)
    assert out["final_cost"] < out["initial_cost"] * 0.2
    assert spread_after < spread_before * 0.4, \
        f"{spread_before} -> {spread_after}"
    # param layouts survive the roundtrip
    for cam in rec.cameras.values():
        assert len(cam.params) == (5 if cam.model == "RADIAL" else 4)


def test_mixed_costmap_ba(rng):
    rec, fset = featuremetric_scene(seed=8)
    split_cameras_mixed(rec)
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


def test_mixed_patch_warp_ba(rng):
    rec, fset = featuremetric_scene(seed=9)
    split_cameras_mixed(rec)
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
