"""ITERATIVE_SCHUR (matrix-free PCG) vs DENSE_SCHUR parity."""

import dataclasses

import numpy as np
import pytest

from pixsfm_tpu.bundle_adjustment import GeometricBundleAdjuster
from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction as synth
from tests.test_bundle_adjustment import perturb


def test_cg_matches_dense(rng):
    rec = synth(n_images=4, n_points=60, noise_px=0.3, seed=61)
    perturb(rec, rng, pose_rot=0.003, pose_t=0.02, point_sigma=0.02)

    results = {}
    for solver in ("dense", "cg"):
        r2 = rec.copy()
        adj = GeometricBundleAdjuster({
            "optimizer": {"solver": {"max_num_iterations": 30,
                                     "use_inner_iterations": False,
                                     "max_linear_solver_iterations": 200}}})
        # force the solver choice
        base_opts = adj._ba_options()
        adj._ba_options = lambda **kw: dataclasses.replace(
            base_opts, linear_solver=solver)
        out = adj.refine(r2)
        results[solver] = (out, r2)

    cost_d = results["dense"][0]["final_cost"]
    cost_cg = results["cg"][0]["final_cost"]
    assert cost_cg <= cost_d * 1.2 + 1e-4, (cost_d, cost_cg)

    rd, rcg = results["dense"][1], results["cg"][1]
    for iid in rd.images:
        np.testing.assert_allclose(rcg.images[iid].tvec,
                                   rd.images[iid].tvec, atol=2e-2)
    errs = [np.linalg.norm(rcg.points3D[p].xyz - rd.points3D[p].xyz)
            for p in rd.points3D]
    assert np.median(errs) < 1e-2


def test_cg_matches_dense_joint_source(rng):
    """CG/dense parity with the two-pose-block (patch-warp src_idx) layout."""
    from pixsfm_tpu.bundle_adjustment import PatchWarpBundleAdjuster
    from tests.test_feature_reference_ba import featuremetric_scene

    nodes = [[-0.5, -0.5], [0.5, -0.5], [-0.5, 0.5], [0.5, 0.5]]
    results = {}
    for solver in ("dense", "cg"):
        rec, fset = featuremetric_scene(seed=12, n_images=3, n_points=15)
        rng2 = np.random.default_rng(5)
        perturb(rec, rng2, pose_rot=0.002, pose_t=0.003, point_sigma=0.003)
        adj = PatchWarpBundleAdjuster({
            "interpolation": {"mode": "BICUBIC", "l2_normalize": False,
                              "ncc_normalize": False, "nodes": nodes},
            "optimizer": {"loss": {"name": "trivial", "params": []},
                          "refine_extrinsics": True,
                          "refine_focal_length": False,
                          "refine_extra_params": False,
                          "solver": {"max_num_iterations": 15,
                                     "use_inner_iterations": False,
                                     "max_linear_solver_iterations": 200}},
            "references": {"loss": {"name": "cauchy", "params": [0.25]},
                           "iters": 5, "compute_offsets3D": False},
        })
        base_opts = adj._ba_options()
        adj._ba_options = lambda **kw: dataclasses.replace(
            base_opts, linear_solver=solver)
        out = adj.refine(rec, fset)
        assert out["joint_source_poses"] is True
        results[solver] = (out, rec)

    cost_d = results["dense"][0]["final_cost"]
    cost_cg = results["cg"][0]["final_cost"]
    assert cost_cg <= cost_d * 1.2 + 1e-4, (cost_d, cost_cg)
    rd, rcg = results["dense"][1], results["cg"][1]
    for iid in rd.images:
        np.testing.assert_allclose(rcg.images[iid].tvec,
                                   rd.images[iid].tvec, atol=2e-2)
