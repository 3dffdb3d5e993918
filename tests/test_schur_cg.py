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


def test_point_major_matches_flat(rng):
    """Point-major [Np, T] reductions (pt_slot) must reproduce the flat
    segment-sum path bit-for-tolerance: same normal equations, same LM
    trajectory, same solution (large-Np scatter-free layout)."""
    import jax.numpy as jnp

    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.bundle_adjustment.main import _RESIDUAL_BUILDERS
    from pixsfm_tpu.bundle_adjustment.problem import pack_ba_problem
    from pixsfm_tpu.ops.schur import (BAObservations, BAOptions, BAState,
                                      ba_solve, make_pair_list,
                                      make_point_major)

    rec = synth(n_images=5, n_points=80, noise_px=0.4, seed=71)
    perturb(rng=rng, rec=rec, pose_rot=0.003, pose_t=0.02, point_sigma=0.02)
    packed = pack_ba_problem(rec)
    rfn = _RESIDUAL_BUILDERS["geometric"]((packed.cam_model,))
    O = len(packed.obs_img)
    Np = len(packed.point_ids)
    pair_o1, pair_o2 = make_pair_list(packed.obs_pt, Np)
    state0 = BAState(jnp.asarray(packed.qvec), jnp.asarray(packed.tvec),
                     jnp.asarray(packed.cams), jnp.asarray(packed.xyz))
    args = (jnp.asarray(packed.pose_free), jnp.asarray(packed.tvec_free),
            jnp.asarray(packed.cam_free), jnp.asarray(packed.point_free))
    loss = RobustLoss("trivial")

    results = {}
    for solver in ("dense", "cg"):
        for pm in (False, True):
            pt_slot = (jnp.asarray(make_point_major(packed.obs_pt, Np, O))
                       if pm else None)
            img_slot = (jnp.asarray(make_point_major(
                packed.obs_img, len(packed.image_ids), O)) if pm else None)
            obs = BAObservations(
                img_idx=jnp.asarray(packed.obs_img),
                cam_idx=jnp.asarray(packed.obs_cam),
                pt_idx=jnp.asarray(packed.obs_pt),
                obs_data=jnp.asarray(packed.obs_xy, jnp.float32),
                valid=jnp.ones((O,), bool),
                pair_o1=jnp.asarray(pair_o1), pair_o2=jnp.asarray(pair_o2),
                pt_slot=pt_slot, img_slot=img_slot)
            st, summ = ba_solve(rfn, state0, obs, loss, *args,
                                opts=BAOptions(max_iterations=12,
                                               obs_chunk=64,
                                               linear_solver=solver))
            results[(solver, pm)] = (st, float(summ["final_cost"]))

    for solver in ("dense", "cg"):
        st_f, c_f = results[(solver, False)]
        st_p, c_p = results[(solver, True)]
        np.testing.assert_allclose(c_p, c_f, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st_p.xyz),
                                   np.asarray(st_f.xyz), atol=1e-4)
        # f32 summation-order noise: one-hot matmul vs gather+sum accumulate
        # in different orders
        np.testing.assert_allclose(np.asarray(st_p.tvec),
                                   np.asarray(st_f.tvec), atol=1e-4)
