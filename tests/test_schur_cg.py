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


def _grid_order(obs_pt, n_points, T_b):
    """Host-side point-major grid packing (mirrors _run_ba_cached)."""
    obs_pt = np.asarray(obs_pt)
    O = len(obs_pt)
    order = np.argsort(obs_pt, kind="stable")
    sorted_pts = obs_pt[order]
    starts = np.searchsorted(sorted_pts, np.arange(n_points), side="left")
    slot = sorted_pts * T_b + (np.arange(O) - starts[sorted_pts])
    grid_src = np.zeros(n_points * T_b, np.int64)
    grid_valid = np.zeros(n_points * T_b, bool)
    grid_src[slot] = order
    grid_valid[slot] = True
    return grid_src, grid_valid


def test_obs_grid_matches_flat(rng):
    """The point-major GRID obs ordering (opts.obs_grid_T: reshape-shaped
    point reductions, one-hot row expands) must reproduce the flat CG
    path, on both the analytic-Gram and the generic jacfwd chunk evals."""
    import jax.numpy as jnp

    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.bundle_adjustment.main import (_RESIDUAL_BUILDERS,
                                                   _RESIDUAL_JAC_BUILDERS)
    from pixsfm_tpu.bundle_adjustment.problem import pack_ba_problem
    from pixsfm_tpu.ops.schur import (BAObservations, BAOptions, BAState,
                                      ba_solve)

    rec = synth(n_images=5, n_points=80, noise_px=0.4, seed=72)
    perturb(rng=rng, rec=rec, pose_rot=0.003, pose_t=0.02, point_sigma=0.02)
    packed = pack_ba_problem(rec)
    rfn = _RESIDUAL_BUILDERS["geometric"]((packed.cam_model,))
    rjac = _RESIDUAL_JAC_BUILDERS["geometric"]((packed.cam_model,))
    O = len(packed.obs_img)
    Np = len(packed.point_ids)
    state0 = BAState(jnp.asarray(packed.qvec), jnp.asarray(packed.tvec),
                     jnp.asarray(packed.cams), jnp.asarray(packed.xyz))
    args = (jnp.asarray(packed.pose_free), jnp.asarray(packed.tvec_free),
            jnp.asarray(packed.cam_free), jnp.asarray(packed.point_free))
    loss = RobustLoss("trivial")
    dummy_pairs = jnp.asarray(np.zeros(4, np.int32) + O)

    T_b = 8
    grid_src, grid_valid = _grid_order(packed.obs_pt, Np, T_b)
    O_grid = Np * T_b
    assert O_grid % 64 == 0

    results = {}
    for use_jac in (False, True):
        for grid in (False, True):
            if grid:
                obs = BAObservations(
                    img_idx=jnp.asarray(packed.obs_img[grid_src]),
                    cam_idx=jnp.asarray(packed.obs_cam[grid_src]),
                    pt_idx=jnp.asarray(
                        (np.arange(O_grid) // T_b).astype(np.int32)),
                    obs_data=jnp.asarray(packed.obs_xy[grid_src],
                                         jnp.float32),
                    valid=jnp.asarray(grid_valid),
                    pair_o1=dummy_pairs, pair_o2=dummy_pairs)
                opts = BAOptions(max_iterations=12, obs_chunk=64,
                                 linear_solver="cg", obs_grid_T=T_b)
            else:
                obs = BAObservations(
                    img_idx=jnp.asarray(packed.obs_img),
                    cam_idx=jnp.asarray(packed.obs_cam),
                    pt_idx=jnp.asarray(packed.obs_pt),
                    obs_data=jnp.asarray(packed.obs_xy, jnp.float32),
                    valid=jnp.ones((O,), bool),
                    pair_o1=dummy_pairs, pair_o2=dummy_pairs)
                opts = BAOptions(max_iterations=12, obs_chunk=64,
                                 linear_solver="cg")
            st, summ = ba_solve(rfn, state0, obs, loss, *args, opts=opts,
                                residual_jac_fn=rjac if use_jac else None)
            results[(use_jac, grid)] = (st, float(summ["final_cost"]))

    for use_jac in (False, True):
        st_f, c_f = results[(use_jac, False)]
        st_g, c_g = results[(use_jac, True)]
        np.testing.assert_allclose(c_g, c_f, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st_g.xyz),
                                   np.asarray(st_f.xyz), atol=1e-4)
        np.testing.assert_allclose(np.asarray(st_g.tvec),
                                   np.asarray(st_f.tvec), atol=1e-4)
    # Gram vs jacfwd chunk eval must agree too
    np.testing.assert_allclose(results[(True, True)][1],
                               results[(False, True)][1], rtol=1e-4)


def test_grid_auto_engages(rng, monkeypatch):
    """_run_ba_cached switches to the grid ordering past the one-hot
    budget and still reaches the flat-path solution."""
    from pixsfm_tpu.bundle_adjustment import main as ba_main
    from pixsfm_tpu.ops import schur as schur_mod

    seen_opts = []
    orig_compiled = ba_main._compiled_ba_run

    def recording(residual_key, loss_key, opts):
        seen_opts.append(opts)
        return orig_compiled(residual_key, loss_key, opts)

    monkeypatch.setattr(ba_main, "_compiled_ba_run", recording)

    results = {}
    for patched in (False, True):
        rec = synth(n_images=5, n_points=80, noise_px=0.4, seed=73)
        rng2 = np.random.default_rng(9)
        perturb(rec, rng2, pose_rot=0.003, pose_t=0.02, point_sigma=0.02)
        if patched:
            monkeypatch.setattr(schur_mod, "_ONEHOT_BUDGET", 1)
        else:
            monkeypatch.setattr(schur_mod, "_ONEHOT_BUDGET", 1 << 28)
        adj = GeometricBundleAdjuster({
            "optimizer": {"solver": {"max_num_iterations": 15,
                                     "use_inner_iterations": False,
                                     "max_linear_solver_iterations": 200}}})
        base_opts = adj._ba_options()
        adj._ba_options = lambda **kw: dataclasses.replace(
            base_opts, linear_solver="cg", obs_chunk=128)
        out = adj.refine(rec)
        results[patched] = (out, rec)

    assert seen_opts[0].obs_grid_T == 0
    assert seen_opts[-1].obs_grid_T > 0, \
        "grid ordering did not engage under the patched budget"
    c_f = results[False][0]["final_cost"]
    c_g = results[True][0]["final_cost"]
    np.testing.assert_allclose(c_g, c_f, rtol=1e-4)
    rf, rgr = results[False][1], results[True][1]
    for iid in rf.images:
        np.testing.assert_allclose(rgr.images[iid].tvec,
                                   rf.images[iid].tvec, atol=1e-3)
