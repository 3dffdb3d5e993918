"""BA tests following the reference's differential-test pattern
(bundle_optimizer_test.cc: synthesize scene -> optimize -> assert recovery),
with the geometric BA as the trusted baseline for the featuremetric variants.
"""

import numpy as np
import pytest

from pixsfm_tpu.bundle_adjustment import (
    BundleAdjuster, BundleAdjustmentSetup, GeometricBundleAdjuster,
    default_problem_setup,
)
from pixsfm_tpu.sfm import Reconstruction, synthetic_reconstruction
from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction as synth


def perturb(rec: Reconstruction, rng, pose_rot=0.01, pose_t=0.05,
            point_sigma=0.05, skip_first_n=1):
    ids = sorted(rec.images.keys())
    for iid in ids[skip_first_n:]:
        im = rec.images[iid]
        dq = rng.normal(0, pose_rot, 3)
        from pixsfm_tpu.base.geometry import exp_quat, quat_mul, quat_normalize
        import jax.numpy as jnp
        im.qvec = np.asarray(quat_normalize(quat_mul(
            exp_quat(jnp.asarray(dq)), jnp.asarray(im.qvec))))
        im.tvec = im.tvec + rng.normal(0, pose_t, 3)
    for p in rec.points3D.values():
        p.xyz = p.xyz + rng.normal(0, point_sigma, 3)


class TestGeometricBA:
    def test_reduces_reprojection_error(self, rng):
        rec = synth(n_images=4, n_points=60, noise_px=0.0, seed=1)
        gt = rec.copy()
        perturb(rec, rng)
        err_before = rec.mean_reprojection_error()
        adj = GeometricBundleAdjuster({
            "optimizer": {"solver": {"max_num_iterations": 50,
                                     "use_inner_iterations": False}}})
        out = adj.refine(rec)
        err_after = rec.mean_reprojection_error()
        assert err_after < 0.02, f"{err_before} -> {err_after}"
        assert out["final_cost"] < out["initial_cost"] * 1e-3

    def test_mixed_camera_models(self, rng):
        """Two camera models in one problem: per-obs lax.switch projection,
        params padded to the widest model."""
        rec = synth(n_images=4, n_points=60, noise_px=0.0, seed=22,
                    shared_camera=False, model="SIMPLE_RADIAL")
        # convert half the cameras to RADIAL with k2=0 (identical projection,
        # different parameter layout) so observations stay consistent
        for cid in list(rec.cameras)[:2]:
            cam = rec.cameras[cid]
            cam.model = "RADIAL"
            cam.params = np.concatenate([cam.params, [0.0]])
        gt_f = {cid: rec.cameras[cid].params[0] for cid in rec.cameras}
        perturb(rec, rng, pose_rot=0.005, pose_t=0.02, point_sigma=0.02)
        adj = GeometricBundleAdjuster({
            "optimizer": {"refine_focal_length": False,
                          "refine_extra_params": False,
                          "solver": {"max_num_iterations": 40,
                                     "use_inner_iterations": False}}})
        out = adj.refine(rec)
        err_after = rec.mean_reprojection_error()
        assert err_after < 0.02, err_after
        assert out["final_cost"] < out["initial_cost"] * 1e-2
        # models and param layouts survive the roundtrip
        assert rec.cameras[list(rec.cameras)[0]].model == "RADIAL"
        for cid, cam in rec.cameras.items():
            assert cam.params[0] == pytest.approx(gt_f[cid])
            assert len(cam.params) == (5 if cam.model == "RADIAL" else 4)

    def test_nonmonotonic_steps(self, rng):
        """GLL acceptance (use_nonmonotonic_steps) converges and reports the
        best-seen cost."""
        rec = synth(n_images=4, n_points=60, noise_px=0.0, seed=21)
        perturb(rec, rng)
        adj = GeometricBundleAdjuster({
            "optimizer": {"solver": {"max_num_iterations": 50,
                                     "use_inner_iterations": False,
                                     "use_nonmonotonic_steps": True,
                                     "max_consecutive_nonmonotonic_steps": 5}}})
        out = adj.refine(rec)
        err_after = rec.mean_reprojection_error()
        assert err_after < 0.02
        assert out["final_cost"] < out["initial_cost"] * 1e-3

    def test_constant_poses_respected(self, rng):
        rec = synth(n_images=3, n_points=50, noise_px=0.2, seed=2)
        setup = default_problem_setup(rec)
        q0 = rec.images[1].qvec.copy()
        t0 = rec.images[1].tvec.copy()
        perturb(rec, rng, skip_first_n=1)
        t1x = rec.images[2].tvec[0]  # constant coord holds its perturbed value
        adj = GeometricBundleAdjuster({
            "optimizer": {"solver": {"max_num_iterations": 20,
                                     "use_inner_iterations": False}}})
        adj.refine(rec, problem_setup=setup)
        np.testing.assert_allclose(rec.images[1].qvec, q0, atol=1e-8)
        np.testing.assert_allclose(rec.images[1].tvec, t0, atol=1e-8)
        np.testing.assert_allclose(rec.images[2].tvec[0], t1x, atol=1e-6)

    def test_refine_extrinsics_false(self, rng):
        rec = synth(n_images=3, n_points=40, noise_px=0.3, seed=3)
        poses = {i: (im.qvec.copy(), im.tvec.copy())
                 for i, im in rec.images.items()}
        for p in rec.points3D.values():
            p.xyz = p.xyz + rng.normal(0, 0.05, 3)
        adj = GeometricBundleAdjuster({
            "optimizer": {"refine_extrinsics": False,
                          "solver": {"max_num_iterations": 20,
                                     "use_inner_iterations": False}}})
        out = adj.refine(rec)
        for i, im in rec.images.items():
            np.testing.assert_allclose(im.qvec, poses[i][0], atol=1e-8)
            np.testing.assert_allclose(im.tvec, poses[i][1], atol=1e-8)
        assert out["final_cost"] < out["initial_cost"]

    def test_intrinsics_refinement(self, rng):
        rec = synth(n_images=5, n_points=120, noise_px=0.0, seed=4,
                    model="SIMPLE_RADIAL")
        f_true = rec.cameras[1].params[0]
        rec.cameras[1].params[0] *= 1.02  # 2% focal error
        adj = GeometricBundleAdjuster({
            "optimizer": {"refine_focal_length": True,
                          "refine_extra_params": True,
                          "solver": {"max_num_iterations": 60,
                                     "use_inner_iterations": False}}})
        adj.refine(rec)
        assert abs(rec.cameras[1].params[0] - f_true) / f_true < 5e-3


class TestFactory:
    def test_create(self):
        from pixsfm_tpu.bundle_adjustment import (
            FeatureReferenceBundleAdjuster)
        assert isinstance(BundleAdjuster.create(None),
                          FeatureReferenceBundleAdjuster)
        assert isinstance(BundleAdjuster.create({"strategy": "geometric"}),
                          GeometricBundleAdjuster)


def test_segmented_ba_matches_single_dispatch(rng):
    """segment_iterations > 0 re-enters the compiled LM loop with
    warm-restarted damping; the result must match the single-dispatch solve
    (host boundary = interrupt/progress point, reference callbacks.h)."""
    rec = synth(n_images=4, n_points=60, noise_px=0.0, seed=31)
    perturb(rec, rng)
    results = {}
    for seg in (0, 7):
        r2 = rec.copy()
        adj = GeometricBundleAdjuster({
            "optimizer": {"solver": {"max_num_iterations": 40,
                                     "use_inner_iterations": False,
                                     "segment_iterations": seg}}})
        out = adj.refine(r2)
        results[seg] = (out, r2.mean_reprojection_error())
    assert results[7][1] < 0.02, results[7][1]
    np.testing.assert_allclose(results[7][0]["final_cost"],
                               results[0][0]["final_cost"],
                               rtol=1e-3, atol=1e-6)
    assert results[7][0]["iterations"] >= results[0][0]["iterations"] - 1
