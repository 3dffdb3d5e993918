"""Multi-chip sharded BA on the virtual 8-device CPU mesh: same result as the
single-device solve (XLA SPMD with psums must be numerically equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixsfm_tpu.base.cameras import img_from_cam
from pixsfm_tpu.base.geometry import apply_pose
from pixsfm_tpu.base.losses import RobustLoss
from pixsfm_tpu.bundle_adjustment.problem import pack_ba_problem
from pixsfm_tpu.ops.schur import (BAObservations, BAOptions, BAState,
                                  ba_solve, make_pair_list)
from pixsfm_tpu.parallel.sharded import make_mesh, sharded_ba_solve
from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction


def _problem():
    rec = synthetic_reconstruction(n_images=4, n_points=30, noise_px=0.5,
                                   seed=55)
    packed = pack_ba_problem(rec)
    model = packed.cam_model

    def residual_fn(qvec, tvec, cam, X, obs_slice):
        x_cam = apply_pose(qvec, tvec, X)
        z = jnp.where(jnp.abs(x_cam[2]) < 1e-8, 1e-8, x_cam[2])
        return img_from_cam(model, cam, x_cam[:2] / z) - obs_slice

    O = len(packed.obs_img)
    po1, po2 = make_pair_list(packed.obs_pt, len(packed.point_ids))
    obs = BAObservations(
        img_idx=jnp.asarray(packed.obs_img),
        cam_idx=jnp.asarray(packed.obs_cam),
        pt_idx=jnp.asarray(packed.obs_pt),
        obs_data=jnp.asarray(packed.obs_xy, jnp.float32),
        valid=jnp.ones((O,), bool),
        pair_o1=jnp.asarray(po1), pair_o2=jnp.asarray(po2))
    state0 = BAState(jnp.asarray(packed.qvec), jnp.asarray(packed.tvec),
                     jnp.asarray(packed.cams), jnp.asarray(packed.xyz))
    return packed, residual_fn, obs, state0


def test_sharded_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    packed, residual_fn, obs, state0 = _problem()
    loss = RobustLoss("trivial")
    opts = BAOptions(max_iterations=5, obs_chunk=64,
                     use_inner_iterations=False)

    args = (jnp.asarray(packed.pose_free), jnp.asarray(packed.tvec_free),
            jnp.asarray(packed.cam_free), jnp.asarray(packed.point_free))
    state_ref, sum_ref = ba_solve(residual_fn, state0, obs, loss, *args,
                                  opts=opts)

    mesh = make_mesh(8)
    state_sh, sum_sh = sharded_ba_solve(residual_fn, state0, obs, loss,
                                        packed.pose_free, packed.tvec_free,
                                        packed.cam_free, packed.point_free,
                                        opts, mesh)
    np.testing.assert_allclose(float(sum_sh["final_cost"]),
                               float(sum_ref["final_cost"]),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(state_sh.xyz),
                               np.asarray(state_ref.xyz), atol=1e-3)
    np.testing.assert_allclose(np.asarray(state_sh.tvec),
                               np.asarray(state_ref.tvec), atol=1e-3)


def test_sharded_ka_matches_single_device():
    """sharded_ka_solve over the 8-device mesh == solve_ka_problems."""
    import jax
    import numpy as np
    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.keypoint_adjustment.solver import (KAProblems,
                                                       solve_ka_problems)
    from pixsfm_tpu.ops.lm import LMOptions
    from pixsfm_tpu.parallel.sharded import make_mesh, sharded_ka_solve

    rng = np.random.default_rng(3)
    P, K, E, C, ps = 12, 6, 10, 8, 16
    field = rng.normal(0, 1, (ps, ps, C)).astype(np.float32)
    patches = (field[None] + 0.05 * rng.normal(
        0, 1, (P * K, ps, ps, C))).astype(np.float32)
    kp0 = rng.uniform(5.0, 11.0, (P, K, 2)).astype(np.float32)
    problems = KAProblems(
        kp0=kp0,
        patch_row=np.arange(P * K, dtype=np.int32).reshape(P, K),
        corner=np.zeros((P, K, 2), np.float32),
        scale=np.ones((P, K, 2), np.float32),
        ups=np.ones((P, K), np.float32),
        kp_free=np.ones((P, K), bool),
        kp_valid=np.ones((P, K), bool),
        edge_i=rng.integers(0, K, (P, E)).astype(np.int32),
        edge_j=(rng.integers(1, K, (P, E))
                + np.arange(P)[:, None] * 0).astype(np.int32) % K,
        edge_w=np.ones((P, E), np.float32),
        lower=kp0 - 3.0, upper=kp0 + 3.0,
        node_problem=np.zeros(1, np.int64),
        node_slot=np.zeros(1, np.int64),
        node_ids=np.zeros(1, np.int64))

    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
    loss = RobustLoss("cauchy", [0.25])
    opts = LMOptions(max_iterations=15, parameter_tolerance=1e-6)

    kp_ref, sum_ref = solve_ka_problems(problems, patches, interp, loss,
                                        opts, chunk=P)
    mesh = make_mesh(len(jax.devices()))
    kp_sh, sum_sh = sharded_ka_solve(problems, patches, interp, loss, opts,
                                     mesh)
    # atol: sharded vs single-device compilations contract the Gram-form
    # normal equations in different orders; keypoints are O(10) px so 5e-4
    # is ~1e-5 relative.
    np.testing.assert_allclose(kp_sh, kp_ref, atol=5e-4)
    np.testing.assert_allclose(sum_sh["final_cost"], sum_ref["final_cost"],
                               rtol=1e-4)


def test_sharded_reference_extraction_matches_single_device():
    """Reference extraction with both device stages sharded over the 8-dev
    mesh == the unsharded result (pure data parallelism, no collectives)."""
    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.bundle_adjustment.references import extract_references
    from pixsfm_tpu.features.featuremaps import FeatureView
    from pixsfm_tpu.parallel.sharded import sharded_reference_extraction
    from test_feature_reference_ba import featuremetric_scene

    rec, fset = featuremetric_scene(seed=11, n_images=4, n_points=24)
    packed = pack_ba_problem(rec)
    view = FeatureView.from_reconstruction(fset, rec, packed.point_ids)
    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=False)
    conf = {"loss": {"name": "cauchy", "params": [0.25]}, "iters": 10,
            "keep_observations": True}

    refs_single = extract_references(rec, fset, view, conf, interp)
    mesh = make_mesh()
    refs_sharded = sharded_reference_extraction(rec, fset, view, conf,
                                                interp, mesh)

    assert set(refs_single) == set(refs_sharded)
    for pid in refs_single:
        a, b = refs_single[pid], refs_sharded[pid]
        assert a.source == b.source
        np.testing.assert_allclose(a.descriptor, b.descriptor,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a.costs, b.costs, rtol=1e-4, atol=1e-6)
