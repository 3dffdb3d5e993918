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
