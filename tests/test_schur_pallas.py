"""Parity of the fused Pallas Schur-matvec kernels vs a pure-jnp oracle.

Runs the kernels through the Pallas interpreter (exact semantics, CPU-safe);
the Mosaic-compiled path is exercised on hardware by
examples/probe_schur_pallas.py and the ba_large bench."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixsfm_tpu.ops import schur_pallas as sp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(sp, "INTERPRET", True)


def _problem(rng, T=4, NR=10, I=13, Nc=3, k=4, Np=700, tile=256):
    O = Np * T
    Bt = rng.normal(size=(NR * 3, O)).astype(np.float32)
    img = rng.integers(0, I, O).astype(np.int32)
    cam = rng.integers(0, Nc, O).astype(np.int32)
    A = rng.normal(size=(Np, 3, 3)).astype(np.float32)
    Vinv = np.einsum("pab,pcb->acp", A, A) + 3 * np.eye(3)[:, :, None]
    vp = rng.normal(size=(I, 6)).astype(np.float32)
    vc = rng.normal(size=(Nc, k)).astype(np.float32)
    packed = sp.pack_grid_blocks(
        jnp.asarray(Bt), jnp.asarray(img), jnp.asarray(cam),
        jnp.asarray(Vinv.astype(np.float32)), T, tile=tile)
    return Bt, img, cam, Vinv, vp, vc, packed


def test_matvec_matches_oracle():
    rng = np.random.default_rng(0)
    T, NR, I, Nc, k, Np, tile = 4, 10, 13, 3, 4, 700, 256
    Bt, img, cam, Vinv, vp, vc, (Btr, img_r, cam_r, Vi, Ppad) = _problem(rng)
    up, uc = sp.schur_term_matvec(
        jnp.asarray(vp.T), jnp.asarray(vc.T), Btr, img_r, cam_r, Vi,
        T=T, I=I, Nc=Nc, k=k, tile=tile)
    up_r, uc_r = sp.schur_term_matvec_ref(
        jnp.asarray(vp.T), jnp.asarray(vc.T), Btr, img_r, cam_r, Vi)
    np.testing.assert_allclose(np.asarray(up), np.asarray(up_r),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(uc), np.asarray(uc_r),
                               rtol=2e-5, atol=2e-4)
    # flat-layout oracle: the same Schur term computed obs-wise
    rows = np.concatenate([vp[img], vc[cam]], axis=1)            # [O, NR]
    b = Bt.reshape(NR, 3, -1)
    s = np.einsum("aco,oa->co", b, rows)
    t = s.reshape(3, Np, 4).sum(-1)
    w = np.einsum("abp,bp->ap", Vinv, t)
    u = np.einsum("aco,co->ao", b, w[:, :, None].repeat(4, 2).reshape(3, -1))
    up_f = np.zeros((I, 6))
    uc_f = np.zeros((Nc, k))
    np.add.at(up_f, img, u[:6].T)
    np.add.at(uc_f, cam, u[6:].T)
    np.testing.assert_allclose(np.asarray(up).T, up_f, rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(uc).T, uc_f, rtol=1e-4, atol=5e-3)


def test_rhs_and_backsub_match_oracle():
    rng = np.random.default_rng(1)
    T, NR, I, Nc, k, Np, tile = 4, 10, 13, 3, 4, 700, 256
    Bt, img, cam, Vinv, vp, vc, (Btr, img_r, cam_r, Vi, Ppad) = _problem(rng)
    gx = rng.normal(size=(3, Np)).astype(np.float32)
    gx_pad = jnp.concatenate(
        [jnp.asarray(gx), jnp.zeros((3, Ppad - Np), jnp.float32)], axis=1)
    up, uc = sp.schur_rhs(Btr, img_r, cam_r, Vi, gx_pad,
                          T=T, I=I, Nc=Nc, k=k, tile=tile)
    # oracle: w = Vinv gx per point, u = B w per obs, reduce
    w = np.einsum("abp,bp->ap", Vinv, gx)
    wl = w[:, :, None].repeat(T, 2).reshape(3, -1)
    b = Bt.reshape(NR, 3, -1)
    u = np.einsum("aco,co->ao", b, wl)
    up_f = np.zeros((I, 6))
    uc_f = np.zeros((Nc, k))
    np.add.at(up_f, img, u[:6].T)
    np.add.at(uc_f, cam, u[6:].T)
    np.testing.assert_allclose(np.asarray(up).T, up_f, rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(uc).T, uc_f, rtol=1e-4, atol=5e-3)

    t = sp.schur_backsub(jnp.asarray(vp.T), jnp.asarray(vc.T),
                         Btr, img_r, cam_r, T=T, I=I, Nc=Nc, k=k, tile=tile)
    rows = np.concatenate([vp[img], vc[cam]], axis=1)
    s = np.einsum("aco,oa->co", b, rows)
    t_f = s.reshape(3, Np, T).sum(-1)
    np.testing.assert_allclose(np.asarray(t)[:, :Np], t_f,
                               rtol=1e-4, atol=5e-3)


def test_ba_solve_pallas_matches_xla(rng):
    """Full grid-regime ba_solve with the Pallas backend (interpreted) must
    land on the XLA chunked-einsum path's solution."""
    import jax.numpy as jnp

    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.bundle_adjustment.main import (_RESIDUAL_BUILDERS,
                                                   _RESIDUAL_JAC_BUILDERS)
    from pixsfm_tpu.bundle_adjustment.problem import pack_ba_problem
    from pixsfm_tpu.ops.schur import (BAObservations, BAOptions, BAState,
                                      ba_solve)
    from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction as synth
    from tests.test_bundle_adjustment import perturb
    from tests.test_schur_cg import _grid_order

    rec = synth(n_images=5, n_points=80, noise_px=0.4, seed=72)
    perturb(rng=rng, rec=rec, pose_rot=0.003, pose_t=0.02, point_sigma=0.02)
    packed = pack_ba_problem(rec)
    rfn = _RESIDUAL_BUILDERS["geometric"]((packed.cam_model,))
    rjac = _RESIDUAL_JAC_BUILDERS["geometric"]((packed.cam_model,))
    Np = len(packed.point_ids)
    state0 = BAState(jnp.asarray(packed.qvec), jnp.asarray(packed.tvec),
                     jnp.asarray(packed.cams), jnp.asarray(packed.xyz))
    args = (jnp.asarray(packed.pose_free), jnp.asarray(packed.tvec_free),
            jnp.asarray(packed.cam_free), jnp.asarray(packed.point_free))
    loss = RobustLoss("trivial")
    T_b = 8
    grid_src, grid_valid = _grid_order(packed.obs_pt, Np, T_b)
    O_grid = Np * T_b
    dummy_pairs = jnp.asarray(np.zeros(4, np.int32) + O_grid)
    obs = BAObservations(
        img_idx=jnp.asarray(packed.obs_img[grid_src]),
        cam_idx=jnp.asarray(packed.obs_cam[grid_src]),
        pt_idx=jnp.asarray((np.arange(O_grid) // T_b).astype(np.int32)),
        obs_data=jnp.asarray(packed.obs_xy[grid_src], jnp.float32),
        valid=jnp.asarray(grid_valid),
        pair_o1=dummy_pairs, pair_o2=dummy_pairs)

    results = {}
    for backend in ("off", "on"):
        opts = BAOptions(max_iterations=8, obs_chunk=64,
                         linear_solver="cg", obs_grid_T=T_b,
                         pallas_matvec=backend)
        st, summ = ba_solve(rfn, state0, obs, loss, *args, opts=opts,
                            residual_jac_fn=rjac)
        results[backend] = (st, float(summ["final_cost"]))

    st_x, c_x = results["off"]
    st_p, c_p = results["on"]
    np.testing.assert_allclose(c_p, c_x, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_p.xyz), np.asarray(st_x.xyz),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_p.tvec), np.asarray(st_x.tvec),
                               atol=1e-4)


def test_padding_tail_contributes_nothing():
    """Np not a multiple of the tile: padded points/slots must be inert."""
    rng = np.random.default_rng(2)
    T, NR, I, Nc, k, Np, tile = 2, 8, 5, 2, 2, 300, 128
    O = Np * T
    Bt = rng.normal(size=(NR * 3, O)).astype(np.float32)
    img = rng.integers(0, I, O).astype(np.int32)
    cam = rng.integers(0, Nc, O).astype(np.int32)
    A = rng.normal(size=(Np, 3, 3)).astype(np.float32)
    Vinv = (np.einsum("pab,pcb->acp", A, A)
            + 3 * np.eye(3)[:, :, None]).astype(np.float32)
    vp = rng.normal(size=(I, 6)).astype(np.float32)
    vc = rng.normal(size=(Nc, k)).astype(np.float32)
    Btr, img_r, cam_r, Vi, Ppad = sp.pack_grid_blocks(
        jnp.asarray(Bt), jnp.asarray(img), jnp.asarray(cam),
        jnp.asarray(Vinv), T, tile=tile)
    assert Ppad == 384
    up, uc = sp.schur_term_matvec(
        jnp.asarray(vp.T), jnp.asarray(vc.T), Btr, img_r, cam_r, Vi,
        T=T, I=I, Nc=Nc, k=k, tile=tile)
    up_r, uc_r = sp.schur_term_matvec_ref(
        jnp.asarray(vp.T), jnp.asarray(vc.T), Btr, img_r, cam_r, Vi)
    np.testing.assert_allclose(np.asarray(up), np.asarray(up_r),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(uc), np.asarray(uc_r),
                               rtol=2e-5, atol=2e-4)
