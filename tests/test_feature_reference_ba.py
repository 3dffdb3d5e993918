"""Featuremetric BA test: patches are linear descriptor fields anchored at each
point's true projection, so the featuremetric optimum coincides with the true
geometry — BA must recover it after perturbation (and reference extraction must
pick consistent per-track references)."""

import numpy as np
import pytest

from pixsfm_tpu.bundle_adjustment import (
    BundleAdjuster, FeatureReferenceBundleAdjuster, extract_references,
    pack_ba_problem,
)
from pixsfm_tpu.features.featuremaps import (FeatureMap, FeatureSet,
                                             FeatureView)
from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction as synth
from tests.test_bundle_adjustment import perturb


def featuremetric_scene(seed=0, n_images=4, n_points=40, C=8, ps=16):
    rec = synth(n_images=n_images, n_points=n_points, noise_px=0.0, seed=seed)
    rng = np.random.default_rng(seed)
    sig = {pid: rng.normal(0, 1, C) for pid in rec.points3D}
    grad = {pid: rng.normal(0, 0.1, (C, 2)) for pid in rec.points3D}

    fset = FeatureSet(channels=C, patch_size=ps, dtype="float32")
    for im in rec.images.values():
        fmap = FeatureMap(is_sparse=True)
        for p2D_idx, pid in enumerate(im.point3D_ids):
            if pid < 0:
                continue
            xy_true = im.xys[p2D_idx]  # noise-free: xys == true projections
            corner = np.floor(xy_true - ps / 2).astype(np.int64)
            rr, cc = np.meshgrid(np.arange(ps), np.arange(ps), indexing="ij")
            # patch pixel (rr, cc) covers image coordinate (corner + (cc,rr) + .5)
            dx = corner[0] + cc + 0.5 - xy_true[0]
            dy = corner[1] + rr + 0.5 - xy_true[1]
            patch = (sig[pid][None, None, :]
                     + grad[pid][None, None, :, 0] * dx[..., None]
                     + grad[pid][None, None, :, 1] * dy[..., None])
            from pixsfm_tpu.features.featuremaps import FeaturePatch
            fmap.patches[p2D_idx] = FeaturePatch(
                patch.astype(np.float32), corner, np.array([1.0, 1.0]))
        fset.emplace(im.name, fmap)
    return rec, fset


def test_reference_extraction():
    rec, fset = featuremetric_scene(seed=5)
    packed = pack_ba_problem(rec)
    view = FeatureView.from_reconstruction(fset, rec, packed.point_ids)
    from pixsfm_tpu.base.interpolation import InterpolationConfig
    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=False)
    refs = extract_references(rec, fset, view,
                              {"loss": {"name": "cauchy", "params": [0.25]},
                               "iters": 20, "keep_observations": True},
                              interp)
    assert len(refs) == len(rec.points3D)
    rng = np.random.default_rng(5)
    for pid, ref in refs.items():
        # at true geometry all track descriptors equal the signature
        assert ref.descriptor.shape[-1] == 8
        sig_err = np.linalg.norm(ref.descriptor - ref.track_descriptors,
                                 axis=1).max()
        assert sig_err < 1e-3
        assert ref.source in rec.points3D[pid].track
        assert ref.observations is not None and ref.costs is not None


def track_consistency(rec):
    """Per-track std of (projection - true location) across views: featuremetric
    BA aligns all views of a track up to a common per-track offset (references
    are anchored at the perturbed geometry), so the *spread* must shrink."""
    spreads = []
    for p in rec.points3D.values():
        offs = []
        for iid, p2D_idx in p.track:
            im = rec.images[iid]
            cam = rec.cameras[im.camera_id]
            x_cam = im.world_to_camera(p.xyz)[0]
            xy = cam.img_from_cam(x_cam[:2] / x_cam[2])
            offs.append(xy - im.xys[p2D_idx])
        offs = np.asarray(offs)
        spreads.append(np.linalg.norm(offs - offs.mean(0), axis=1).mean())
    return float(np.mean(spreads))


def test_feature_reference_ba_aligns_tracks(rng):
    rec, fset = featuremetric_scene(seed=6)
    perturb(rec, rng, pose_rot=0.002, pose_t=0.01, point_sigma=0.02)
    spread_before = track_consistency(rec)
    adj = FeatureReferenceBundleAdjuster({
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
        "optimizer": {"loss": {"name": "trivial", "params": []},
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


def test_check_bounds_stops_flat_patch_runaway():
    """Pointwise featuremetric BA on near-flat patches drifts points into the
    clamped border region (zero gradient) unless check_bounds adds the
    boundary barrier (reference semantics: failed evaluation rejects the
    step, patch_interpolator.h:92-96)."""
    import jax.numpy as jnp

    from pixsfm_tpu.bundle_adjustment import BundleAdjuster
    from pixsfm_tpu.features.featuremaps import FeatureMap, FeatureSet

    rec = synth(n_images=3, n_points=25, noise_px=0.0, seed=3)
    rng = np.random.default_rng(0)
    ps, C = 8, 1

    fset = FeatureSet(channels=C, patch_size=ps, dtype="float32")
    for im in rec.images.values():
        fmap = FeatureMap(is_sparse=True)
        for p2D_idx, pid in enumerate(im.point3D_ids):
            if pid < 0:
                continue
            xy = im.xys[p2D_idx]
            corner = np.floor(xy - ps / 2).astype(np.int64)
            # nearly flat patch: tiny noise, no structure
            from pixsfm_tpu.features.featuremaps import FeaturePatch
            patch = 0.5 + 1e-3 * rng.normal(0, 1, (ps, ps, C))
            fmap.patches[p2D_idx] = FeaturePatch(
                patch.astype(np.float32), corner, np.array([1.0, 1.0]))
        fset.emplace(im.name, fmap)

    class _Mgr:
        num_levels = 1

        def fset(self, i):
            return fset

    xyz0 = {pid: np.asarray(p.xyz).copy() for pid, p in rec.points3D.items()}
    ba = BundleAdjuster.create({
        "strategy": "feature_reference",
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False,
                          "check_bounds": True},
        "optimizer": {"refine_focal_length": False,
                      "refine_extra_params": False}})
    ba.refine_multilevel(rec, _Mgr())
    move = max(np.linalg.norm(np.asarray(p.xyz) - xyz0[pid])
               for pid, p in rec.points3D.items())
    # scene radius is ~2 units; without the barrier points fly 100s of units
    assert move < 1.0, f"flat-patch runaway: max point move {move:.1f}"
