"""Localization tests: PnP recovery, QKA target convergence, full
QueryLocalizer flow on the synthetic featuremetric scene."""

import numpy as np
import pytest

from pixsfm_tpu.base.cameras import Camera
from pixsfm_tpu.localization import (QueryLocalizer,
                                     absolute_pose_estimation,
                                     compute_reprojection_errors)
from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction as synth
from tests.test_feature_reference_ba import featuremetric_scene


def project_all(rec, im):
    cam = rec.cameras[im.camera_id]
    pts, xy = [], []
    for pid, p in rec.points3D.items():
        x_cam = im.world_to_camera(p.xyz)[0]
        if x_cam[2] <= 0.1:
            continue
        pts.append(pid)
        xy.append(cam.img_from_cam(x_cam[:2] / x_cam[2]))
    return pts, np.asarray(xy)


class TestPnP:
    def test_recovers_pose(self, rng):
        rec = synth(n_images=3, n_points=80, noise_px=0.0, seed=11)
        im = rec.images[1]
        cam = rec.cameras[im.camera_id]
        pids, xy = project_all(rec, im)
        X = np.stack([rec.points3D[p].xyz for p in pids])
        out = absolute_pose_estimation(xy, X, cam, max_error_px=4.0)
        assert out["success"]
        assert out["num_inliers"] >= 0.95 * len(xy)
        np.testing.assert_allclose(out["tvec"], im.tvec, atol=1e-2)
        dot = abs(np.dot(out["qvec"] / np.linalg.norm(out["qvec"]),
                         im.qvec / np.linalg.norm(im.qvec)))
        assert dot > 1.0 - 1e-6, f"rotation mismatch, |dot|={dot}"

    def test_robust_to_outliers(self, rng):
        rec = synth(n_images=3, n_points=100, noise_px=0.2, seed=12)
        im = rec.images[2]
        cam = rec.cameras[im.camera_id]
        pids, xy = project_all(rec, im)
        X = np.stack([rec.points3D[p].xyz for p in pids])
        n_out = len(xy) // 4
        xy2 = xy.copy()
        xy2[:n_out] += rng.uniform(50, 200, size=(n_out, 2))
        out = absolute_pose_estimation(xy2, X, cam, max_error_px=6.0)
        assert out["success"]
        np.testing.assert_allclose(out["tvec"], im.tvec, atol=5e-2)
        assert out["num_inliers"] >= 0.9 * (len(xy) - n_out)


class TestQueryLocalizer:
    def test_localize_query(self, rng):
        rec, fset = featuremetric_scene(seed=13, n_images=5, n_points=60)

        class _Mgr:
            num_levels = 1

            def fset(self, i):
                return fset

        # leave image 5 out as the query
        query = rec.images[5]
        q_cam = rec.cameras[query.camera_id]
        q_kps = query.xys.copy()
        p2D_idxs = [i for i, pid in enumerate(query.point3D_ids) if pid >= 0]
        p3D_ids = [int(query.point3D_ids[i]) for i in p2D_idxs]

        # build query fmaps from the feature set (its patches are the scene's)
        q_fmap = fset.get_map(query.name)

        # remove query from reconstruction (tracks keep other views)
        rec2 = rec.copy()
        for p in rec2.points3D.values():
            p.track = [(i, j) for (i, j) in p.track if i != 5]
        del rec2.images[5]
        rec2.points3D = {pid: p for pid, p in rec2.points3D.items()
                         if p.track_length >= 2}
        p2D_idxs = [i for i, pid in zip(p2D_idxs, p3D_ids)
                    if pid in rec2.points3D]
        p3D_ids = [pid for pid in p3D_ids if pid in rec2.points3D]

        loc = QueryLocalizer(
            rec2,
            conf={
                "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
                "target_reference": "robust_mean",
                "references": {"loss": {"name": "cauchy", "params": [0.25]},
                               "iters": 20, "keep_observations": True},
                "QKA": {"apply": True,
                        "optimizer": {"solver": {"max_num_iterations": 20}}},
                "QBA": {"apply": True,
                        "optimizer": {"solver": {"max_num_iterations": 20}}},
            },
            dense_features=_Mgr())

        # perturb query keypoints a bit; QKA should pull them back
        noisy = q_kps.copy()
        noisy[p2D_idxs] += rng.uniform(-1.0, 1.0, size=(len(p2D_idxs), 2))
        out = loc.localize(noisy, p2D_idxs, p3D_ids, q_cam,
                           query_fmaps=[q_fmap])
        assert out["success"]
        assert out["num_inliers"] >= 0.8 * len(p2D_idxs)
        np.testing.assert_allclose(out["tvec"], query.tvec, atol=0.05)

    def test_nearest_references_mode(self, rng):
        rec, fset = featuremetric_scene(seed=14, n_images=4, n_points=30)

        class _Mgr:
            num_levels = 1

            def fset(self, i):
                return fset

        query = rec.images[4]
        q_cam = rec.cameras[query.camera_id]
        q_fmap = fset.get_map(query.name)
        p2D_idxs = [i for i, pid in enumerate(query.point3D_ids) if pid >= 0]
        p3D_ids = [int(query.point3D_ids[i]) for i in p2D_idxs]

        rec2 = rec.copy()
        for p in rec2.points3D.values():
            p.track = [(i, j) for (i, j) in p.track if i != 4]
        del rec2.images[4]
        rec2.points3D = {pid: p for pid, p in rec2.points3D.items()
                         if p.track_length >= 2}
        pairs = [(i, pid) for i, pid in zip(p2D_idxs, p3D_ids)
                 if pid in rec2.points3D]
        p2D_idxs = [a for a, b in pairs]
        p3D_ids = [b for a, b in pairs]

        loc = QueryLocalizer(
            rec2,
            conf={"interpolation": {"mode": "BICUBIC",
                                    "l2_normalize": False},
                  "target_reference": "nearest"},
            dense_features=_Mgr())
        out = loc.localize(query.xys.copy(), p2D_idxs, p3D_ids, q_cam,
                           query_fmaps=[q_fmap])
        assert out["success"]
