"""End-to-end pipeline smoke test on the bundled sacre_coeur images
(reference datasets/sacre_coeur — the reference's demo.ipynb flow), with OpenCV
SIFT as the keypoint/matching frontend and identity image features (the
reference's `image` model / norefine-style decoupling from deep descriptors).
"""

from pathlib import Path

import numpy as np
import pytest

DATASET = Path("/root/reference/datasets/sacre_coeur/mapping")

pytestmark = [
    pytest.mark.skipif(not DATASET.exists(),
                       reason="sacre_coeur dataset unavailable"),
    pytest.mark.heavy,  # run via tools/run_suite.sh heavy lane
]


@pytest.fixture(scope="module")
def sift_scene(tmp_path_factory):
    import cv2

    import h5py
    from pixsfm_tpu.base.cameras import Camera

    tmp = tmp_path_factory.mktemp("sacre")
    names = sorted(p.name for p in DATASET.glob("*.jpg"))[:6]
    assert len(names) >= 3

    max_edge = 640
    sift = cv2.SIFT_create(nfeatures=3000)
    kps, descs, sizes, cameras = {}, {}, {}, {}
    img_dir = tmp / "images"
    img_dir.mkdir()
    for name in names:
        img = cv2.imread(str(DATASET / name), cv2.IMREAD_GRAYSCALE)
        s = max_edge / max(img.shape)
        img = cv2.resize(img, None, fx=s, fy=s)
        cv2.imwrite(str(img_dir / name), img)
        kp, des = sift.detectAndCompute(img, None)
        kps[name] = np.array([k.pt for k in kp], np.float64)
        descs[name] = des
        sizes[name] = img.shape[::-1]
        # ground-truth intrinsics (known-camera SfM path, as with hloc+EXIF)
        calib = DATASET.parent / "ground_truth" / \
            f"calibration_{name[:-4]}.h5"
        if calib.exists():
            with h5py.File(calib, "r") as f:
                K = np.asarray(f["K"])
            w, h = sizes[name]
            cameras[name] = Camera(-1, "SIMPLE_PINHOLE", w, h,
                                   [K[0, 0] * s, K[0, 2] * s, K[1, 2] * s])

    bf = cv2.BFMatcher(cv2.NORM_L2)
    pairs, matches, scores = [], {}, {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            raw = bf.knnMatch(descs[names[i]], descs[names[j]], k=2)
            good = [m for m, n in raw if m.distance < 0.85 * n.distance]
            if len(good) < 30:
                continue
            m = np.array([[g.queryIdx, g.trainIdx] for g in good], np.int64)
            pairs.append((names[i], names[j]))
            matches[(names[i], names[j])] = m
            scores[(names[i], names[j])] = np.ones(len(m), np.float32)
    # geometric verification (hloc/COLMAP two-view geometry equivalent)
    from pixsfm_tpu.sfm.two_view import verify_all_pairs
    matches, scores = verify_all_pairs(matches, kps, scores)
    pairs = list(matches.keys())
    assert len(pairs) >= 3
    return dict(tmp=tmp, names=names, img_dir=img_dir, kps=kps,
                pairs=pairs, matches=matches, scores=scores,
                cameras=cameras)


def test_ka_and_mapping_e2e(sift_scene):
    from pixsfm_tpu.refine_hloc import PixSfM
    from pixsfm_tpu.keypoint_adjustment import build_matching_graph
    from pixsfm_tpu.sfm.mapper import incremental_mapping

    conf = {
        "dense_features": {"model": {"name": "image", "grayscale": True},
                           "l2_normalize": False, "max_edge": 640,
                           "patch_size": 8, "dtype": "float32"},
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
        "mapping": {
            "KA": {"strategy": "topological_reference",
                   "optimizer": {"bound": 2.0,
                                 "solver": {"max_num_iterations": 20}}},
            "BA": {"strategy": "geometric",
                   "optimizer": {"refine_principal_point": False,
                                 "solver": {"max_num_iterations": 20,
                                            "use_inner_iterations": False}}},
        },
    }
    sfm = PixSfM(conf)
    keypoints = {n: k.copy() + 0.5 for n, k in sift_scene["kps"].items()}
    graph = build_matching_graph(sift_scene["matches"],
                                 sift_scene["scores"])

    kp_before = {n: k.copy() for n, k in keypoints.items()}
    keypoints, ka_out = sfm.run_ka(keypoints, sift_scene["img_dir"],
                                   graph=graph)
    # KA must have moved some keypoints, but stay in the per-coordinate
    # 2px box (the reference's bound is a box, keypoint_optimizer.h:127-153,
    # so Euclidean motion can reach sqrt(2)*bound)
    moved = np.concatenate([
        np.abs(keypoints[n] - kp_before[n]).max(axis=1)
        for n in sift_scene["names"]])
    assert moved.max() <= 2.0 + 1e-3
    assert (moved > 1e-4).any()

    cams = {n: c for n, c in sift_scene["cameras"].items()}
    rec = incremental_mapping(graph, keypoints, sift_scene["img_dir"],
                              camera_model="SIMPLE_RADIAL",
                              cameras=cams or None)
    assert rec.num_reg_images >= 3
    assert len(rec.points3D) >= 50
    assert rec.mean_reprojection_error() < 4.0

    # featuremetric BA on top (identity features)
    out = sfm.run_ba(rec, sift_scene["img_dir"])
    assert rec.mean_reprojection_error() < 5.0


def test_hloc_roundtrip_files(sift_scene, tmp_path):
    from pixsfm_tpu.util.hloc import (read_keypoints_hloc,
                                      read_matches_hloc,
                                      write_keypoints_hloc,
                                      write_matches_hloc,
                                      write_image_pairs, read_image_pairs)

    kp_path = tmp_path / "feats.h5"
    match_path = tmp_path / "matches.h5"
    pairs_path = tmp_path / "pairs.txt"
    write_keypoints_hloc(kp_path, sift_scene["kps"])
    write_image_pairs(pairs_path, sift_scene["pairs"])
    ms = [sift_scene["matches"][p] for p in sift_scene["pairs"]]
    ss = [sift_scene["scores"][p] for p in sift_scene["pairs"]]
    write_matches_hloc(match_path, sift_scene["pairs"], ms, ss)

    kps = read_keypoints_hloc(kp_path)
    for n in sift_scene["names"]:
        np.testing.assert_allclose(kps[n], sift_scene["kps"][n])
    pairs = read_image_pairs(pairs_path)
    assert pairs == [tuple(p) for p in sift_scene["pairs"]]
    m2, s2 = read_matches_hloc(match_path, pairs)
    for a, b in zip(m2, ms):
        np.testing.assert_array_equal(np.sort(a, axis=0), np.sort(b, axis=0))
