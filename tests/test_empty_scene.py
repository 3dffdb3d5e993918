"""Empty-problem robustness: a detector that finds zero keypoints (or a
matcher with zero surviving matches) must flow through KA -> triangulation ->
BA as a graceful no-op, not a shape error.

Regression for the ETH3D synthetic matrix run where random-weight r2d2/loftr
produced empty match graphs and KA crashed on a (0,)/(0,2) broadcast
(keypoint_adjustment/main.py node_data on zero nodes). The reference's
ParallelOptimizer over zero subsets is a silent no-op
(base/src/parallel_optimizer.h:70-216); we mirror that contract.
"""

import numpy as np
import pytest

from pixsfm_tpu.keypoint_adjustment import build_matching_graph
from pixsfm_tpu.keypoint_adjustment.main import find_problem_labels
from pixsfm_tpu.sfm.model import Camera, Image, Reconstruction
from pixsfm_tpu.sfm.triangulation import triangulate_reconstruction


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("empty_imgs")
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(d / f"im{i}.jpg"),
                    rng.integers(0, 255, (32, 32, 3)).astype(np.uint8))
    return d


def _conf(ka_strategy):
    return {"dense_features": {"model": {"name": "image", "grayscale": True},
                               "l2_normalize": False, "max_edge": 64,
                               "patch_size": 8, "dtype": "float32"},
            "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
            "mapping": {"KA": {"strategy": ka_strategy},
                        "BA": {"strategy": "geometric"}}}


def test_find_problem_labels_empty():
    labels, bins = find_problem_labels([], 50)
    assert labels == [] and bins == []


@pytest.mark.parametrize("ka_strategy",
                         ["topological_reference", "featuremetric"])
def test_empty_scene_ka_tri_ba(image_dir, ka_strategy):
    from pixsfm_tpu.refine_hloc import PixSfM

    names = [f"im{i}.jpg" for i in range(3)]
    kps = {n: np.zeros((0, 2), np.float64) for n in names}
    graph = build_matching_graph({}, {})

    sfm = PixSfM(_conf(ka_strategy))
    kps2, out = sfm.run_ka(kps, image_dir, graph=graph)
    assert out["num_problems"] == [0]
    assert all(v.shape == (0, 2) for v in kps2.values())

    gt = Reconstruction()
    gt.add_camera(Camera(1, "SIMPLE_PINHOLE", 32, 32,
                         np.array([30.0, 16.0, 16.0])))
    for i, n in enumerate(names):
        im = Image(i + 1, n, 1, np.array([1.0, 0, 0, 0]),
                   np.array([0.0, 0, float(i)]))
        im.xys = np.zeros((0, 2))
        im.point3D_ids = np.zeros((0,), np.int64)
        gt.add_image(im)
    rec = triangulate_reconstruction(gt, graph, kps2)
    assert len(rec.points3D) == 0
    assert rec.mean_reprojection_error() == 0.0

    ba_out = sfm.run_ba(rec, image_dir)
    assert ba_out["iterations"] == [0]
    assert ba_out["final_cost"] == [0.0]
