"""File-based pipeline contracts: refine_keypoints (hloc H5 round-trip with the
±0.5px shift) and triangulation (KA -> triangulate -> BA -> model on disk) on a
fully synthetic scene with generated images."""

from pathlib import Path

import numpy as np
import PIL.Image
import pytest

from pixsfm_tpu.refine_hloc import PixSfM
from pixsfm_tpu.sfm.model import Reconstruction
from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction
from pixsfm_tpu.util.hloc import (read_keypoints_hloc, write_image_pairs,
                                  write_keypoints_hloc, write_matches_hloc)


@pytest.fixture(scope="module")
def file_scene(tmp_path_factory):
    """Synthetic reconstruction + noise images on disk + hloc-format files."""
    tmp = tmp_path_factory.mktemp("filescene")
    rec = synthetic_reconstruction(n_images=4, n_points=40, noise_px=0.0,
                                   seed=41, width=320, height=240)
    image_dir = tmp / "images"
    image_dir.mkdir()
    rng = np.random.default_rng(0)
    for im in rec.images.values():
        cam = rec.cameras[im.camera_id]
        img = rng.uniform(0, 255, (cam.height, cam.width, 3))
        PIL.Image.fromarray(img.astype(np.uint8)).save(image_dir / im.name)

    # hloc files: keypoints (hloc convention = colmap - 0.5) and matches
    keypoints = {im.name: im.xys - 0.5 for im in rec.images.values()}
    write_keypoints_hloc(tmp / "feats.h5", keypoints)

    pairs, matches = [], []
    images = sorted(rec.images.values(), key=lambda im: im.image_id)
    for i in range(len(images)):
        for j in range(i + 1, len(images)):
            a, b = images[i], images[j]
            m = []
            for pid, p in rec.points3D.items():
                ka = [k for (iid, k) in p.track if iid == a.image_id]
                kb = [k for (iid, k) in p.track if iid == b.image_id]
                if ka and kb:
                    m.append([ka[0], kb[0]])
            if len(m) >= 8:
                pairs.append((a.name, b.name))
                matches.append(np.asarray(m, np.int64))
    write_image_pairs(tmp / "pairs.txt", pairs)
    write_matches_hloc(tmp / "matches.h5", pairs, matches)

    gt_dir = tmp / "gt_model"
    rec.write_text(gt_dir)
    return dict(tmp=tmp, rec=rec, image_dir=image_dir)


def _conf(max_edge):
    return {
        "dense_features": {"model": {"name": "image", "grayscale": True},
                           "l2_normalize": False, "max_edge": max_edge,
                           "patch_size": 8, "dtype": "float32"},
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
        "mapping": {
            "KA": {"strategy": "topological_reference",
                   "optimizer": {"bound": 1.0,
                                 "solver": {"max_num_iterations": 5}}},
            "BA": {"strategy": "geometric",
                   "optimizer": {"refine_focal_length": False,
                                 "refine_extra_params": False,
                                 "solver": {"max_num_iterations": 10,
                                            "use_inner_iterations": False}}},
        },
    }


def test_refine_keypoints_file_roundtrip(file_scene):
    tmp = file_scene["tmp"]
    rec = file_scene["rec"]
    sfm = PixSfM(_conf(rec.cameras[1].width))
    out_path = tmp / "feats_refined.h5"
    kps, outputs = sfm.refine_keypoints(
        out_path, tmp / "feats.h5", file_scene["image_dir"],
        tmp / "pairs.txt", tmp / "matches.h5")
    assert out_path.exists()
    refined = read_keypoints_hloc(out_path)
    for im in rec.images.values():
        assert refined[im.name].shape == im.xys.shape
        # hloc convention restored on disk (within the KA bound of the input)
        assert np.abs(refined[im.name] - (im.xys - 0.5)).max() < 1.5


def test_triangulation_pipeline_files(file_scene):
    tmp = file_scene["tmp"]
    rec = file_scene["rec"]
    sfm = PixSfM(_conf(rec.cameras[1].width))
    out_dir = tmp / "triangulated"
    new_rec, outputs = sfm.triangulation(
        out_dir, tmp / "gt_model", file_scene["image_dir"],
        tmp / "pairs.txt", tmp / "feats.h5", tmp / "matches.h5")
    assert (out_dir / "points3D.bin").exists()
    assert "KA" in outputs and "BA" in outputs
    assert len(new_rec.points3D) >= 0.7 * len(rec.points3D)
    # triangulated points near the GT structure
    gt = np.stack([p.xyz for p in rec.points3D.values()])
    errs = []
    for p in new_rec.points3D.values():
        errs.append(np.linalg.norm(gt - p.xyz, axis=1).min())
    assert np.median(errs) < 0.1
    # model re-loadable
    rt = Reconstruction.read(out_dir)
    assert len(rt.points3D) == len(new_rec.points3D)
