"""End-to-end ETH3D triangulation harness on a fully synthetic scene:
unique textures stamped at ground-truth projections -> SIFT detect/match ->
KA -> GT-pose triangulation -> BA -> accuracy/completeness vs the GT cloud
(the real dataset is unavailable in this zero-egress environment)."""

import numpy as np
import PIL.Image
import pytest

from pixsfm_tpu.sfm.synthetic import synthetic_reconstruction


# scene rendering shared with tools/eth3d_synth_matrix.py
from pixsfm_tpu.eval.eth3d.synthetic import render_scene as _render_scene
from pixsfm_tpu.eval.eth3d.synthetic import write_ply as _write_ply


@pytest.mark.parametrize("seed", [5])
def test_eth3d_triangulation_harness(tmp_path, seed):
    pytest.importorskip("cv2")
    rng = np.random.default_rng(seed)
    rec = synthetic_reconstruction(n_images=5, n_points=50, noise_px=0.0,
                                   seed=seed, width=480, height=360,
                                   model="SIMPLE_PINHOLE")
    scene = tmp_path / "synthetic_scene"
    (scene / "images").mkdir(parents=True)
    _render_scene(rec, scene / "images", rng)
    rec.write_text(scene / "dslr_calibration_undistorted")
    _write_ply(scene / "scan_clean.ply",
               np.stack([p.xyz for p in rec.points3D.values()]))

    out = tmp_path / "out"
    out.mkdir()
    conf = {
        "dense_features": {"model": {"name": "image", "grayscale": True},
                           "l2_normalize": False, "max_edge": 480,
                           "patch_size": 8, "dtype": "float32"},
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
        "mapping": {
            "KA": {"strategy": "topological_reference",
                   "optimizer": {"bound": 1.0,
                                 "solver": {"max_num_iterations": 5}}},
            "BA": {"strategy": "geometric",
                   "optimizer": {"refine_focal_length": False,
                                 "refine_extra_params": False,
                                 "solver": {"max_num_iterations": 15,
                                            "use_inner_iterations": False}}},
        },
    }
    from pixsfm_tpu.eval.eth3d.triangulation import run_scene
    # SIFT keypoints sit on the corners of the stamped 15px textures, ~7px
    # from the GT point centers (~0.1 scene units at this focal/depth), so
    # the tolerances are scaled to the texture size — the test validates the
    # harness plumbing (detect/match -> KA -> triangulate -> BA -> metrics),
    # not ETH3D-grade accuracy.
    metrics = run_scene(scene, out, conf=conf,
                        tolerances=(0.05, 0.15, 0.3))
    assert metrics is not None
    assert metrics["num_points"] >= 15, metrics
    assert metrics["mean_reproj_error"] < 3.0, metrics
    assert metrics["accuracy"][2] > 50.0, metrics
    assert metrics["completeness"][2] > 40.0, metrics
    assert (out / "results.json").exists()

    # --- localization harness on the same scene (leave-1-out + pose AUC)
    from pixsfm_tpu.eval.eth3d.localization import run_scene_localization
    loc_conf = dict(conf)
    loc_conf.update({
        "target_reference": "robust_mean",
        "references": {"iters": 10, "keep_observations": True},
        "QKA": {"apply": False},
        "QBA": {"apply": True,
                "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
                "optimizer": {"solver": {"max_num_iterations": 10}}},
    })
    res = run_scene_localization(scene, out, conf=loc_conf, num_holdout=1,
                                 thresholds=(0.05, 0.15, 0.5))
    assert res is not None
    assert res["num_queries"] == 1
    assert np.isfinite(res["median_error_m"]), res
    assert res["median_error_m"] < 0.5, res
    assert (out / "results_localization.json").exists()
