"""Eval metric and aux-subsystem tests."""

import numpy as np
import pytest

from pixsfm_tpu.eval.eth3d.utils import (accuracy_completeness, pose_auc,
                                         read_ply_xyz, create_list_files)


def test_accuracy_completeness_identity():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (500, 3))
    m = accuracy_completeness(pts, pts, [0.01, 0.05])
    assert m["accuracy"] == [100.0, 100.0]
    assert m["completeness"] == [100.0, 100.0]


def test_accuracy_completeness_offset():
    rng = np.random.default_rng(1)
    gt = rng.uniform(-1, 1, (400, 3))
    rec = gt + 0.03  # ~5.2cm offset
    m = accuracy_completeness(rec, gt, [0.01, 0.1])
    assert m["accuracy"][0] < 50.0
    assert m["accuracy"][1] == 100.0


def test_pose_auc():
    errors = [0.001, 0.002, 0.005, 0.05, 1.0]
    aucs = pose_auc(errors, [0.01, 0.1])
    assert 0 < aucs[0] < 100
    assert aucs[1] > aucs[0] * 0.3
    # all perfect
    assert pose_auc([0.0] * 10, [0.01])[0] > 99.0
    # all failed
    assert pose_auc([np.inf] * 10, [0.01])[0] == 0.0


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(2).normal(0, 1, (50, 3)).astype(np.float32)
    path = tmp_path / "cloud.ply"
    with open(path, "wb") as f:
        header = ("ply\nformat binary_little_endian 1.0\n"
                  f"element vertex {len(pts)}\n"
                  "property float x\nproperty float y\nproperty float z\n"
                  "end_header\n")
        f.write(header.encode())
        f.write(pts.tobytes())
    out = read_ply_xyz(path)
    np.testing.assert_allclose(out, pts, atol=1e-6)


def test_pair_list(tmp_path):
    p = tmp_path / "pairs.txt"
    create_list_files(["b", "a", "c"], p)
    from pixsfm_tpu.util.hloc import read_image_pairs
    pairs = read_image_pairs(p)
    assert pairs == [("a", "b"), ("a", "c"), ("b", "c")]


def test_reference_cache_roundtrip(tmp_path):
    from pixsfm_tpu.bundle_adjustment.references import Reference
    from pixsfm_tpu.features.store_references import (load_references_cache,
                                                      write_references_cache)

    rng = np.random.default_rng(3)
    refs = {5: Reference(source=(2, 7), descriptor=rng.normal(0, 1, 16)),
            9: Reference(source=(1, 3), descriptor=rng.normal(0, 1, 16),
                         observations=[(1, 3), (2, 8)],
                         costs=np.array([0.1, 0.4]),
                         track_descriptors=rng.normal(0, 1, (2, 16)))}
    path = tmp_path / "refs.h5"
    write_references_cache(path, [refs])
    out = load_references_cache(path)
    assert len(out) == 1
    np.testing.assert_allclose(out[0][5].descriptor, refs[5].descriptor)
    assert out[0][5].source == (2, 7)
    assert out[0][9].observations == [(1, 3), (2, 8)]
    np.testing.assert_allclose(out[0][9].track_descriptors,
                               refs[9].track_descriptors)


def test_all_config_presets_load():
    from pixsfm_tpu.config import load_config
    from pixsfm_tpu.configs import list_configs

    names = list_configs()
    assert {"default", "low_memory", "norefine", "photometric",
            "pixsfm_eth3d", "pixsfm_eth3d_d2net", "dsift"} <= set(names)
    for name in names:
        conf = load_config(name)
        # each preset must resolve its mapping/localization trees
        if "mapping" in conf:
            _ = conf.mapping.to_dict()
        if "localization" in conf:
            _ = conf.localization.to_dict()


def test_solver_summary_merge():
    from pixsfm_tpu.util.profiling import merge_summaries

    s = merge_summaries([
        {"initial_cost": 10.0, "final_cost": 2.0, "num_problems": 3,
         "iterations": 5, "time": 0.5},
        {"initial_cost": 4.0, "final_cost": 1.0, "num_problems": 2,
         "iterations": 9, "time": 0.25},
    ])
    assert s.initial_cost == 14.0 and s.final_cost == 3.0
    assert s.num_problems == 5 and s.iterations == 9
    assert "cost" in s.report()
