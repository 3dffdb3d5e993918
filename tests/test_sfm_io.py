"""Reconstruction IO (COLMAP text/binary), database IO, and the triangulation
pipeline on synthetic data."""

import numpy as np
import pytest

from pixsfm_tpu.sfm import Reconstruction, synthetic_reconstruction


def assert_recs_equal(a: Reconstruction, b: Reconstruction, atol=1e-9):
    assert set(a.cameras) == set(b.cameras)
    for cid in a.cameras:
        assert a.cameras[cid].model == b.cameras[cid].model
        np.testing.assert_allclose(a.cameras[cid].params,
                                   b.cameras[cid].params, atol=atol)
    assert set(a.images) == set(b.images)
    for iid in a.images:
        np.testing.assert_allclose(a.images[iid].qvec, b.images[iid].qvec,
                                   atol=atol)
        np.testing.assert_allclose(a.images[iid].tvec, b.images[iid].tvec,
                                   atol=atol)
        np.testing.assert_allclose(a.images[iid].xys, b.images[iid].xys,
                                   atol=atol)
        np.testing.assert_array_equal(a.images[iid].point3D_ids,
                                      b.images[iid].point3D_ids)
    assert set(a.points3D) == set(b.points3D)
    for pid in a.points3D:
        np.testing.assert_allclose(a.points3D[pid].xyz, b.points3D[pid].xyz,
                                   atol=atol)
        assert a.points3D[pid].track == b.points3D[pid].track


def test_binary_roundtrip(tmp_path):
    rec = synthetic_reconstruction(n_images=3, n_points=30, seed=5)
    rec.write_binary(tmp_path / "model")
    rec2 = Reconstruction.read_binary(tmp_path / "model")
    assert_recs_equal(rec, rec2)


def test_text_roundtrip(tmp_path):
    rec = synthetic_reconstruction(n_images=3, n_points=30, seed=6)
    rec.write_text(tmp_path / "model")
    rec2 = Reconstruction.read_text(tmp_path / "model")
    assert_recs_equal(rec, rec2, atol=1e-12)


def test_read_auto_detects_format(tmp_path):
    rec = synthetic_reconstruction(n_images=2, n_points=10, seed=7)
    rec.write(tmp_path / "bin_model", binary=True)
    rec.write(tmp_path / "txt_model", binary=False)
    assert Reconstruction.read(tmp_path / "bin_model").points3D.keys() == \
        rec.points3D.keys()
    assert Reconstruction.read(tmp_path / "txt_model").points3D.keys() == \
        rec.points3D.keys()


def test_database_roundtrip(tmp_path):
    from pixsfm_tpu.util.database import COLMAPDatabase
    from pixsfm_tpu.util.colmap import (read_keypoints_from_db,
                                        read_matches_from_db,
                                        write_keypoints_to_db)

    db_path = tmp_path / "db.db"
    db = COLMAPDatabase.connect(db_path)
    db.create_tables()
    cam = db.add_camera(2, 640, 480, [500.0, 320, 240, 0.0])
    i1 = db.add_image("a.jpg", cam)
    i2 = db.add_image("b.jpg", cam)
    rng = np.random.default_rng(0)
    kp1 = rng.uniform(0, 640, (50, 2)).astype(np.float32)
    kp2 = rng.uniform(0, 640, (40, 2)).astype(np.float32)
    db.add_keypoints(i1, kp1)
    db.add_keypoints(i2, kp2)
    m = np.stack([np.arange(20), np.arange(20) + 5], axis=1)
    db.add_matches(i1, i2, m)
    db.commit()
    db.close()

    kps = read_keypoints_from_db(db_path)
    np.testing.assert_allclose(kps["a.jpg"], kp1[:, :2], atol=1e-6)
    pairs, matches, scores = read_matches_from_db(db_path)
    assert pairs == [("a.jpg", "b.jpg")]
    np.testing.assert_array_equal(matches[0], m)

    kps["a.jpg"] = kps["a.jpg"] + 1.0
    write_keypoints_to_db(db_path, kps)
    kps2 = read_keypoints_from_db(db_path)
    np.testing.assert_allclose(kps2["a.jpg"], kp1[:, :2] + 1.0, atol=1e-5)


def test_triangulation_pipeline_synthetic(tmp_path):
    """GT poses + noisy 2D observations -> triangulated points near GT."""
    from pixsfm_tpu.base.graph import Graph
    from pixsfm_tpu.sfm.triangulation import triangulate_reconstruction

    rec = synthetic_reconstruction(n_images=4, n_points=50, noise_px=0.3,
                                   seed=8)
    gt_points = {pid: p.xyz.copy() for pid, p in rec.points3D.items()}

    # build a match graph from the GT tracks
    graph = Graph()
    keypoints = {im.name: im.xys.copy() for im in rec.images.values()}
    for pid, p in rec.points3D.items():
        track = p.track
        for (i1, k1), (i2, k2) in zip(track[:-1], track[1:]):
            graph.register_matches(rec.images[i1].name, rec.images[i2].name,
                                   np.array([[k1, k2]]))

    ref = rec.copy()
    ref.points3D.clear()
    out = triangulate_reconstruction(ref, graph, keypoints,
                                     max_reproj_error=3.0)
    assert len(out.points3D) >= 0.8 * len(gt_points)
    # each triangulated point should be near some GT point
    gt = np.stack(list(gt_points.values()))
    for p in out.points3D.values():
        d = np.linalg.norm(gt - p.xyz, axis=1).min()
        assert d < 0.05, f"triangulated point {d} from GT"
