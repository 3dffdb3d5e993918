"""End-to-end demo on the bundled sacre_coeur images (the reference's
demo.ipynb flow): SIFT frontend -> two-view verification -> KA ->
incremental SfM -> featuremetric BA -> localize a held-out query.

Usage:
    python examples/demo_sacre_coeur.py [--dataset DIR] [--output DIR]
        [--config low_memory] [--max_edge 640]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=Path,
                        default=Path("/root/reference/datasets/sacre_coeur"))
    parser.add_argument("--output", type=Path, default=Path("demo_out"))
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--max_edge", type=int, default=640)
    parser.add_argument("--n_images", type=int, default=8)
    args = parser.parse_args()

    import cv2
    import h5py

    from pixsfm_tpu import load_config, logger
    from pixsfm_tpu.base.cameras import Camera
    from pixsfm_tpu.keypoint_adjustment import build_matching_graph
    from pixsfm_tpu.localization import QueryLocalizer
    from pixsfm_tpu.refine_hloc import PixSfM
    from pixsfm_tpu.sfm.mapper import incremental_mapping
    from pixsfm_tpu.sfm.two_view import verify_all_pairs
    from pixsfm_tpu.util.visualize import plot_reconstruction_3d

    image_dir = args.dataset / "mapping"
    names = sorted(p.name for p in image_dir.glob("*.jpg"))[:args.n_images]
    query_name = names.pop()  # hold out the last image as the query
    logger.info("mapping images: %d, query: %s", len(names), query_name)

    sift = cv2.SIFT_create(nfeatures=3000)
    kps, descs, cameras = {}, {}, {}
    for name in names + [query_name]:
        img = cv2.imread(str(image_dir / name), cv2.IMREAD_GRAYSCALE)
        s = args.max_edge / max(img.shape)
        img = cv2.resize(img, None, fx=s, fy=s)
        kp, des = sift.detectAndCompute(img, None)
        kps[name] = np.array([k.pt for k in kp], np.float64) + 0.5
        descs[name] = des
        calib = args.dataset / "ground_truth" / f"calibration_{name[:-4]}.h5"
        if calib.exists():
            with h5py.File(calib, "r") as f:
                K = np.asarray(f["K"])
            h, w = img.shape
            cameras[name] = Camera(-1, "SIMPLE_PINHOLE", w, h,
                                   [K[0, 0] * s, K[0, 2] * s, K[1, 2] * s])

    bf = cv2.BFMatcher(cv2.NORM_L2)
    matches, scores = {}, {}
    all_names = names + [query_name]
    for i in range(len(all_names)):
        for j in range(i + 1, len(all_names)):
            a, b = all_names[i], all_names[j]
            raw = bf.knnMatch(descs[a], descs[b], k=2)
            good = [m for m, n in raw if m.distance < 0.85 * n.distance]
            if len(good) < 20:
                continue
            matches[(a, b)] = np.array([[g.queryIdx, g.trainIdx]
                                        for g in good], np.int64)
            scores[(a, b)] = np.ones(len(good), np.float32)
    matches, scores = verify_all_pairs(matches, kps, scores)
    logger.info("verified pairs: %d", len(matches))

    # mapping only (exclude query pairs from the map graph)
    map_matches = {k: v for k, v in matches.items()
                   if query_name not in k}
    map_scores = {k: scores[k] for k in map_matches}
    graph = build_matching_graph(map_matches, map_scores)

    # photometric refinement shaped like the reference's photometric preset
    # (configs/photometric.yaml): NCC patch-warp BA over identity features
    # with constant extrinsics. check_bounds guards the flat-patch runaway
    # that pointwise 1-channel featuremetric BA exhibits (see
    # pixsfm_tpu.base.interpolation.bounds_violation).
    nodes = [[dx, dy] for dy in (-1.5, -0.5, 0.5, 1.5)
             for dx in (-1.5, -0.5, 0.5, 1.5)]
    conf = load_config(args.config) if args.config else {
        "dense_features": {"model": {"name": "image", "grayscale": True},
                           "l2_normalize": False, "max_edge": args.max_edge,
                           "patch_size": 8, "dtype": "float32"},
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False,
                          "check_bounds": True},
        "mapping": {"KA": {"strategy": "topological_reference",
                           "optimizer": {"bound": 2.0}},
                    "BA": {"strategy": "patch_warp",
                           "interpolation": {
                               "mode": "BICUBIC", "l2_normalize": False,
                               "ncc_normalize": True, "check_bounds": True,
                               "nodes": nodes},
                           "optimizer": {"refine_extra_params": False,
                                         "refine_focal_length": False,
                                         "refine_extrinsics": False}}},
    }
    sfm = PixSfM(conf)

    keypoints = {n: kps[n].copy() for n in names}
    keypoints, _ = sfm.run_ka(keypoints, image_dir, graph=graph)
    rec = incremental_mapping(graph, keypoints, image_dir,
                              cameras={n: cameras[n] for n in names
                                       if n in cameras} or None)
    logger.info("%s, mean reproj err %.3f px", rec,
                rec.mean_reprojection_error())
    sfm.run_ba(rec, image_dir)

    args.output.mkdir(parents=True, exist_ok=True)
    rec.write(args.output / "sparse")
    plot_reconstruction_3d(rec, path=args.output / "reconstruction.html")

    # --- localize the held-out query
    from pixsfm_tpu.localize import build_query_correspondences
    qcam = cameras.get(query_name)
    if qcam is None:
        logger.warning("no GT calibration for query; skipping localization")
        return
    p2D_idxs, p3D_ids = build_query_correspondences(
        rec, query_name, list(matches.keys()), matches)
    logger.info("query correspondences: %d", len(p2D_idxs))
    loc = QueryLocalizer(
        rec, conf={"interpolation": {"mode": "BICUBIC",
                                     "l2_normalize": False},
                   # per-keypoint adjustment needs discriminative (deep)
                   # descriptors; with the 1-channel identity model only the
                   # pose-level QBA refinement is well conditioned
                   "QKA": {"apply": False},
                   "dense_features": conf["dense_features"]
                   if isinstance(conf, dict) else conf.dense_features},
        image_dir=image_dir)
    pose = loc.localize(kps[query_name], p2D_idxs, p3D_ids, qcam,
                        image_path=image_dir / query_name)
    logger.info("query localized: success=%s inliers=%s",
                pose.get("success"), pose.get("num_inliers"))


if __name__ == "__main__":
    main()
