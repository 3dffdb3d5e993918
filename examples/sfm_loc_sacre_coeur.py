"""Combined SfM + localization example (the reference's
examples/sfm+loc_aachen.py flow, scaled to the bundled sacre_coeur scene):

1. SIFT front-end + two-view verification on the mapping images
2. featuremetric KA -> incremental SfM -> featuremetric BA (PixSfM)
3. batch-localize the held-out query images against the refined model
   (QKA -> PnP -> QBA via localize.localize_queries), write poses txt
4. report position errors vs the bundled ground-truth calibration

Aachen itself needs a download (zero egress), so the flow runs on the
reference's own demo dataset; every stage is the same code path the Aachen
pipeline would use (localize.main / refine_hloc.PixSfM.triangulation).

Usage: python examples/sfm_loc_sacre_coeur.py [--n_queries 2]
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
    parser.add_argument("--output", type=Path, default=Path("sfm_loc_out"))
    parser.add_argument("--max_edge", type=int, default=640)
    parser.add_argument("--n_queries", type=int, default=2)
    args = parser.parse_args()

    import cv2
    import h5py

    from pixsfm_tpu import logger
    from pixsfm_tpu.base.cameras import Camera
    from pixsfm_tpu.keypoint_adjustment import build_matching_graph
    from pixsfm_tpu.localization import QueryLocalizer
    from pixsfm_tpu.localize import localize_queries, write_poses_txt
    from pixsfm_tpu.refine_hloc import PixSfM
    from pixsfm_tpu.sfm.mapper import incremental_mapping
    from pixsfm_tpu.sfm.two_view import verify_all_pairs

    image_dir = args.dataset / "mapping"
    all_names = sorted(p.name for p in image_dir.glob("*.jpg"))
    queries = all_names[-args.n_queries:]
    names = all_names[:-args.n_queries]
    logger.info("mapping: %d images, queries: %s", len(names), queries)

    # --- front-end (shared by mapping and queries)
    sift = cv2.SIFT_create(nfeatures=3000)
    bf = cv2.BFMatcher(cv2.NORM_L2)
    kps, descs, cameras, gt_poses = {}, {}, {}, {}
    for name in all_names:
        img = cv2.imread(str(image_dir / name), cv2.IMREAD_GRAYSCALE)
        s = args.max_edge / max(img.shape)
        img = cv2.resize(img, None, fx=s, fy=s)
        kp, des = sift.detectAndCompute(img, None)
        kps[name] = np.array([k.pt for k in kp], np.float64) + 0.5
        descs[name] = des
        calib = args.dataset / "ground_truth" / f"calibration_{name[:-4]}.h5"
        if calib.exists():
            with h5py.File(calib, "r") as f:
                K, R, T = (np.asarray(f[k]) for k in ("K", "R", "T"))
            h, w = img.shape
            cameras[name] = Camera(-1, "SIMPLE_PINHOLE", w, h,
                                   [K[0, 0] * s, K[0, 2] * s, K[1, 2] * s])
            gt_poses[name] = (R, T)

    matches, scores = {}, {}
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

    # --- featuremetric SfM on the mapping images
    map_matches = {k: v for k, v in matches.items()
                   if k[0] in names and k[1] in names}
    graph = build_matching_graph(map_matches,
                                 {k: scores[k] for k in map_matches})
    conf = {
        "dense_features": {"model": {"name": "image", "grayscale": True},
                           "l2_normalize": False, "max_edge": args.max_edge,
                           "patch_size": 8, "dtype": "float32"},
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False,
                          "check_bounds": True},
        "mapping": {"KA": {"strategy": "topological_reference",
                           "optimizer": {"bound": 2.0}},
                    "BA": {"strategy": "geometric"}},
        # localization stage (reference pixsfm/localization defaults)
        "target_reference": "robust_mean",
        "references": {"iters": 10, "keep_observations": True},
        "QKA": {"apply": False},
        "QBA": {"apply": True,
                "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
                "optimizer": {"solver": {"max_num_iterations": 10}}},
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

    # --- batch localization of the held-out queries
    localizer = QueryLocalizer(rec, conf=conf, image_dir=image_dir)
    qlist = [(q, cameras[q]) for q in queries if q in cameras]
    pair_list = [p for p in matches
                 if (p[0] in queries) != (p[1] in queries)]
    kp_q = {q: kps[q] for q in queries}
    results = localize_queries(localizer, qlist, kp_q, pair_list, matches,
                               image_dir=image_dir,
                               covisibility_clustering=False)
    write_poses_txt(args.output / "poses.txt", results)

    # --- evaluate vs GT where available (model frame == GT frame only up to
    # a similarity; report relative-pose errors against a mapping anchor)
    from pixsfm_tpu.base.geometry import quat_to_rotmat
    import jax.numpy as jnp
    n_ok = 0
    for qname, pose in results.items():
        if not pose.get("success"):
            logger.warning("%s: localization failed", qname)
            continue
        n_ok += 1
        logger.info("%s: %d inliers", qname, pose.get("num_inliers", 0))
        if qname not in gt_poses:
            continue
        R_est = np.asarray(quat_to_rotmat(jnp.asarray(
            pose["qvec"] / np.linalg.norm(pose["qvec"]))))
        # relative rotation to each mapped image with GT, vs GT relative
        errs = []
        for mname in names:
            mim = rec.image_by_name(mname)
            if mim is None or mname not in gt_poses:
                continue
            R_m = np.asarray(quat_to_rotmat(jnp.asarray(
                mim.qvec / np.linalg.norm(mim.qvec))))
            dR_est = R_est @ R_m.T
            dR_gt = gt_poses[qname][0] @ gt_poses[mname][0].T
            cos = (np.trace(dR_est @ dR_gt.T) - 1) / 2
            errs.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
        if errs:
            logger.info("%s: mean relative rotation error %.2f deg "
                        "(over %d mapping images)", qname,
                        float(np.mean(errs)), len(errs))
    logger.info("localized %d/%d queries; poses at %s", n_ok, len(qlist),
                args.output / "poses.txt")


if __name__ == "__main__":
    main()
