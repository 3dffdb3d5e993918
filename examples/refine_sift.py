"""Refine SIFT keypoints + an existing model, end to end
(counterpart of the reference's examples/refine_sift_aachen.py, using the
built-in OpenCV-SIFT frontend instead of a pre-built COLMAP database).

Usage:
    python examples/refine_sift.py --image_dir <dir> --output_dir <dir> \
        [--config low_memory]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_dir", type=Path, required=True)
    parser.add_argument("--output_dir", type=Path, required=True)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--max_edge", type=int, default=1600)
    parser.add_argument("--n_features", type=int, default=4000)
    args = parser.parse_args()

    import cv2

    from pixsfm_tpu import load_config
    from pixsfm_tpu.keypoint_adjustment import build_matching_graph
    from pixsfm_tpu.refine_hloc import PixSfM
    from pixsfm_tpu.sfm.mapper import incremental_mapping
    from pixsfm_tpu.sfm.two_view import verify_all_pairs

    names = sorted(p.name for p in args.image_dir.iterdir()
                   if p.suffix.lower() in (".jpg", ".jpeg", ".png"))
    sift = cv2.SIFT_create(nfeatures=args.n_features)
    kps, descs = {}, {}
    for name in names:
        img = cv2.imread(str(args.image_dir / name), cv2.IMREAD_GRAYSCALE)
        if max(img.shape) > args.max_edge:
            s = args.max_edge / max(img.shape)
            img = cv2.resize(img, None, fx=s, fy=s)
        kp, des = sift.detectAndCompute(img, None)
        kps[name] = np.array([k.pt for k in kp], np.float64) + 0.5
        descs[name] = des
        print(f"{name}: {len(kp)} keypoints")

    bf = cv2.BFMatcher(cv2.NORM_L2)
    matches, scores = {}, {}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            raw = bf.knnMatch(descs[names[i]], descs[names[j]], k=2)
            good = [m for m, n in raw if m.distance < 0.85 * n.distance]
            if len(good) < 20:
                continue
            matches[(names[i], names[j])] = np.array(
                [[g.queryIdx, g.trainIdx] for g in good], np.int64)
            scores[(names[i], names[j])] = np.ones(len(good), np.float32)
    matches, scores = verify_all_pairs(matches, kps, scores)
    print(f"{len(matches)} verified pairs")

    conf = load_config(args.config) if args.config else None
    sfm = PixSfM(conf)
    graph = build_matching_graph(matches, scores)
    kps, ka_out = sfm.run_ka(kps, args.image_dir, graph=graph)
    rec = incremental_mapping(graph, kps, args.image_dir)
    print(rec)
    ba_out = sfm.run_ba(rec, args.image_dir)
    args.output_dir.mkdir(parents=True, exist_ok=True)
    rec.write(args.output_dir)
    print("mean reprojection error:", rec.mean_reprojection_error())


if __name__ == "__main__":
    main()
