"""Functional tests of the learned detector/matcher front-end.

No pretrained weights exist in this environment, so correctness is checked
through *translation equivariance*: a convnet detector applied to an image
cyclically shifted by a multiple of its stride produces shifted detections
with identical descriptors — so detect + mutual-NN matching across the pair
must recover the shift. This exercises the full front-end (image IO, padding,
static-K detection, masked device matching, coordinate conventions) without
requiring descriptor quality."""

from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pixsfm_tpu.features.detectors import (  # noqa: E402
    detect_and_match_dir, mutual_nn_ratio_match)


def _write_pair(tmp_path: Path, shift=(16, 8), size=(128, 160), seed=0):
    """Smooth random texture + its cyclic shift (dy, dx)."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (size[0] // 8, size[1] // 8, 3))
    img = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_CUBIC)
    img = np.clip(img, 0, 1)
    img2 = np.roll(img, shift, axis=(0, 1))
    for name, a in (("a.png", img), ("b.png", img2)):
        cv2.imwrite(str(tmp_path / name),
                    cv2.cvtColor((a * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
    return ["a.png", "b.png"]


@pytest.mark.parametrize("method,conf,stride_shift", [
    ("superpoint", {"pretrained": None, "keypoint_threshold": 1e-4,
                    "max_keypoints": 256}, (16, 8)),
    ("r2d2", {"pretrained": None, "reliability_threshold": 0.0,
              "repeatability_threshold": 0.0, "max_keypoints": 256}, (16, 8)),
    ("d2net", {"pretrained": None, "max_keypoints": 256}, (16, 8)),
])
def test_learned_detector_recovers_shift(tmp_path, method, conf,
                                         stride_shift):
    names = _write_pair(tmp_path, shift=stride_shift)
    kps, matches, scores = detect_and_match_dir(
        tmp_path, names, method=method, max_edge=4096, detector_conf=conf,
        ratio=0.99)
    key = (names[0], names[1])
    assert key in matches, f"no matches survived for {method}"
    m = matches[key]
    assert len(m) >= 10
    # displacement of matched keypoints == the cyclic shift (dx, dy),
    # for the (majority of) keypoints away from the wrap-around seam
    d = kps[names[1]][m[:, 1]] - kps[names[0]][m[:, 0]]
    target = np.array([stride_shift[1], stride_shift[0]], float)
    good = np.all(np.abs(d - target) < 1.5, axis=1)
    assert good.mean() > 0.6, (
        f"{method}: only {good.mean():.0%} of matches recover the shift")


def test_mutual_nn_ratio_match_masks_padding():
    rng = np.random.default_rng(1)
    d = rng.normal(0, 1, (32, 16)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # second set: same descriptors but rows 16+ are invalid padding
    v1 = np.ones(32, bool)
    v2 = np.zeros(32, bool)
    v2[:16] = True
    pairs, scores = mutual_nn_ratio_match(d, d, v1, v2, ratio=0.99)
    assert len(pairs) == 16
    assert (pairs[:, 0] == pairs[:, 1]).all()
    assert (pairs[:, 0] < 16).all()
    np.testing.assert_allclose(scores, 1.0, atol=1e-5)


def test_sift_path_full_resolution_coords(tmp_path):
    """SIFT detections on a downscaled image must come back in original
    coordinates (the hloc convention the KA/BA stages rely on)."""
    rng = np.random.default_rng(2)
    img = (rng.uniform(0, 255, (400, 520)) > 128).astype(np.uint8) * 255
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    cv2.imwrite(str(tmp_path / "big.png"), img)
    from pixsfm_tpu.features.detectors import detect_directory
    kps, descs, valid = detect_directory(tmp_path, ["big.png"],
                                         method="sift", max_edge=260)
    k = kps["big.png"]
    assert len(k) > 20
    # detections live on the full-res canvas, and use the sub-pixel range
    # only reachable after the 2x upscale back
    assert k[:, 0].max() > 260 and k[:, 1].max() > 200
