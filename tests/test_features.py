"""Feature storage, H5 cache, extractor, and dense-slicing tests."""

import numpy as np
import pytest

from pixsfm_tpu.features.featuremaps import (FeatureMap, FeaturePatch,
                                             FeatureSet, FeatureView,
                                             kDensePatchId)


def test_patch_coordinate_roundtrip():
    patch = FeaturePatch(np.zeros((16, 16, 3), np.float32),
                         corner=[10, 20], scale=[0.5, 0.5],
                         upsampling_factor=2.0)
    xy = np.array([50.0, 70.0])
    uv = patch.to_pixel_coordinates(xy)
    xy2 = patch.to_image_coordinates(uv)
    np.testing.assert_allclose(xy2, xy, atol=1e-9)


def test_dense_featureview_slicing():
    rng = np.random.default_rng(0)
    H, W, C, ps = 48, 64, 4, 8
    dense = rng.normal(0, 1, (H, W, C)).astype(np.float32)
    fset = FeatureSet(channels=C, patch_size=ps, dtype="float32")
    fmap = FeatureMap(is_sparse=False)
    fmap.patches[kDensePatchId] = FeaturePatch(dense, [0, 0], [1.0, 1.0])
    fset.emplace("img.jpg", fmap)

    kps = np.array([[20.0, 30.0], [5.0, 5.0], [60.0, 40.0]])
    view = FeatureView(fset, {"img.jpg": [0, 1, 2]},
                       keypoints={"img.jpg": kps})
    pf = view.packed
    assert pf.patches.shape == (3, ps, ps, C)
    for i in range(3):
        row = pf.row("img.jpg", i)
        cx, cy = pf.corners[row].astype(int)
        np.testing.assert_array_equal(pf.patches[row],
                                      dense[cy:cy + ps, cx:cx + ps])
        # keypoint lies inside its window (clamped at borders)
        x, y = kps[i]
        assert cx <= x - 0.5 <= cx + ps or cx == 0 or cx == W - ps
        assert cy <= y - 0.5 <= cy + ps or cy == 0 or cy == H - ps


def test_h5_cache_roundtrip(tmp_path):
    from pixsfm_tpu.features.h5cache import (init_cache, load_featuremap,
                                             write_featuremap,
                                             read_cache_metadata)

    rng = np.random.default_rng(1)
    path = tmp_path / "cache.h5"
    init_cache(path, [4], 8, "float32")
    patches = rng.normal(0, 1, (5, 8, 8, 4)).astype(np.float32)
    corners = rng.integers(0, 100, (5, 2))
    write_featuremap(path, "level_0", "sub/dir/img.jpg", patches,
                     [3, 7, 9, 11, 20], corners, np.array([0.5, 0.5]))
    ch, ps, dt = read_cache_metadata(path)
    assert ch == [4] and ps == 8 and dt == "float32"
    fmap = load_featuremap(path, "level_0", "sub/dir/img.jpg",
                           required_ids=[7, 20])
    assert sorted(fmap.patches.keys()) == [7, 20]
    np.testing.assert_array_equal(fmap.patches[7].data, patches[1])
    np.testing.assert_array_equal(fmap.patches[20].data, patches[4])


def test_h5_cache_bf16(tmp_path):
    import ml_dtypes
    from pixsfm_tpu.features.h5cache import (init_cache, load_featuremap,
                                             write_featuremap)

    path = tmp_path / "cache.h5"
    init_cache(path, [2], 4, "half")
    patches = np.ones((2, 4, 4, 2), ml_dtypes.bfloat16)
    write_featuremap(path, "level_0", "a.jpg", patches, [0, 1],
                     np.zeros((2, 2)), np.ones(2))
    fmap = load_featuremap(path, "level_0", "a.jpg")
    assert fmap.patches[0].data.dtype == np.dtype(ml_dtypes.bfloat16)


def test_extractor_image_model(tmp_path):
    import PIL.Image
    from pixsfm_tpu.features.extractor import FeatureExtractor

    rng = np.random.default_rng(2)
    img = (rng.uniform(0, 255, (60, 80, 3))).astype(np.uint8)
    path = tmp_path / "img.png"
    PIL.Image.fromarray(img).save(path)

    ex = FeatureExtractor({"model": {"name": "image"}, "max_edge": 100,
                           "patch_size": 8, "dtype": "float32",
                           "l2_normalize": False})
    kps = np.array([[40.0, 30.0], [10.0, 10.0]])
    fmaps = ex(path, keypoints=kps, as_dict=True)
    assert len(fmaps) == 1
    data = fmaps[0]
    assert data["patches"].shape == (2, 8, 8, 3)
    assert data["metadata"]["is_sparse"]
    # patch center approximates the image intensity at the keypoint
    cx, cy = data["corners"][0]
    win = img[cy:cy + 8, cx:cx + 8] / 255.0
    np.testing.assert_allclose(data["patches"][0], win, atol=1e-5)


def test_extractor_dense_mode(tmp_path):
    import PIL.Image
    from pixsfm_tpu.features.extractor import FeatureExtractor
    from pixsfm_tpu.features.featuremaps import kDensePatchId

    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 255, (40, 50, 3))).astype(np.uint8)
    path = tmp_path / "img.png"
    PIL.Image.fromarray(img).save(path)
    ex = FeatureExtractor({"model": {"name": "image"}, "sparse": False,
                           "dtype": "float32", "l2_normalize": False})
    fmaps = ex(path, as_dict=True)
    assert fmaps[0]["keypoint_ids"] == [kDensePatchId]
    assert fmaps[0]["patches"].shape == (1, 40, 50, 3)
