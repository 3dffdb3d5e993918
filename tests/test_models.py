"""Feature model forward tests (random weights; zero-egress environment)."""

import numpy as np
import pytest


def test_s2dnet_forward_shapes():
    from pixsfm_tpu.features.models.s2dnet import S2DNet

    model = S2DNet({"num_layers": 2, "pretrained": None})
    assert model.output_dims == [128, 128]
    assert model.scales == [1, 4]
    img = np.random.default_rng(0).uniform(0, 1, (1, 64, 96, 3)) \
        .astype(np.float32)
    feats = model(img)
    assert len(feats) == 2
    assert feats[0].shape == (1, 64, 96, 128)
    assert feats[1].shape == (1, 16, 24, 128)


def test_s2dnet_combine():
    from pixsfm_tpu.features.models.s2dnet import S2DNet

    model = S2DNet({"num_layers": 2, "pretrained": None, "combine": True})
    img = np.zeros((1, 32, 32, 3), np.float32)
    feats = model(img)
    assert len(feats) == 1
    assert feats[0].shape == (1, 32, 32, 128)


def test_vggnet_forward():
    from pixsfm_tpu.features.models.vggnet import VGGNet

    model = VGGNet({"num_layers": 1, "pretrained": None})
    assert model.output_dims == [64]
    img = np.zeros((1, 32, 48, 3), np.float32)
    feats = model(img)
    assert feats[0].shape == (1, 32, 48, 64)


def test_dsift_forward():
    from pixsfm_tpu.features.models.dsift import DSIFT

    model = DSIFT({})
    assert model.output_dims == [128]
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (1, 48, 64, 3)).astype(np.float32)
    feats = model(img)
    assert feats[0].shape == (1, 48, 64, 128)
    d = np.asarray(feats[0][0])
    norms = np.linalg.norm(d, axis=-1)
    # rootsift: unit L1 after sqrt -> L2 norm == 1 where gradients exist
    assert np.isfinite(d).all()
    assert (norms[norms > 0.1] < 1.5).all()


def test_extractor_with_s2dnet(tmp_path):
    import PIL.Image
    from pixsfm_tpu.features.extractor import FeatureExtractor

    rng = np.random.default_rng(2)
    img = (rng.uniform(0, 255, (80, 60, 3))).astype(np.uint8)
    path = tmp_path / "img.png"
    PIL.Image.fromarray(img).save(path)
    ex = FeatureExtractor({"model": {"name": "s2dnet", "num_layers": 1,
                                    "pretrained": None},
                           "max_edge": 100, "patch_size": 8,
                           "dtype": "half"})
    kps = np.array([[30.0, 40.0], [10.0, 15.0]])
    fmaps = ex(path, keypoints=kps, as_dict=True)
    assert len(fmaps) == 1
    assert fmaps[0]["patches"].shape == (2, 8, 8, 128)
    assert str(fmaps[0]["patches"].dtype) == "bfloat16"
    # descriptors are L2-normalized per pixel
    n = np.linalg.norm(np.asarray(fmaps[0]["patches"][0],
                                  np.float32), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=2e-2)
