import pytest

from pixsfm_tpu.config import DictConfig, OmegaConf, merge


def test_merge_recursive():
    a = {"x": 1, "sub": {"a": 1, "b": 2}}
    b = {"sub": {"b": 3, "c": 4}, "y": 2}
    m = merge(a, b)
    assert m.to_dict() == {"x": 1, "sub": {"a": 1, "b": 3, "c": 4}, "y": 2}


def test_attribute_access():
    c = DictConfig({"a": {"b": {"c": 5}}})
    assert c.a.b.c == 5
    c.a.b.c = 7
    assert c["a"]["b"]["c"] == 7


def test_dotlist():
    c = OmegaConf.from_dotlist(["a.b=3", "a.c=hello", "d=[1,2]", "e=null",
                               "f=true"])
    assert c.a.b == 3
    assert c.a.c == "hello"
    assert c.d == [1, 2]
    assert c.e is None
    assert c.f is True


def test_interpolation_absolute():
    c = DictConfig({
        "interpolation": {"mode": "BICUBIC"},
        "mapping": {"interpolation": "${interpolation}"},
    })
    assert c.mapping.interpolation.mode == "BICUBIC"


def test_interpolation_relative():
    # ``${..interpolation}``: one level up from the referencing node.
    c = DictConfig({
        "mapping": {
            "interpolation": {"mode": "BILINEAR"},
            "KA": {"interpolation": "${..interpolation}"},
        },
    })
    assert c.mapping.KA.interpolation.mode == "BILINEAR"


def test_interpolation_survives_merge():
    base = DictConfig({
        "interpolation": {"mode": "BICUBIC"},
        "mapping": {"KA": {"interpolation": "${..interpolation}",
                           "bound": 4.0}},
    })
    override = {"interpolation": {"mode": "BILINEAR"}}
    m = merge(base, override)
    # merged root interpolation propagates through the reference
    assert m.mapping.KA.interpolation.mode == "BILINEAR"
    assert m.mapping.KA.bound == 4.0


def test_default_yaml_loads():
    from pixsfm_tpu.config import load_config
    conf = load_config("default")
    assert conf.mapping.KA.strategy == "featuremetric"
    assert conf.mapping.KA.interpolation.mode == "BICUBIC"
    assert conf.mapping.BA.optimizer.loss.name == "cauchy"
    assert conf.dense_features.model.name == "s2dnet"


def test_pixsfm_interpolation_precedence():
    """Top-level interpolation flows into KA/BA strategy confs (the reference
    wires this with ${..interpolation}); an explicit per-strategy block still
    wins; defaults apply otherwise."""
    from pixsfm_tpu.refine_colmap import PixSfM

    sfm = PixSfM({
        "dense_features": {"model": {"name": "image", "grayscale": True}},
        "interpolation": {"mode": "BICUBIC", "l2_normalize": False},
        "mapping": {"KA": {"strategy": "topological_reference"},
                    "BA": {"strategy": "feature_reference"}}})
    assert sfm.bundle_adjuster.conf.interpolation.l2_normalize is False
    assert sfm.keypoint_adjuster.conf.interpolation.l2_normalize is False

    sfm2 = PixSfM({
        "dense_features": {"model": {"name": "image", "grayscale": True}},
        "interpolation": {"l2_normalize": False},
        "mapping": {"BA": {"interpolation": {"l2_normalize": True}}}})
    assert sfm2.bundle_adjuster.conf.interpolation.l2_normalize is True
    assert sfm2.keypoint_adjuster.conf.interpolation.l2_normalize is False

    sfm3 = PixSfM({"dense_features": {"model": {"name": "image",
                                                "grayscale": True}}})
    assert sfm3.bundle_adjuster.conf.interpolation.l2_normalize is True
