"""Every torch-checkpoint loader must accept the REAL public file layout —
wrapper dicts, ``module.`` prefixes, and junk keys included — so that when
egress exists, ``tools/fetch_checkpoints.py`` + the stock loaders work with
no further code changes.

Numerical conversion correctness is covered by test_s2dnet_converter.py /
test_detector_converters.py / test_loftr.py (which already simulates the
lightning ``{'state_dict': {'matcher.'+k}}`` wrapper of outdoor_ds.ckpt).
This file checks the layout/wrapper axis with re-keyed random state dicts:
the loader must (a) not raise, and (b) actually move the parameters off the
random init.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _t(kernel):
    """Flax HWIO kernel -> torch OIHW tensor of the same shape."""
    k = np.asarray(kernel)
    return torch.from_numpy(
        np.random.default_rng(0).normal(0, 0.1, k.transpose(3, 2, 0, 1).shape)
        .astype(np.float32))


def _b(bias):
    return torch.from_numpy(np.random.default_rng(1).normal(
        0, 0.1, np.asarray(bias).shape).astype(np.float32))


def _changed(before, after):
    leaves_a = jax.tree_util.tree_leaves(before)
    leaves_b = jax.tree_util.tree_leaves(after)
    return any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(leaves_a, leaves_b))


def test_superpoint_accepts_public_layout(tmp_path):
    """magicleap superpoint_v1.pth: a RAW state_dict (no wrapper), flat
    conv names — plus tolerated 'module.' prefixes."""
    from pixsfm_tpu.features.models.superpoint import (SuperPoint,
                                                       load_torch_superpoint)

    sp = SuperPoint({"pretrained": None})
    P = sp.variables["params"]
    sd = {}
    for n in P:
        sd[f"module.{n}.weight"] = _t(P[n]["kernel"])
        sd[f"module.{n}.bias"] = _b(P[n]["bias"])
    pth = tmp_path / "superpoint_v1.pth"
    torch.save(sd, pth)
    out = load_torch_superpoint(pth, sp.variables)
    assert _changed(sp.variables, out)


def test_r2d2_accepts_public_layout(tmp_path):
    """naver r2d2_WASF_N16.pt: ``{'net': 'Quad_L2Net_ConfCFS(...)',
    'state_dict': {...}}`` with ops.N ModuleList keys, BatchNorm running
    stats and num_batches_tracked junk entries."""
    from pixsfm_tpu.features.models.r2d2 import (R2D2, R2D2_CONV_PLAN,
                                                 load_torch_r2d2)

    net = R2D2({"pretrained": None})
    P = net.variables["params"]
    S = net.variables["batch_stats"]
    sd = {}
    idx = 0
    for i, (ch, k, d, use_bn, use_relu) in enumerate(R2D2_CONV_PLAN):
        sd[f"ops.{idx}.weight"] = _t(P[f"conv{i}"]["kernel"])
        sd[f"ops.{idx}.bias"] = _b(P[f"conv{i}"]["bias"])
        idx += 1
        if use_bn:
            sd[f"ops.{idx}.running_mean"] = _b(S[f"bn{i}"]["mean"])
            sd[f"ops.{idx}.running_var"] = torch.abs(
                _b(S[f"bn{i}"]["var"])) + 1.0
            sd[f"ops.{idx}.num_batches_tracked"] = torch.tensor(1000)
            idx += 1
        if use_relu:
            idx += 1
    for head in ("clf", "sal"):
        sd[f"{head}.weight"] = _t(P[head]["kernel"])
        sd[f"{head}.bias"] = _b(P[head]["bias"])
    pth = tmp_path / "r2d2_WASF_N16.pt"
    torch.save({"net": "Quad_L2Net_ConfCFS(dim=128)", "state_dict": sd}, pth)
    out = load_torch_r2d2(pth, net.variables)
    assert _changed(net.variables, out)


def test_d2net_accepts_public_layout(tmp_path):
    """mihaidusmanu d2_tf.pth: ``{'model': {...}}`` with
    dense_feature_extraction.model.N Sequential-slot keys."""
    from pixsfm_tpu.features.models.d2net import (D2Net, D2NET_CONV_PLAN,
                                                  load_torch_d2net)

    net = D2Net({"pretrained": None})
    P = net.variables["params"]
    sd = {}
    slot = 0
    for i, (ch, d, relu, pool) in enumerate(D2NET_CONV_PLAN):
        sd[f"dense_feature_extraction.model.{slot}.weight"] = \
            _t(P[f"conv{i}"]["kernel"])
        sd[f"dense_feature_extraction.model.{slot}.bias"] = \
            _b(P[f"conv{i}"]["bias"])
        slot += 1
        if relu:
            slot += 1
        if pool is not None:
            slot += 1
    pth = tmp_path / "d2_tf.pth"
    torch.save({"model": sd}, pth)
    out = load_torch_d2net(pth, net.variables)
    assert _changed(net.variables, out)


def test_s2dnet_accepts_public_layout(tmp_path):
    """ECCV'20 s2dnet_weights.pth: ``{'state_dict': {...}, ...extras}`` with
    torchvision vgg16.features encoder indices and
    adaptation_layers.adap_layer_i.{0,2} keys."""
    from pixsfm_tpu.features.models.s2dnet import (HYPERCOLUMN_LAYERS,
                                                   S2DNet, VGG16_LAYERS,
                                                   load_torch_s2dnet)

    net = S2DNet({"num_layers": 3, "pretrained": None})
    P = net.variables["params"]
    sd = {}
    idx = 0
    for name, ch in VGG16_LAYERS:
        if name.startswith("pool"):
            idx += 1
            continue
        if name in P:
            sd[f"encoder.{idx}.weight"] = _t(P[name]["kernel"])
            sd[f"encoder.{idx}.bias"] = _b(P[name]["bias"])
        idx += 2
    for i in range(len(HYPERCOLUMN_LAYERS)):
        for j, flax_name in ((0, f"adap{i}_conv1"), (2, f"adap{i}_conv2")):
            if flax_name in P:
                sd[f"adaptation_layers.adap_layer_{i}.{j}.weight"] = \
                    _t(P[flax_name]["kernel"])
                sd[f"adaptation_layers.adap_layer_{i}.{j}.bias"] = \
                    _b(P[flax_name]["bias"])
    pth = tmp_path / "s2dnet_weights.pth"
    torch.save({"state_dict": sd, "epoch": 30, "arch": "s2dnet"}, pth)
    out = load_torch_s2dnet(pth, net.variables, tuple(HYPERCOLUMN_LAYERS))
    assert _changed(net.variables, out)


def test_fetch_tool_covers_all_models():
    """The fetch tool must know every model family + its auto-load file."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import fetch_checkpoints as fc

    assert set(fc.SPECS) == {"s2dnet", "superpoint", "r2d2", "d2net",
                             "loftr"}
    names = {fname for fname, _ in fc.SPECS.values()}
    assert names == {"s2dnet_weights.pth", "superpoint_v1.pth",
                     "r2d2_WASF_N16.pt", "d2_tf.pth", "outdoor_ds.ckpt"}
