"""Numerical verification of the torch->flax S2DNet weight converter.

The reference ships pretrained weights as a torch state_dict whose layout is
fixed by its module structure (reference pixsfm/features/models/s2dnet.py:80-99:
``encoder.{N}.*`` with N = child index in torchvision ``vgg16().features``, and
``adaptation_layers.adap_layer_{i}.{0,2,3}.*`` = 1x1 conv / 5x5 conv /
BatchNorm2d per hypercolumn, s2dnet.py:36-44). Zero egress blocks the real
checkpoint, so this test builds a torch model with that exact state_dict
layout, randomly initializes it (including BatchNorm running stats), saves a
``.pth``, runs ``load_torch_s2dnet``, and asserts the Flax forward matches the
torch forward to float32 precision. When the real weights are dropped in
(tools/fetch_s2dnet_weights.py), the same converter path runs untouched.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from torch import nn  # noqa: E402

from pixsfm_tpu.features.models.s2dnet import (  # noqa: E402
    HYPERCOLUMN_LAYERS, IMAGENET_MEAN, IMAGENET_STD, S2DNet, VGG16_LAYERS,
    load_torch_s2dnet)

# torchvision vgg16().features child indices for each conv layer — the layout
# the real checkpoint's ``encoder.N`` keys follow. Hard-coded independently so
# a drift in VGG16_LAYERS (or the index bookkeeping in the converter) fails
# loudly here rather than silently skipping weights at load time.
VGG16_FEATURES_CONV_INDICES = {
    "conv1_1": 0, "conv1_2": 2,
    "conv2_1": 5, "conv2_2": 7,
    "conv3_1": 10, "conv3_2": 12, "conv3_3": 14,
    "conv4_1": 17, "conv4_2": 19, "conv4_3": 21,
    "conv5_1": 24, "conv5_2": 26, "conv5_3": 28,
}


def build_torch_s2dnet(num_layers: int, output_dim: int = 128, seed: int = 0):
    """Torch S2DNet with the reference checkpoint's state_dict layout.

    Returns (model, conv_index_by_name, hypercolumn_names).
    """
    torch.manual_seed(seed)
    encoder = []
    conv_idx = {}
    in_ch = 3
    channels = dict(VGG16_LAYERS)
    for name, ch in VGG16_LAYERS:
        if name.startswith("pool"):
            encoder.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            conv_idx[name] = len(encoder)
            encoder.append(nn.Conv2d(in_ch, ch, kernel_size=3, padding=1))
            encoder.append(nn.ReLU())
            in_ch = ch
    assert conv_idx == VGG16_FEATURES_CONV_INDICES

    hyper = list(HYPERCOLUMN_LAYERS[:num_layers])
    n_children = conv_idx[hyper[-1]] + 2  # keep through the trailing ReLU

    model = nn.Module()
    model.encoder = nn.ModuleList(encoder[:n_children])
    adaptation = nn.Module()
    for i, name in enumerate(hyper):
        adaptation.add_module(
            f"adap_layer_{i}",
            nn.Sequential(
                nn.Conv2d(channels[name], 64, kernel_size=1),
                nn.ReLU(),
                nn.Conv2d(64, output_dim, kernel_size=5, padding=2),
                nn.BatchNorm2d(output_dim),
            ))
    model.adaptation_layers = adaptation

    # Randomize BatchNorm affine + running stats: fresh-init BN is the
    # identity map (mean 0, var 1, scale 1, bias 0), which would let a broken
    # BN conversion pass silently.
    gen = torch.Generator().manual_seed(seed + 1)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)
            m.weight.data.uniform_(0.5, 1.5, generator=gen)
            m.bias.data.uniform_(-0.5, 0.5, generator=gen)
    return model, conv_idx, hyper


def torch_forward(model, conv_idx, hyper, x):
    """Reference forward: hypercolumns taken after each conv's ReLU, then the
    matching adaptation head (reference s2dnet.py:121-142)."""
    model.eval()
    capture_at = {conv_idx[name] + 1: i for i, name in enumerate(hyper)}
    feats = [None] * len(hyper)
    with torch.no_grad():
        h = x
        for i, layer in enumerate(model.encoder):
            h = layer(h)
            if i in capture_at:
                feats[capture_at[i]] = h
        out = []
        for i, f in enumerate(feats):
            out.append(getattr(model.adaptation_layers, f"adap_layer_{i}")(f))
    return [o.permute(0, 2, 3, 1).numpy() for o in out]  # NCHW -> NHWC


def _rel_err(a, b):
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


@pytest.mark.parametrize("num_layers", [1, 3])
def test_converter_matches_torch_forward(tmp_path, num_layers):
    model, conv_idx, hyper = build_torch_s2dnet(num_layers, seed=num_layers)
    pth = tmp_path / "s2dnet_weights.pth"
    torch.save({"state_dict": model.state_dict()}, pth)

    net = S2DNet({"num_layers": num_layers, "pretrained": None})
    before = net.variables
    net.variables = load_torch_s2dnet(pth, net.variables, net.hypercolumn_layers)

    # Every parameter leaf must actually have been replaced — a key mismatch
    # in the converter silently keeps the random init.
    import jax
    flat_before = jax.tree_util.tree_leaves_with_path(before)
    flat_after = dict(jax.tree_util.tree_leaves_with_path(net.variables))
    for path, leaf in flat_before:
        assert not np.allclose(np.asarray(leaf), np.asarray(flat_after[path])), (
            f"converter left {jax.tree_util.keystr(path)} at its random init")

    # Odd spatial dims stress the padding / pool-floor behavior.
    rng = np.random.default_rng(7)
    raw = rng.uniform(0, 1, (1, 65, 63, 3)).astype(np.float32)

    # Conv-stack parity without preprocessing.
    flax_out = net.module.apply(net.variables, jnp.asarray(raw))
    t_in = torch.from_numpy(raw.transpose(0, 3, 1, 2))
    torch_out = torch_forward(model, conv_idx, hyper, t_in)
    assert len(flax_out) == len(torch_out) == num_layers
    for fo, to in zip(flax_out, torch_out):
        assert fo.shape == to.shape
        assert _rel_err(np.asarray(fo), to) < 1e-5

    # Full _forward parity including the ImageNet normalization.
    flax_full = net._forward(jnp.asarray(raw))
    t_norm = (t_in - torch.tensor(IMAGENET_MEAN)[:, None, None]) / \
        torch.tensor(IMAGENET_STD)[:, None, None]
    torch_full = torch_forward(model, conv_idx, hyper, t_norm)
    for fo, to in zip(flax_full, torch_full):
        assert _rel_err(np.asarray(fo), to) < 1e-5


def test_converter_via_package_checkpoint_path(tmp_path, monkeypatch):
    """The pretrained='s2dnet' code path picks the checkpoint up from the
    package checkpoints/ dir — exercise it end to end with a monkeypatched
    ckpt so the auto-load wiring (not just the converter function) is
    covered."""
    from pixsfm_tpu.features.models import s2dnet as mod

    model, conv_idx, hyper = build_torch_s2dnet(1, seed=42)
    ckpt_dir = tmp_path / "checkpoints"
    ckpt_dir.mkdir()
    torch.save({"state_dict": model.state_dict()},
               ckpt_dir / "s2dnet_weights.pth")
    monkeypatch.setattr(mod, "__file__", str(tmp_path / "s2dnet.py"))

    net = S2DNet({"num_layers": 1, "pretrained": "s2dnet"})
    raw = np.random.default_rng(3).uniform(0, 1, (1, 32, 32, 3)).astype(
        np.float32)
    flax_out = net.module.apply(net.variables, jnp.asarray(raw))
    torch_out = torch_forward(model, conv_idx, hyper,
                              torch.from_numpy(raw.transpose(0, 3, 1, 2)))
    assert _rel_err(np.asarray(flax_out[0]), torch_out[0]) < 1e-5
