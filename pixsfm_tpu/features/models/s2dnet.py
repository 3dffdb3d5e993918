"""S2DNet in Flax (reference: pixsfm/features/models/s2dnet.py — VGG16 hypercolumns
conv1_2/conv3_3/conv5_3 + per-level adaptation heads 1x1 conv -> ReLU -> 5x5 conv ->
BatchNorm, 128-dim output, ImageNet mean/std normalization).

Weights: zero-egress environment — if a torch checkpoint
(``checkpoints/s2dnet_weights.pth``, same layout as the reference's download) is
present it is converted to Flax params; otherwise deterministic random init with a
warning (descriptor *pipelines* still work; descriptor *quality* requires weights).
"""

from __future__ import annotations

from pathlib import Path
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import logger
from .base_model import BaseModel

# VGG16 feature-extractor layout: (name, out_channels) conv entries and pools.
VGG16_LAYERS = [
    ("conv1_1", 64), ("conv1_2", 64), ("pool1", None),
    ("conv2_1", 128), ("conv2_2", 128), ("pool2", None),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("pool3", None),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("pool4", None),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("pool5", None),
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

HYPERCOLUMN_LAYERS = ["conv1_2", "conv3_3", "conv5_3"]


class _S2DNet(nn.Module):
    hypercolumn_layers: tuple
    output_dim: int
    remove_pooling_layers: bool

    @nn.compact
    def __call__(self, x):
        feats = []
        for name, ch in VGG16_LAYERS:
            if name.startswith("pool"):
                if not self.remove_pooling_layers:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(ch, (3, 3), padding=1, name=name)(x)
                x = nn.relu(x)
                if name in self.hypercolumn_layers:
                    feats.append(x)
                    if name == self.hypercolumn_layers[-1]:
                        break
        out = []
        for i, f in enumerate(feats):
            h = nn.Conv(64, (1, 1), name=f"adap{i}_conv1")(f)
            h = nn.relu(h)
            h = nn.Conv(self.output_dim, (5, 5), padding=2,
                        name=f"adap{i}_conv2")(h)
            h = nn.BatchNorm(use_running_average=True,
                             name=f"adap{i}_bn")(h)
            out.append(h)
        return out


class S2DNet(BaseModel):
    default_conf = {
        "num_layers": 1,
        "checkpointing": None,
        "output_dim": 128,
        "pretrained": "s2dnet",
        "remove_pooling_layers": False,
        "combine": False,
    }

    def _init(self, conf):
        self.hypercolumn_layers = tuple(
            HYPERCOLUMN_LAYERS[:int(conf.num_layers)])
        self.module = _S2DNet(self.hypercolumn_layers,
                              int(conf.output_dim),
                              bool(conf.remove_pooling_layers))
        self.output_dims = [int(conf.output_dim)] * len(
            self.hypercolumn_layers)
        if conf.remove_pooling_layers:
            self.scales = [1] * len(self.hypercolumn_layers)
        else:
            scale_of = {"conv1_2": 1, "conv3_3": 4, "conv5_3": 16}
            self.scales = [scale_of[n] for n in self.hypercolumn_layers]
        if conf.get("combine"):
            self.output_dims = self.output_dims[:1]
            self.scales = self.scales[:1]

        variables = self.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        if conf.get("pretrained") == "s2dnet":
            ckpt = Path(__file__).parent / "checkpoints" / \
                "s2dnet_weights.pth"
            if ckpt.exists():
                variables = load_torch_s2dnet(ckpt, variables,
                                              self.hypercolumn_layers)
                logger.info("Loaded S2DNet checkpoint from %s", ckpt)
            else:
                logger.warning(
                    "S2DNet pretrained weights not found at %s (zero-egress "
                    "environment); using deterministic random init. Place the "
                    "reference checkpoint there for descriptor parity.", ckpt)
        self.variables = variables

    def _forward(self, image):
        x = (image - IMAGENET_MEAN) / IMAGENET_STD
        feats = self.module.apply(self.variables, x)
        if self.conf.get("combine") and len(feats) > 1:
            base = feats[0]
            for f in feats[1:]:
                f_up = jax.image.resize(f, base.shape, method="bicubic")
                base = base + f_up
            feats = [base]
        return feats


def load_torch_s2dnet(path, variables, hypercolumn_layers):
    """Convert the reference's torch checkpoint (state_dict with encoder.N.* and
    adaptation_layers.adap_layer_i.*) into Flax params. OIHW -> HWIO."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]

    # map encoder indices to conv names (vgg16.features layout)
    conv_names = []
    idx = 0
    for name, ch in VGG16_LAYERS:
        if name.startswith("pool"):
            idx += 1
        else:
            conv_names.append((idx, name))
            idx += 2  # conv + relu

    import flax
    params = flax.core.unfreeze(variables)

    def np_(t):
        return np.asarray(t.detach().cpu().numpy())

    for idx, name in conv_names:
        wk, bk = f"encoder.{idx}.weight", f"encoder.{idx}.bias"
        if wk in sd and name in params["params"]:
            params["params"][name]["kernel"] = jnp.asarray(
                np_(sd[wk]).transpose(2, 3, 1, 0))
            params["params"][name]["bias"] = jnp.asarray(np_(sd[bk]))

    for i in range(len(hypercolumn_layers)):
        pre = f"adaptation_layers.adap_layer_{i}"
        m = {
            f"adap{i}_conv1": (f"{pre}.0.weight", f"{pre}.0.bias"),
            f"adap{i}_conv2": (f"{pre}.2.weight", f"{pre}.2.bias"),
        }
        for fl, (wk, bk) in m.items():
            if wk in sd and fl in params["params"]:
                params["params"][fl]["kernel"] = jnp.asarray(
                    np_(sd[wk]).transpose(2, 3, 1, 0))
                params["params"][fl]["bias"] = jnp.asarray(np_(sd[bk]))
        bn = f"{pre}.3"
        fl = f"adap{i}_bn"
        if f"{bn}.weight" in sd and fl in params["params"]:
            params["params"][fl]["scale"] = jnp.asarray(np_(sd[f"{bn}.weight"]))
            params["params"][fl]["bias"] = jnp.asarray(np_(sd[f"{bn}.bias"]))
            params["batch_stats"][fl]["mean"] = jnp.asarray(
                np_(sd[f"{bn}.running_mean"]))
            params["batch_stats"][fl]["var"] = jnp.asarray(
                np_(sd[f"{bn}.running_var"]))
    return flax.core.freeze(params)
