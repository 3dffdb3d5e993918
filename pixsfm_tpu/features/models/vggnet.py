"""Raw VGG16 hypercolumn features (reference: pixsfm/features/models/vggnet.py)."""

from __future__ import annotations

from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import logger
from .base_model import BaseModel
from .s2dnet import HYPERCOLUMN_LAYERS, IMAGENET_MEAN, IMAGENET_STD, \
    VGG16_LAYERS

VGG16_CHANNELS = {name: ch for name, ch in VGG16_LAYERS if ch}


class _VGG(nn.Module):
    hypercolumn_layers: tuple

    @nn.compact
    def __call__(self, x):
        feats = []
        for name, ch in VGG16_LAYERS:
            if name.startswith("pool"):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(ch, (3, 3), padding=1, name=name)(x)
                x = nn.relu(x)
                if name in self.hypercolumn_layers:
                    feats.append(x)
                    if name == self.hypercolumn_layers[-1]:
                        break
        return feats


class VGGNet(BaseModel):
    default_conf = {
        "hypercolumn_layers": list(HYPERCOLUMN_LAYERS),
        "num_layers": None,
        "pretrained": "imagenet",
    }

    def _init(self, conf):
        layers = list(conf.get("hypercolumn_layers")
                      or HYPERCOLUMN_LAYERS)
        if conf.get("num_layers"):
            layers = layers[:int(conf.num_layers)]
        self.hypercolumn_layers = tuple(layers)
        self.module = _VGG(self.hypercolumn_layers)
        self.output_dims = [VGG16_CHANNELS[n] for n in layers]
        scale = 1
        scales = []
        for name, ch in VGG16_LAYERS:
            if name.startswith("pool"):
                scale *= 2
            elif name in layers:
                scales.append(scale)
        self.scales = scales
        self.variables = self.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        ckpt = Path(__file__).parent / "checkpoints" / "vgg16_imagenet.pth"
        if conf.get("pretrained") and ckpt.exists():
            from .s2dnet import load_torch_s2dnet
            self.variables = load_torch_s2dnet(ckpt, self.variables, ())
            logger.info("Loaded VGG16 checkpoint from %s", ckpt)
        elif conf.get("pretrained"):
            logger.warning("VGG16 pretrained weights not found (%s); using "
                           "random init.", ckpt)

    def _forward(self, image):
        x = (image - IMAGENET_MEAN) / IMAGENET_STD
        return self.module.apply(self.variables, x)
