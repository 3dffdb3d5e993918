"""Identity "feature" model: raw RGB/grayscale intensities as featuremaps
(reference: pixsfm/features/models/image.py — used by the photometric and
norefine presets to decouple optimization from deep models)."""

from __future__ import annotations

import jax.numpy as jnp

from .base_model import BaseModel


class ImageModel(BaseModel):
    default_conf = {
        "grayscale": False,
    }

    def _init(self, conf):
        self.output_dims = [1 if conf.get("grayscale") else 3]
        self.scales = [1]

    def _forward(self, image):
        if self.conf.get("grayscale"):
            w = jnp.asarray([0.299, 0.587, 0.114])
            return [jnp.sum(image * w, axis=-1, keepdims=True)]
        return [image]
