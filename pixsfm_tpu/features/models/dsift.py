"""Dense SIFT descriptors in pure JAX (reference: pixsfm/features/models/dsift.py,
which wraps kornia's DenseSIFTDescriptor — kornia is unavailable here).

Classic dense SIFT: image gradients -> 8 orientation bins (soft-assigned) ->
spatial pooling with a bilinear (triangular) kernel of ``spatial_bin_size`` over a
4x4 grid of bins -> per-pixel 128-D descriptor -> L2 normalize (+ optional
RootSIFT). Everything is convolutions — MXU-friendly by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base_model import BaseModel

NUM_ANG_BINS = 8
NUM_SPATIAL_BINS = 4


class DSIFT(BaseModel):
    default_conf = {
        "rootsift": True,
        "spatial_bin_size": 4,
        "grayscale": True,
    }

    def _init(self, conf):
        self.output_dims = [NUM_ANG_BINS * NUM_SPATIAL_BINS ** 2]  # 128
        self.scales = [1]
        self.bin_size = int(conf.get("spatial_bin_size", 4))

    def _forward(self, image):
        x = jnp.sum(image * jnp.asarray([0.299, 0.587, 0.114]), axis=-1,
                    keepdims=True)  # [1, H, W, 1]
        gx = 0.5 * (jnp.roll(x, -1, axis=2) - jnp.roll(x, 1, axis=2))
        gy = 0.5 * (jnp.roll(x, -1, axis=1) - jnp.roll(x, 1, axis=1))
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
        ori = jnp.arctan2(gy, gx)  # [-pi, pi]

        # soft orientation binning
        bins = jnp.arange(NUM_ANG_BINS) * (2 * jnp.pi / NUM_ANG_BINS) - jnp.pi
        d = ori - bins.reshape(1, 1, 1, -1)
        d = (d + jnp.pi) % (2 * jnp.pi) - jnp.pi
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d) * NUM_ANG_BINS / (2 * jnp.pi))
        hist = mag * w  # [1, H, W, 8]

        # spatial pooling: separable triangular kernel per spatial bin offset
        bs = self.bin_size
        tri = jnp.asarray(np.concatenate([
            np.arange(1, bs + 1), np.arange(bs - 1, 0, -1)]), jnp.float32)
        tri = tri / tri.sum()

        pooled = _sep_blur(_sep_blur(hist, tri, 1), tri, 2)

        # sample the 4x4 spatial grid around each pixel by shifting
        descs = []
        offsets = [int(round((i - (NUM_SPATIAL_BINS - 1) / 2.0) * bs))
                   for i in range(NUM_SPATIAL_BINS)]
        for dy in offsets:
            for dx in offsets:
                shifted = jnp.roll(pooled, (-dy, -dx), axis=(1, 2))
                descs.append(shifted)
        desc = jnp.concatenate(descs, axis=-1)  # [1, H, W, 128]

        norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
        desc = desc / jnp.maximum(norm, 1e-8)
        if self.conf.get("rootsift", True):
            l1 = jnp.sum(jnp.abs(desc), axis=-1, keepdims=True)
            desc = jnp.sqrt(desc / jnp.maximum(l1, 1e-8))
        return [desc]


def _sep_blur(h, tri, axis):
    """Depthwise separable triangular blur along one spatial axis."""
    C = h.shape[-1]
    if axis == 1:
        k = tri.reshape(-1, 1, 1, 1)
    else:
        k = tri.reshape(1, -1, 1, 1)
    kernel = jnp.tile(k, (1, 1, 1, C))  # HWIO with I=1, O=C (depthwise)
    return jax.lax.conv_general_dilated(
        h, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)
