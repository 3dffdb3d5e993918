"""SuperPoint in Flax — learned keypoint detector + 256-d descriptors.

The reference delegates learned detection to hloc's SuperPoint wrapper around
the MagicLeap ``SuperPointNet`` (weights ``superpoint_v1.pth``); this framework
ships its own TPU-native implementation so the ETH3D eval methods
(reference pixsfm/eval/eth3d/config.py:30-137 lists sift/superpoint/r2d2) work
end to end without torch at runtime.

Architecture (public SuperPointNet, magicleap/SuperPointPretrainedNetwork
``demo_superpoint.py``): shared VGG-style encoder over grayscale input
(64,64 / 64,64 / 128,128 / 128,128 with 2x2 max-pools between blocks), a
detector head (3x3x256 -> 1x1x65, softmax over 65 with a "dustbin" cell,
8x8 pixel-shuffle to a full-resolution heatmap) and a descriptor head
(3x3x256 -> 1x1x256, bilinearly sampled at keypoints + L2-normalized).

TPU design: the whole forward is dense conv work (MXU); NMS is iterated
max-pooling (``reduce_window``), selection is a static top-k with a validity
mask — no dynamic shapes anywhere, so detection batches and jits.

Weights: zero-egress — if ``checkpoints/superpoint_v1.pth`` (the public
checkpoint's state_dict layout) is present it is converted; otherwise
deterministic random init with a warning.
"""

from __future__ import annotations

from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import logger
from .base_model import BaseModel

__all__ = ["SuperPoint", "load_torch_superpoint", "superpoint_scores_dense",
           "simple_nms", "select_keypoints", "sample_descriptors_coarse8"]


class _SuperPointNet(nn.Module):
    """Shared encoder + detector/descriptor heads. Input [B, H, W, 1]."""

    descriptor_dim: int = 256

    @nn.compact
    def __call__(self, x):
        def cbr(h, ch, name):
            return nn.relu(nn.Conv(ch, (3, 3), padding=1, name=name)(h))

        x = cbr(x, 64, "conv1a")
        x = cbr(x, 64, "conv1b")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = cbr(x, 64, "conv2a")
        x = cbr(x, 64, "conv2b")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = cbr(x, 128, "conv3a")
        x = cbr(x, 128, "conv3b")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = cbr(x, 128, "conv4a")
        x = cbr(x, 128, "conv4b")

        h = cbr(x, 256, "convPa")
        semi = nn.Conv(65, (1, 1), name="convPb")(h)      # [B, H/8, W/8, 65]
        d = cbr(x, 256, "convDa")
        desc = nn.Conv(self.descriptor_dim, (1, 1), name="convDb")(d)
        return semi, desc


def superpoint_scores_dense(semi):
    """[B, Hc, Wc, 65] raw logits -> [B, Hc*8, Wc*8] keypoint probability.

    Softmax over the 65 cells, drop the dustbin, 8x8 pixel-shuffle."""
    prob = jax.nn.softmax(semi, axis=-1)[..., :64]
    B, Hc, Wc, _ = prob.shape
    prob = prob.reshape(B, Hc, Wc, 8, 8)
    return prob.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)


def simple_nms(scores, radius: int, iterations: int = 2):
    """Fast approximate NMS by iterated max-pooling ([B, H, W] scores).

    A pixel survives iff it is the maximum of its (2r+1)^2 window; suppressed
    neighborhoods are re-opened for secondary maxima ``iterations`` times —
    pure ``reduce_window`` ops, shape-static, fuses on TPU."""
    k = 2 * radius + 1

    def maxpool(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1), "SAME")

    zeros = jnp.zeros_like(scores)
    max_mask = scores == maxpool(scores)
    for _ in range(iterations):
        supp = maxpool(max_mask.astype(scores.dtype)) > 0
        supp_scores = jnp.where(supp, zeros, scores)
        new_max = (supp_scores == maxpool(supp_scores)) & ~supp
        max_mask = max_mask | new_max
    return jnp.where(max_mask, scores, zeros)


def select_keypoints(scores, max_keypoints: int, threshold: float,
                     border: int = 4):
    """[B, H, W] NMS'd scores -> (xy [B, K, 2] f32, score [B, K], valid [B, K]).

    Static-K selection: top-k over the flattened map with a score-threshold
    validity mask (invalid slots keep in-range coords so downstream gathers
    stay safe)."""
    B, H, W = scores.shape
    if border > 0:
        m = jnp.zeros((H, W), scores.dtype).at[border:H - border,
                                               border:W - border].set(1.0)
        scores = scores * m
    flat = scores.reshape(B, H * W)
    val, idx = jax.lax.top_k(flat, max_keypoints)
    yy = (idx // W).astype(jnp.float32)
    xx = (idx % W).astype(jnp.float32)
    return jnp.stack([xx, yy], axis=-1), val, val > threshold


def sample_descriptors_coarse8(xy, desc_coarse):
    """Bilinearly sample the stride-8 descriptor map at pixel coords.

    Coordinate mapping matches the public implementation (grid_sample with
    ``align_corners=True`` after the keypoints are shifted by s/2 - 0.5):
    u_c = (x - 3.5) / 8 onto a [Wc, Hc] grid indexed at cell centers.
    xy: [B, K, 2]; desc_coarse: [B, Hc, Wc, C] -> L2-normalized [B, K, C]."""
    B, Hc, Wc, C = desc_coarse.shape
    s = 8.0

    def one(d, kp):
        # normalized as in hloc: ((kp - s/2 + 0.5) / (dim*s - s/2 - 0.5)) * 2 - 1
        # then align_corners=True maps [-1, 1] -> [0, dim - 1]
        gx = (kp[:, 0] - s / 2 + 0.5) / (Wc * s - s / 2 - 0.5) * (Wc - 1)
        gy = (kp[:, 1] - s / 2 + 0.5) / (Hc * s - s / 2 - 0.5) * (Hc - 1)
        x0 = jnp.clip(jnp.floor(gx), 0, Wc - 1)
        y0 = jnp.clip(jnp.floor(gy), 0, Hc - 1)
        x1 = jnp.clip(x0 + 1, 0, Wc - 1)
        y1 = jnp.clip(y0 + 1, 0, Hc - 1)
        wx = jnp.clip(gx - x0, 0.0, 1.0)[:, None]
        wy = jnp.clip(gy - y0, 0.0, 1.0)[:, None]
        x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
        y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
        v = ((1 - wy) * ((1 - wx) * d[y0i, x0i] + wx * d[y0i, x1i])
             + wy * ((1 - wx) * d[y1i, x0i] + wx * d[y1i, x1i]))
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                               1e-8)

    return jax.vmap(one)(desc_coarse, xy)


class SuperPoint(BaseModel):
    """Dense-feature-model view: the stride-8 descriptor map as one level
    (usable for featuremetric refinement), plus ``detect()`` for keypoints."""

    default_conf = {
        "descriptor_dim": 256,
        "nms_radius": 4,
        "keypoint_threshold": 0.005,
        "max_keypoints": 2048,
        "remove_borders": 4,
        "pretrained": "superpoint",
    }

    def _init(self, conf):
        self.module = _SuperPointNet(int(conf.descriptor_dim))
        self.output_dims = [int(conf.descriptor_dim)]
        self.scales = [8]
        variables = self.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1), jnp.float32))
        if conf.get("pretrained") == "superpoint":
            ckpt = Path(__file__).parent / "checkpoints" / \
                "superpoint_v1.pth"
            if ckpt.exists():
                variables = load_torch_superpoint(ckpt, variables)
                logger.info("Loaded SuperPoint checkpoint from %s", ckpt)
            else:
                logger.warning(
                    "SuperPoint weights not found at %s (zero-egress "
                    "environment); using deterministic random init.", ckpt)
        self.variables = variables
        self._jit_detect = None

    @staticmethod
    def _to_gray(image):
        """[B, H, W, 3] RGB in [0,1] -> [B, H, W, 1] (ITU grayscale, matches
        cv2.cvtColor COLOR_RGB2GRAY coefficients used by the public loader)."""
        w = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
        return jnp.sum(image * w, axis=-1, keepdims=True)

    def _forward(self, image):
        _, desc = self.module.apply(self.variables, self._to_gray(image))
        return [desc]

    def detect(self, image: np.ndarray):
        """image [B, H, W, 3] (or [B, H, W, 1]) float32 in [0, 1] ->
        dict(keypoints [B,K,2], scores [B,K], valid [B,K],
        descriptors [B,K,C]) as numpy; K = conf.max_keypoints (padded)."""
        conf = self.conf

        if self._jit_detect is None:
            @jax.jit
            def run(variables, img):
                g = img if img.shape[-1] == 1 else self._to_gray(img)
                semi, desc = self.module.apply(variables, g)
                scores = superpoint_scores_dense(semi)
                scores = simple_nms(scores, int(conf.nms_radius))
                xy, val, ok = select_keypoints(
                    scores, int(conf.max_keypoints),
                    float(conf.keypoint_threshold),
                    int(conf.remove_borders))
                d = sample_descriptors_coarse8(xy, desc)
                return xy, val, ok, d

            self._jit_detect = run
        xy, val, ok, d = self._jit_detect(self.variables,
                                          jnp.asarray(image, jnp.float32))
        return {"keypoints": np.asarray(xy), "scores": np.asarray(val),
                "valid": np.asarray(ok), "descriptors": np.asarray(d)}


def load_torch_superpoint(path, variables):
    """Convert the public ``superpoint_v1.pth`` state_dict (flat
    ``conv{1a..Db}.{weight,bias}`` Conv2d tensors, OIHW) to Flax params."""
    import torch

    import flax

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}

    params = flax.core.unfreeze(variables)
    names = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]
    missing = [n for n in names if f"{n}.weight" not in sd]
    if missing:
        raise ValueError(f"checkpoint at {path} lacks layers {missing}")
    for n in names:
        w = np.asarray(sd[f"{n}.weight"].detach().cpu().numpy())
        b = np.asarray(sd[f"{n}.bias"].detach().cpu().numpy())
        params["params"][n]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        params["params"][n]["bias"] = jnp.asarray(b)
    return flax.core.freeze(params)
