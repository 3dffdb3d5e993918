"""R2D2 in Flax — reliable + repeatable learned detector/descriptor.

The reference's ETH3D method matrix includes r2d2 via hloc
(reference pixsfm/eval/eth3d/config.py:30-137); this is a TPU-native
implementation of the public ``Quad_L2Net_ConfCFS`` network
(naver/r2d2 ``nets/patchnet.py``): an L2-Net backbone run fully
convolutionally (strides become dilations, so every map stays full
resolution), a 128-d L2-normalized descriptor output, a 2-class softmax
reliability head and a softplus-squashed repeatability head, both applied
to the *squared* descriptor activations.

Layer sequence (mchan=4, dilated mode; conv k/dilation/padding):
3x3/1/1 x2 @32ch -> 3x3/1/1 @64 (stride2->dil) -> 3x3/2/2 @64 ->
3x3/2/2 @128 (stride2->dil) -> 3x3/4/4 @128 -> 2x2/4/2, 2x2/8/4 @128 ->
2x2/16/8 @128 (no BN/ReLU). BatchNorm is affine-free (running stats only).

TPU design: dilated convs are native XLA ``kernel_dilation`` — the whole
forward is dense MXU work at full resolution; detection (3x3 local-max on
repeatability, static top-k) jits with fixed shapes.

Weights: zero-egress — if ``checkpoints/r2d2_WASF_N16.pt`` (public
checkpoint state_dict layout: ``ops.N.*`` + ``clf``/``sal`` heads) is
present it is converted; otherwise deterministic random init + warning.
"""

from __future__ import annotations

from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import logger
from .base_model import BaseModel
from .s2dnet import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["R2D2", "load_torch_r2d2", "R2D2_CONV_PLAN"]

# (out_ch, kernel, dilation, use_bn, use_relu) — fully-convolutional plan
# with stride folded into dilation (dilated=True in the public net).
R2D2_CONV_PLAN = [
    (32, 3, 1, True, True),
    (32, 3, 1, True, True),
    (64, 3, 1, True, True),    # stride 2 -> subsequent dilation x2
    (64, 3, 2, True, True),
    (128, 3, 2, True, True),   # stride 2 -> subsequent dilation x2
    (128, 3, 4, True, True),
    (128, 2, 4, True, False),  # the three 2x2 convs replacing the 8x8
    (128, 2, 8, True, False),
    (128, 2, 16, False, False),
]


class _QuadL2Net(nn.Module):
    """Backbone + CFS heads. Input [B, H, W, 3] (ImageNet-normalized)."""

    @nn.compact
    def __call__(self, x):
        for i, (ch, k, d, use_bn, use_relu) in enumerate(R2D2_CONV_PLAN):
            pad = ((k - 1) * d) // 2
            x = nn.Conv(ch, (k, k), padding=[(pad, pad), (pad, pad)],
                        kernel_dilation=(d, d), name=f"conv{i}")(x)
            if use_bn:
                # affine-free BatchNorm (running stats only), like the public
                # net's BatchNorm2d(outd, affine=False)
                x = nn.BatchNorm(use_running_average=True, use_bias=False,
                                 use_scale=False, name=f"bn{i}")(x)
            if use_relu:
                x = nn.relu(x)
        desc = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        x2 = x ** 2
        urel = nn.Conv(2, (1, 1), name="clf")(x2)
        urep = nn.Conv(1, (1, 1), name="sal")(x2)
        reliability = jax.nn.softmax(urel, axis=-1)[..., 1:2]
        sp = jax.nn.softplus(urep)
        repeatability = sp / (1.0 + sp)
        return desc, reliability, repeatability


class R2D2(BaseModel):
    """Dense-feature-model view: full-resolution 128-d descriptors as one
    level (scale 1 — directly usable for featuremetric refinement), plus
    ``detect()`` for reliability-filtered keypoints."""

    default_conf = {
        "max_keypoints": 2048,
        "reliability_threshold": 0.7,
        "repeatability_threshold": 0.7,
        "nms_radius": 1,
        "pretrained": "r2d2",
    }

    def _init(self, conf):
        self.module = _QuadL2Net()
        self.output_dims = [128]
        self.scales = [1]
        variables = self.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
        if conf.get("pretrained") == "r2d2":
            ckpt = Path(__file__).parent / "checkpoints" / "r2d2_WASF_N16.pt"
            if ckpt.exists():
                variables = load_torch_r2d2(ckpt, variables)
                logger.info("Loaded R2D2 checkpoint from %s", ckpt)
            else:
                logger.warning(
                    "R2D2 weights not found at %s (zero-egress environment); "
                    "using deterministic random init.", ckpt)
        self.variables = variables
        self._jit_detect = None

    def _forward(self, image):
        x = (image - IMAGENET_MEAN) / IMAGENET_STD
        desc, _, _ = self.module.apply(self.variables, x)
        return [desc]

    def detect(self, image: np.ndarray):
        """image [B, H, W, 3] float32 in [0,1] -> dict(keypoints [B,K,2],
        scores [B,K], valid [B,K], descriptors [B,K,128]) numpy, K static.

        Score = reliability * repeatability at 3x3 local maxima of the
        repeatability map (the public extractor's NonMaxSuppression with
        rel/rep thresholds)."""
        conf = self.conf

        if self._jit_detect is None:
            from .superpoint import select_keypoints, simple_nms

            @jax.jit
            def run(variables, img):
                x = (img - IMAGENET_MEAN) / IMAGENET_STD
                desc, rel, rep = self.module.apply(variables, x)
                rep2 = simple_nms(rep[..., 0], int(conf.nms_radius),
                                  iterations=0)  # pure local-max gate
                ok_t = ((rel[..., 0] >= float(conf.reliability_threshold))
                        & (rep[..., 0] >= float(conf.repeatability_threshold)))
                score = jnp.where(ok_t, rep2 * rel[..., 0], 0.0)
                xy, val, ok = select_keypoints(
                    score, int(conf.max_keypoints), 0.0, border=4)
                ii = xy[..., 1].astype(jnp.int32)
                jj = xy[..., 0].astype(jnp.int32)
                d = jax.vmap(lambda dm, i, j: dm[i, j])(desc, ii, jj)
                return xy, val, ok & (val > 0), d

            self._jit_detect = run
        xy, val, ok, d = self._jit_detect(self.variables,
                                          jnp.asarray(image, jnp.float32))
        return {"keypoints": np.asarray(xy), "scores": np.asarray(val),
                "valid": np.asarray(ok), "descriptors": np.asarray(d)}


def load_torch_r2d2(path, variables):
    """Convert the public r2d2 checkpoint (``ops.N.*`` ModuleList of
    Conv2d/BatchNorm2d(affine=False)/ReLU + ``clf``/``sal`` 1x1 heads,
    OIHW) to Flax params."""
    import torch

    import flax

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "net", "model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}

    params = flax.core.unfreeze(variables)

    def np_(t):
        return np.asarray(t.detach().cpu().numpy())

    # walk the ModuleList indices in lockstep with the conv plan
    idx = 0
    for i, (ch, k, d, use_bn, use_relu) in enumerate(R2D2_CONV_PLAN):
        wk = f"ops.{idx}.weight"
        if wk not in sd:
            raise ValueError(f"checkpoint at {path} lacks {wk}")
        params["params"][f"conv{i}"]["kernel"] = jnp.asarray(
            np_(sd[wk]).transpose(2, 3, 1, 0))
        params["params"][f"conv{i}"]["bias"] = jnp.asarray(
            np_(sd[f"ops.{idx}.bias"]))
        idx += 1
        if use_bn:
            params["batch_stats"][f"bn{i}"]["mean"] = jnp.asarray(
                np_(sd[f"ops.{idx}.running_mean"]))
            params["batch_stats"][f"bn{i}"]["var"] = jnp.asarray(
                np_(sd[f"ops.{idx}.running_var"]))
            idx += 1
        if use_relu:
            idx += 1  # ReLU occupies a ModuleList slot (no params)
    for head in ("clf", "sal"):
        params["params"][head]["kernel"] = jnp.asarray(
            np_(sd[f"{head}.weight"]).transpose(2, 3, 1, 0))
        params["params"][head]["bias"] = jnp.asarray(np_(sd[f"{head}.bias"]))
    return flax.core.freeze(params)
