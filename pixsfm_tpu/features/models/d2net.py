"""D2-Net in Flax — joint detection/description from a single dense map.

The reference's ETH3D method matrix includes d2-net via hloc (reference
pixsfm/eval/eth3d/config.py:81-89 feature config, :113-119 matcher config
with similarity threshold 0.8) and ships a ``pixsfm_eth3d_d2net`` preset;
this is a TPU-native implementation of the public test-time network
(mihaidusmanu/d2-net ``lib/model_test.py``).

Architecture (``DenseFeatureExtractionModule``): VGG16 truncated at
conv4_3 — conv1_1..conv1_2 / pool(2,2) / conv2_1..conv2_2 / pool(2,2) /
conv3_1..conv3_3 / pool(2, stride 1) / conv4_1..conv4_3 with dilation 2 —
so the dense 512-d descriptor map has stride 4. The last conv has no ReLU.
Input preprocessing is Caffe-style: RGB->BGR, x255, subtract the VGG mean.

Detection (``HardDetectionModule``): a feature-map cell is a keypoint iff
some channel is simultaneously (a) the depth-wise max across channels,
(b) a 3x3 spatial local max of its channel plane, and (c) not edge-like —
the 2x2 Hessian of the channel plane (fixed difference filters) must have
det > 0 and trace^2/det <= (r+1)^2/r with edge_threshold r (default 5,
same rule as SIFT). Keypoint score = the depth-wise max value; positions
map back through the two 2x pooling steps as x_img = 4*x_fmap + 1.5
(``upscale_positions`` with 2 scaling steps). Single-scale only — the
reference's eval config runs d2-net with ``multiscale: False``.

TPU design: everything is dense conv / elementwise work — the Hessian
filters are shift-and-add on the [B, H, W, C] map, detection is a
reduce_window local-max gate and a static top-k (no dynamic shapes).

Weights: zero-egress — if ``checkpoints/d2_tf.pth`` (the public
checkpoint's ``dense_feature_extraction.model.N.*`` layout) is present it
is converted; otherwise deterministic random init with a warning.
"""

from __future__ import annotations

from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import logger
from .base_model import BaseModel

__all__ = ["D2Net", "load_torch_d2net", "D2NET_CONV_PLAN", "hard_detection"]

# Caffe preprocessing mean (BGR order), matching the public
# ``preprocess_image(..., preprocessing='caffe')``.
CAFFE_MEAN_BGR = np.array([103.939, 116.779, 123.68], np.float32)

# (out_ch, dilation, relu_after, pool_after) — pool_after in
# {None, "2x2", "2x1"} (kernel 2 with stride 2 / stride 1).
D2NET_CONV_PLAN = [
    (64, 1, True, None),    # conv1_1
    (64, 1, True, "2x2"),   # conv1_2 + pool1
    (128, 1, True, None),   # conv2_1
    (128, 1, True, "2x2"),  # conv2_2 + pool2
    (256, 1, True, None),   # conv3_1
    (256, 1, True, None),   # conv3_2
    (256, 1, True, "2x1"),  # conv3_3 + pool3 (stride 1)
    (512, 2, True, None),   # conv4_1 (dilated)
    (512, 2, True, None),   # conv4_2 (dilated)
    (512, 2, False, None),  # conv4_3 (dilated, no ReLU)
]


class _D2NetBackbone(nn.Module):
    """VGG16->conv4_3 dense extractor. Input [B, H, W, 3] Caffe-normalized
    BGR; output [B, H/4, W/4, 512] (H, W multiples of 4 assumed)."""

    @nn.compact
    def __call__(self, x):
        for i, (ch, d, relu, pool) in enumerate(D2NET_CONV_PLAN):
            x = nn.Conv(ch, (3, 3), padding=[(d, d), (d, d)],
                        kernel_dilation=(d, d), name=f"conv{i}")(x)
            if relu:
                x = nn.relu(x)
            if pool == "2x2":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif pool == "2x1":
                # 2x2 max pool with stride 1: pad so the output keeps the
                # input size (torch pads nothing and loses one row/col; the
                # public net applies it mid-map where VALID would misalign
                # the dilated convs — replicate torch exactly: VALID, then
                # the dilated convs run on the (H-1, W-1) map).
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1),
                    "VALID")
        return x


def _channel_hessian_gate(fmap, edge_threshold: float):
    """Per-channel 2x2 Hessian edge rejection on [B, H, W, C].

    Filters match the public ``HardDetectionModule``:
    dii = f[i-1] - 2 f[i] + f[i+1] (rows), djj likewise over columns,
    dij = 0.25 * (f[i-1,j-1] - f[i-1,j+1] - f[i+1,j-1] + f[i+1,j+1]).
    Zero padding at the border (torch conv2d padding=1)."""
    p = jnp.pad(fmap, ((0, 0), (1, 1), (1, 1), (0, 0)))
    up, down = p[:, :-2, 1:-1], p[:, 2:, 1:-1]
    left, right = p[:, 1:-1, :-2], p[:, 1:-1, 2:]
    ul, ur = p[:, :-2, :-2], p[:, :-2, 2:]
    dl, dr = p[:, 2:, :-2], p[:, 2:, 2:]
    dii = up - 2.0 * fmap + down
    djj = left - 2.0 * fmap + right
    dij = 0.25 * (ul - ur - dl + dr)
    det = dii * djj - dij * dij
    tr = dii + djj
    r = edge_threshold
    thr = (r + 1.0) ** 2 / r
    return (det > 0.0) & (tr * tr <= thr * det)


def hard_detection(fmap, edge_threshold: float = 5.0):
    """Public ``HardDetectionModule``: [B, H, W, C] dense map -> detection
    score map [B, H, W] (depth-wise max value where all three gates pass,
    0 elsewhere)."""
    depth_max = jnp.max(fmap, axis=-1)
    is_depth_max = fmap == depth_max[..., None]
    local_max = jax.lax.reduce_window(
        fmap, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    is_local_max = fmap == local_max
    not_edge = _channel_hessian_gate(fmap, edge_threshold)
    detected = jnp.any(is_depth_max & is_local_max & not_edge, axis=-1)
    return jnp.where(detected, depth_max, 0.0)


class D2Net(BaseModel):
    """Dense-feature-model view: the stride-4 512-d map as one level
    (scale 1/4 — usable for featuremetric refinement), plus ``detect()``
    for the joint detector."""

    default_conf = {
        "max_keypoints": 2048,
        "edge_threshold": 5.0,
        "pretrained": "d2net",
    }

    def _init(self, conf):
        self.module = _D2NetBackbone()
        self.output_dims = [512]
        self.scales = [4]
        variables = self.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        if conf.get("pretrained") == "d2net":
            ckpt = Path(__file__).parent / "checkpoints" / "d2_tf.pth"
            if ckpt.exists():
                variables = load_torch_d2net(ckpt, variables)
                logger.info("Loaded D2-Net checkpoint from %s", ckpt)
            else:
                logger.warning(
                    "D2-Net weights not found at %s (zero-egress "
                    "environment); using deterministic random init.", ckpt)
        self.variables = variables
        self._jit_detect = None

    @staticmethod
    def _preprocess_caffe(image):
        """[B, H, W, 3] RGB in [0,1] -> Caffe BGR, x255, mean-subtracted."""
        bgr = image[..., ::-1] * 255.0
        return bgr - jnp.asarray(CAFFE_MEAN_BGR)

    def _forward(self, image):
        x = self._preprocess_caffe(image)
        return [self.module.apply(self.variables, x)]

    def detect(self, image: np.ndarray):
        """image [B, H, W, 3] float32 in [0,1] (H, W multiples of 4) ->
        dict(keypoints [B,K,2] image pixels, scores, valid, descriptors
        [B,K,512] L2-normalized) numpy, K static.

        Includes the public pipeline's ``HandcraftedLocalizationModule``
        sub-pixel step (multiscale=False path of ``process_multiscale``):
        per keypoint, on the depth-max channel's plane, solve the 2x2
        Newton system H d = -g (central-difference gradient/Hessian);
        points whose displacement exceeds 0.5 cells in either axis are
        dropped (public mask semantics), and descriptors are BILINEARLY
        interpolated from the dense map at the refined position."""
        conf = self.conf

        if self._jit_detect is None:
            from .superpoint import select_keypoints

            @jax.jit
            def run(variables, img):
                fmap = self.module.apply(
                    variables, self._preprocess_caffe(img))
                score = hard_detection(fmap, float(conf.edge_threshold))
                xy, val, ok = select_keypoints(
                    score, int(conf.max_keypoints), 0.0, border=1)
                ii = xy[..., 1].astype(jnp.int32)
                jj = xy[..., 0].astype(jnp.int32)

                def per_image(fm, i, j):
                    H, W, _ = fm.shape
                    c = jnp.argmax(fm[i, j], axis=-1)          # [K]

                    def tap(di, dj):
                        return fm[jnp.clip(i + di, 0, H - 1),
                                  jnp.clip(j + dj, 0, W - 1), c]

                    f0 = tap(0, 0)
                    di_ = 0.5 * (tap(1, 0) - tap(-1, 0))
                    dj_ = 0.5 * (tap(0, 1) - tap(0, -1))
                    dii = tap(-1, 0) - 2.0 * f0 + tap(1, 0)
                    djj = tap(0, -1) - 2.0 * f0 + tap(0, 1)
                    dij = 0.25 * (tap(-1, -1) - tap(-1, 1)
                                  - tap(1, -1) + tap(1, 1))
                    det = dii * djj - dij * dij
                    safe = jnp.where(jnp.abs(det) < 1e-10, 1.0, det)
                    disp_i = -(djj * di_ - dij * dj_) / safe
                    disp_j = -(dii * dj_ - dij * di_) / safe
                    good = ((jnp.abs(det) >= 1e-10)
                            & (jnp.abs(disp_i) < 0.5)
                            & (jnp.abs(disp_j) < 0.5))
                    disp_i = jnp.where(good, disp_i, 0.0)
                    disp_j = jnp.where(good, disp_j, 0.0)
                    fi = i.astype(jnp.float32) + disp_i
                    fj = j.astype(jnp.float32) + disp_j
                    # bilinear descriptor interpolation at the refined
                    # position (public interpolate_dense_features)
                    i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, H - 2)
                    j0 = jnp.clip(jnp.floor(fj).astype(jnp.int32), 0, W - 2)
                    wi = (fi - i0)[:, None]
                    wj = (fj - j0)[:, None]
                    d = ((1 - wi) * (1 - wj) * fm[i0, j0]
                         + (1 - wi) * wj * fm[i0, j0 + 1]
                         + wi * (1 - wj) * fm[i0 + 1, j0]
                         + wi * wj * fm[i0 + 1, j0 + 1])
                    return fi, fj, good, d

                fi, fj, good, d = jax.vmap(per_image)(fmap, ii, jj)
                d = d / jnp.maximum(
                    jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
                # upscale_positions with 2 scaling steps: p -> 2p+0.5 twice
                xy_img = jnp.stack([fj, fi], axis=-1) * 4.0 + 1.5
                return xy_img, val, ok & good & (val > 0), d

            self._jit_detect = run
        xy, val, ok, d = self._jit_detect(self.variables,
                                          jnp.asarray(image, jnp.float32))
        return {"keypoints": np.asarray(xy), "scores": np.asarray(val),
                "valid": np.asarray(ok), "descriptors": np.asarray(d)}


def load_torch_d2net(path, variables):
    """Convert the public d2-net checkpoint (``d2_tf.pth``:
    ``dense_feature_extraction.model.N.weight/bias`` with N the
    nn.Sequential slot — ReLU/pool slots hold no params) to Flax params."""
    import torch

    import flax

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    prefix = ("dense_feature_extraction.model."
              if any(k.startswith("dense_feature_extraction.")
                     for k in sd) else "model.")

    params = flax.core.unfreeze(variables)

    def np_(t):
        return np.asarray(t.detach().cpu().numpy())

    slot = 0
    for i, (ch, d, relu, pool) in enumerate(D2NET_CONV_PLAN):
        wk = f"{prefix}{slot}.weight"
        if wk not in sd:
            raise ValueError(f"checkpoint at {path} lacks {wk}")
        params["params"][f"conv{i}"]["kernel"] = jnp.asarray(
            np_(sd[wk]).transpose(2, 3, 1, 0))
        params["params"][f"conv{i}"]["bias"] = jnp.asarray(
            np_(sd[f"{prefix}{slot}.bias"]))
        slot += 1
        if relu:
            slot += 1
        if pool is not None:
            slot += 1
    return flax.core.freeze(params)
