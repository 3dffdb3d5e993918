"""LoFTR in Flax — detector-free transformer matching (coarse-to-fine).

The reference's ETH3D method matrix includes "loftr" as a first-class
method (reference pixsfm/eval/eth3d/config.py:90-92 feature config,
:120-131 matcher config: outdoor weights, grayscale, resize_max 1024,
dfactor 8, match aggregation with max_error 1 px / cell_size 1); hloc runs
the public zju3dv/LoFTR network. This is a TPU-native implementation of
that network (outdoor dual-softmax variant):

1. **Backbone** ``ResNetFPN_8_2``: 7x7/s2 stem + 3 residual stages
   (128/196/256) down to 1/8, FPN top-down path back up to 1/2 —
   coarse features [H/8, W/8, 256] and fine features [H/2, W/2, 128].
2. **Positional encoding**: 2D sinusoidal, added to coarse features
   (``temp_bug_fix=False`` layout matching the released checkpoints).
3. **Coarse LoFTR module**: 4x (self, cross) linear-attention encoder
   layers (elu(x)+1 feature map, O(L) in sequence length), d=256, 8 heads.
4. **Coarse matching**: dual-softmax over the [L, S] similarity with
   temperature 0.1, mutual-max + confidence threshold, static top-K.
5. **Fine refinement**: 5x5 windows cut from the fine maps at each coarse
   match, optional coarse-feature concat (down_proj/merge_feat), 1x
   (self, cross) fine transformer (d=128), center-vector correlation +
   spatial expectation -> sub-pixel offset on image 1.

TPU design: everything is static-shape batched tensor work — the token
sequences are dense [L, 256] maps (linear attention keeps the cost at
O(L·d²) matmuls, ideal MXU shapes), coarse selection is a masked top-K,
and the fine stage is a vmapped [K, 25, 128] transformer. The whole
pairwise match is ONE jitted program.

Weights: zero-egress — if ``checkpoints/outdoor_ds.ckpt`` (public
checkpoint ``state_dict`` layout, optionally ``matcher.``-prefixed) is
present it is converted; otherwise deterministic random init + warning.
"""

from __future__ import annotations

import math
from functools import partial
from pathlib import Path
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import logger

__all__ = ["LoFTR", "load_torch_loftr", "position_encoding_sine",
           "upsample2x_align_corners"]


# ---------------------------------------------------------------------------
# backbone: ResNetFPN_8_2
# ---------------------------------------------------------------------------

INITIAL_DIM = 128
BLOCK_DIMS = (128, 196, 256)


class _BasicBlock(nn.Module):
    """LoFTR's BasicBlock: conv3x3-BN-ReLU-conv3x3-BN + (1x1/s + BN)
    shortcut when strided, final ReLU."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        use_bias=False, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=True, name="down_bn")(x)
        return nn.relu(x + y)


def upsample2x_align_corners(x):
    """2x bilinear upsample with align_corners=True semantics
    (out[i] samples in[i*(H-1)/(2H-1)]) on [B, H, W, C]."""
    B, H, W, C = x.shape

    def axis_weights(n):
        pos = jnp.arange(2 * n) * (n - 1) / (2 * n - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        w = (pos - lo).astype(x.dtype)
        return lo, hi, w

    y0, y1, wy = axis_weights(H)
    x0, x1, wx = axis_weights(W)
    top = x[:, y0][:, :, x0] * (1 - wx)[None, None, :, None] \
        + x[:, y0][:, :, x1] * wx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - wx)[None, None, :, None] \
        + x[:, y1][:, :, x1] * wx[None, None, :, None]
    return top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]


class _ResNetFPN_8_2(nn.Module):
    """Grayscale [B, H, W, 1] -> (coarse [B, H/8, W/8, 256],
    fine [B, H/2, W/2, 128]). H, W multiples of 8."""

    @nn.compact
    def __call__(self, x):
        d0, d1, d2 = BLOCK_DIMS
        x0 = nn.Conv(INITIAL_DIM, (7, 7), strides=2, padding=3,
                     use_bias=False, name="conv1")(x)
        x0 = nn.relu(nn.BatchNorm(use_running_average=True, name="bn1")(x0))
        x1 = _BasicBlock(d0, 1, name="layer1_0")(x0)
        x1 = _BasicBlock(d0, 1, name="layer1_1")(x1)       # 1/2
        x2 = _BasicBlock(d1, 2, name="layer2_0")(x1)
        x2 = _BasicBlock(d1, 1, name="layer2_1")(x2)       # 1/4
        x3 = _BasicBlock(d2, 2, name="layer3_0")(x2)
        x3 = _BasicBlock(d2, 1, name="layer3_1")(x3)       # 1/8

        # FPN top-down
        x3_out = nn.Conv(d2, (1, 1), use_bias=False,
                         name="layer3_outconv")(x3)
        x3_up = upsample2x_align_corners(x3_out)
        x2_out = nn.Conv(d2, (1, 1), use_bias=False,
                         name="layer2_outconv")(x2)
        h = nn.Conv(d2, (3, 3), padding=1, use_bias=False,
                    name="layer2_outconv2_0")(x2_out + x3_up)
        h = nn.BatchNorm(use_running_average=True,
                         name="layer2_outconv2_bn")(h)
        h = nn.leaky_relu(h)
        x2_out = nn.Conv(d1, (3, 3), padding=1, use_bias=False,
                         name="layer2_outconv2_1")(h)
        x2_up = upsample2x_align_corners(x2_out)
        x1_out = nn.Conv(d1, (1, 1), use_bias=False,
                         name="layer1_outconv")(x1)
        h = nn.Conv(d1, (3, 3), padding=1, use_bias=False,
                    name="layer1_outconv2_0")(x1_out + x2_up)
        h = nn.BatchNorm(use_running_average=True,
                         name="layer1_outconv2_bn")(h)
        h = nn.leaky_relu(h)
        x1_out = nn.Conv(d0, (3, 3), padding=1, use_bias=False,
                         name="layer1_outconv2_1")(h)
        return x3_out, x1_out


# ---------------------------------------------------------------------------
# positional encoding + linear-attention transformer
# ---------------------------------------------------------------------------

def position_encoding_sine(d_model: int, H: int, W: int,
                           temp_bug_fix: bool = False) -> np.ndarray:
    """2D sinusoidal encoding [H, W, d_model]; positions start at 1
    (cumsum-of-ones) as in the public PositionEncodingSine. The released
    checkpoints were trained with ``temp_bug_fix=False``, whose ``//``
    precedence bug collapses the frequency ladder — reproduced exactly."""
    ks = np.arange(0, d_model // 2, 2, dtype=np.float64)
    if temp_bug_fix:
        div = np.exp(ks * (-math.log(10000.0) / (d_model // 2)))
    else:  # (-log(1e4) / d_model) // 2 — the historical bug
        div = np.exp(ks * (-math.log(10000.0) / d_model // 2))
    ypos = np.arange(1, H + 1, dtype=np.float64)[:, None, None]
    xpos = np.arange(1, W + 1, dtype=np.float64)[None, :, None]
    pe = np.zeros((H, W, d_model), np.float32)
    pe[:, :, 0::4] = np.sin(xpos * div)
    pe[:, :, 1::4] = np.cos(xpos * div)
    pe[:, :, 2::4] = np.sin(ypos * div)
    pe[:, :, 3::4] = np.cos(ypos * div)
    return pe


def _linear_attention(q, k, v):
    """elu+1 kernelized attention over [B, L, h, d] (public
    LinearAttention): O(L) via the (K^T V) contraction."""
    q = nn.elu(q) + 1.0
    k = nn.elu(k) + 1.0
    v_length = v.shape[1]
    v = v / v_length
    kv = jnp.einsum("nshd,nshv->nhdv", k, v)
    z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", q, k.sum(axis=1)) + 1e-6)
    return jnp.einsum("nlhd,nhdv,nlh->nlhv", q, kv, z) * v_length


class _LoFTREncoderLayer(nn.Module):
    """Public LoFTREncoderLayer: bias-free qkv/merge projections, linear
    attention, concat-MLP residual update with two LayerNorms."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x, source):
        d, h = self.d_model, self.nhead
        dh = d // h
        B, L, _ = x.shape
        S = source.shape[1]
        q = nn.Dense(d, use_bias=False, name="q_proj")(x).reshape(B, L, h, dh)
        k = nn.Dense(d, use_bias=False,
                     name="k_proj")(source).reshape(B, S, h, dh)
        v = nn.Dense(d, use_bias=False,
                     name="v_proj")(source).reshape(B, S, h, dh)
        msg = _linear_attention(q, k, v).reshape(B, L, d)
        msg = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            nn.Dense(d, use_bias=False, name="merge")(msg))
        msg = jnp.concatenate([x, msg], axis=-1)
        msg = nn.Dense(2 * d, use_bias=False, name="mlp_0")(msg)
        msg = nn.Dense(d, use_bias=False, name="mlp_1")(nn.relu(msg))
        msg = nn.LayerNorm(epsilon=1e-5, name="norm2")(msg)
        return x + msg


class _LocalFeatureTransformer(nn.Module):
    """Alternating self/cross layers over two token sets."""

    d_model: int
    nhead: int
    layer_names: Sequence[str]

    @nn.compact
    def __call__(self, f0, f1):
        for i, kind in enumerate(self.layer_names):
            layer = _LoFTREncoderLayer(self.d_model, self.nhead,
                                       name=f"layer{i}")
            if kind == "self":
                f0 = layer(f0, f0)
                f1 = layer(f1, f1)
            else:
                f0n = layer(f0, f1)
                f1 = layer(f1, f0)
                f0 = f0n
        return f0, f1


class _FineHead(nn.Module):
    """FinePreprocess's cat_c_feat projections (with bias, as in the
    public nn.Linear defaults)."""

    @nn.compact
    def __call__(self, fine_win, coarse_vec):
        # fine_win [M, WW, 128], coarse_vec [M, 256]
        c = nn.Dense(128, name="down_proj")(coarse_vec)
        c = jnp.broadcast_to(c[:, None, :],
                             (*fine_win.shape[:2], c.shape[-1]))
        return nn.Dense(128, name="merge_feat")(
            jnp.concatenate([fine_win, c], axis=-1))


# ---------------------------------------------------------------------------
# full matcher
# ---------------------------------------------------------------------------

class _LoFTRNet(nn.Module):
    """Backbone + coarse transformer + fine transformer + fine head,
    bundled so one Flax variables tree holds every sub-network."""

    temp_bug_fix: bool = False

    def setup(self):
        self.backbone = _ResNetFPN_8_2(name="backbone")
        self.loftr_coarse = _LocalFeatureTransformer(
            256, 8, ("self", "cross") * 4, name="loftr_coarse")
        self.loftr_fine = _LocalFeatureTransformer(
            128, 8, ("self", "cross"), name="loftr_fine")
        self.fine_head = _FineHead(name="fine_head")

    def coarse_features(self, img0, img1):
        """[B,H,W,1] grayscale pair -> transformed coarse token maps
        ([B, L, 256] x2) + raw fine maps."""
        c0, f0 = self.backbone(img0)
        c1, f1 = self.backbone(img1)
        B, hc, wc, d = c0.shape
        pe = jnp.asarray(position_encoding_sine(d, hc, wc,
                                                self.temp_bug_fix))
        t0 = (c0 + pe).reshape(B, hc * wc, d)
        t1 = (c1 + pe).reshape(B, hc * wc, d)
        t0, t1 = self.loftr_coarse(t0, t1)
        return t0, t1, f0, f1

    def fine_refine(self, win0, win1, cvec0, cvec1):
        """win* [M, WW, 128] fine windows, cvec* [M, 256] coarse vectors
        at the matches -> (transformed win0, win1)."""
        w0 = self.fine_head(win0, cvec0)
        w1 = self.fine_head(win1, cvec1)
        return self.loftr_fine(w0, w1)

    def __call__(self, img0, img1):  # for init only
        t0, t1, f0, f1 = self.coarse_features(img0, img1)
        WW = 25
        win = jnp.zeros((2, WW, 128), t0.dtype)
        cv = jnp.zeros((2, 256), t0.dtype)
        self.fine_refine(win, win, cv, cv)
        return t0, t1, f0, f1


def _cut_windows(fmap, centers, w: int):
    """Gather [2w'+1]^2 windows (w odd) from [H, W, C] at integer centers
    [M, 2] (x, y) with edge clamping. Returns [M, w*w, C]."""
    H, W, C = fmap.shape
    r = w // 2
    off = jnp.arange(-r, r + 1)
    yy = jnp.clip(centers[:, 1, None] + off[None, :], 0, H - 1)
    xx = jnp.clip(centers[:, 0, None] + off[None, :], 0, W - 1)
    win = fmap[yy[:, :, None], xx[:, None, :]]        # [M, w, w, C]
    return win.reshape(centers.shape[0], w * w, C)


class LoFTR:
    """Pairwise detector-free matcher. ``match_pair(img0, img1)`` returns
    (mkpts0 [K,2], mkpts1 [K,2], conf [K], valid [K]) numpy with static K.

    Coordinates follow the public convention: coarse-cell integer grid x8
    for image 0, plus the fine sub-pixel offset on image 1."""

    default_conf = {
        "max_matches": 1024,
        "match_threshold": 0.2,
        "border_rm": 2,
        "dual_softmax_temperature": 0.1,
        "fine_window": 5,
        "temp_bug_fix": False,
        "pretrained": "loftr",
    }

    def __init__(self, conf: dict = None):
        from ...config import merge
        self.conf = merge(self.default_conf, conf or {})
        self.module = _LoFTRNet(temp_bug_fix=bool(self.conf.temp_bug_fix))
        z = jnp.zeros((1, 32, 32, 1), jnp.float32)
        variables = self.module.init(jax.random.PRNGKey(0), z, z)
        if self.conf.get("pretrained") == "loftr":
            ckpt = Path(__file__).parent / "checkpoints" / "outdoor_ds.ckpt"
            if ckpt.exists():
                variables = load_torch_loftr(ckpt, variables)
                logger.info("Loaded LoFTR checkpoint from %s", ckpt)
            else:
                logger.warning(
                    "LoFTR weights not found at %s (zero-egress "
                    "environment); using deterministic random init.", ckpt)
        self.variables = variables
        self._jit_match = {}

    def match_pair(self, img0: np.ndarray, img1: np.ndarray):
        """img* [H, W] float32 grayscale in [0,1], H, W multiples of 8
        (same shape for both)."""
        # the coarse grid has (H/8)*(W/8) cells; top_k needs k <= cells, so
        # clamp (small images would otherwise crash deep inside XLA)
        hc, wc = img0.shape[0] // 8, img0.shape[1] // 8
        max_matches = min(int(self.conf.max_matches), hc * wc)
        # cache key includes every conf value baked into the traced program:
        # mutating conf after a first call must not silently reuse stale
        # compiled settings for already-seen shapes
        conf_key = (max_matches, float(self.conf.match_threshold),
                    int(self.conf.border_rm),
                    float(self.conf.dual_softmax_temperature),
                    int(self.conf.fine_window))
        key = (img0.shape, img1.shape, conf_key)
        if key not in self._jit_match:
            self._jit_match[key] = jax.jit(partial(
                _match_pair_impl, module=self.module,
                max_matches=max_matches,
                thr=float(self.conf.match_threshold),
                border=int(self.conf.border_rm),
                temp=float(self.conf.dual_softmax_temperature),
                fine_w=int(self.conf.fine_window)))
        out = self._jit_match[key](self.variables,
                                   jnp.asarray(img0, jnp.float32),
                                   jnp.asarray(img1, jnp.float32))
        return tuple(np.asarray(o) for o in out)


def _match_pair_impl(variables, img0, img1, *, module, max_matches, thr,
                     border, temp, fine_w):
    H, W = img0.shape
    t0, t1, f0, f1 = module.apply(variables, img0[None, :, :, None],
                                  img1[None, :, :, None],
                                  method=module.coarse_features)
    hc, wc = H // 8, W // 8
    d = t0.shape[-1]
    # dual-softmax coarse confidence
    n0 = t0[0] / d ** 0.5
    n1 = t1[0] / d ** 0.5
    sim = (n0 @ n1.T) / temp                            # [L, S]
    conf = jax.nn.softmax(sim, axis=0) * jax.nn.softmax(sim, axis=1)
    # border removal on both grids
    ii = jnp.arange(hc * wc)
    in0 = ((ii % wc >= border) & (ii % wc < wc - border)
           & (ii // wc >= border) & (ii // wc < hc - border))
    ok = conf * in0[:, None] * in0[None, :]
    # mutual nearest + threshold
    mut = (ok == ok.max(axis=1, keepdims=True)) \
        & (ok == ok.max(axis=0, keepdims=True))
    scores = jnp.where(mut & (ok > thr), ok, 0.0)
    flat = scores.max(axis=1)                           # best per row
    jbest = scores.argmax(axis=1)
    val, isel = jax.lax.top_k(flat, max_matches)        # [K]
    jsel = jbest[isel]
    valid = val > 0.0

    # coarse pixel coordinates (stride-8 grid)
    xy0_c = jnp.stack([(isel % wc), (isel // wc)], axis=1)
    xy1_c = jnp.stack([(jsel % wc), (jsel // wc)], axis=1)

    # fine refinement: 5x5 windows on the 1/2-resolution maps
    centers0 = xy0_c * 4                                # coarse cell -> fine px
    centers1 = xy1_c * 4
    win0 = _cut_windows(f0[0], centers0, fine_w)        # [K, WW, 128]
    win1 = _cut_windows(f1[0], centers1, fine_w)
    cv0 = t0[0][isel]
    cv1 = t1[0][jsel]
    w0, w1 = module.apply(variables, win0, win1, cv0, cv1,
                          method=module.fine_refine)
    cf = w0.shape[-1]
    center = (fine_w * fine_w) // 2
    simf = jnp.einsum("mc,mrc->mr", w0[:, center], w1) / cf ** 0.5
    heat = jax.nn.softmax(simf, axis=1).reshape(-1, fine_w, fine_w)
    grid = jnp.arange(fine_w, dtype=heat.dtype)
    # normalized spatial expectation in [-1, 1] (kornia dsnt convention)
    gn = 2.0 * grid / (fine_w - 1) - 1.0
    ex = jnp.einsum("mij,j->m", heat, gn)
    ey = jnp.einsum("mij,i->m", heat, gn)
    offset = jnp.stack([ex, ey], axis=1) * (fine_w // 2) * 2.0  # fine px -> img

    mk0 = xy0_c.astype(jnp.float32) * 8.0
    mk1 = xy1_c.astype(jnp.float32) * 8.0 + offset
    return mk0, mk1, val, valid


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def load_torch_loftr(path, variables):
    """Convert the public LoFTR checkpoint (zju3dv/LoFTR ``outdoor_ds.ckpt``:
    ``{'state_dict': {...}}`` with keys ``backbone.*``, ``loftr_coarse.
    layers.N.*``, ``fine_preprocess.*``, ``loftr_fine.layers.N.*``,
    optionally ``matcher.``-prefixed) to the Flax variables tree."""
    import torch

    import flax

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k[8:] if k.startswith("matcher.") else k: v for k, v in sd.items()}

    params = flax.core.unfreeze(variables)

    def np_(t):
        return np.asarray(t.detach().cpu().numpy())

    def conv(dst, src):
        dst["kernel"] = jnp.asarray(np_(sd[f"{src}.weight"]).transpose(
            2, 3, 1, 0))
        if f"{src}.bias" in sd:
            dst["bias"] = jnp.asarray(np_(sd[f"{src}.bias"]))

    def bn(pdst, sdst, src):
        pdst["scale"] = jnp.asarray(np_(sd[f"{src}.weight"]))
        pdst["bias"] = jnp.asarray(np_(sd[f"{src}.bias"]))
        sdst["mean"] = jnp.asarray(np_(sd[f"{src}.running_mean"]))
        sdst["var"] = jnp.asarray(np_(sd[f"{src}.running_var"]))

    def dense(dst, src):
        dst["kernel"] = jnp.asarray(np_(sd[f"{src}.weight"]).T)
        if f"{src}.bias" in sd:
            dst["bias"] = jnp.asarray(np_(sd[f"{src}.bias"]))

    P = params["params"]["backbone"]
    S = params["batch_stats"]["backbone"]
    conv(P["conv1"], "backbone.conv1")
    bn(P["bn1"], S["bn1"], "backbone.bn1")
    for li, blocks in (("layer1", 2), ("layer2", 2), ("layer3", 2)):
        for b in range(blocks):
            name = f"{li}_{b}"
            conv(P[name]["conv1"], f"backbone.{li}.{b}.conv1")
            bn(P[name]["bn1"], S[name]["bn1"], f"backbone.{li}.{b}.bn1")
            conv(P[name]["conv2"], f"backbone.{li}.{b}.conv2")
            bn(P[name]["bn2"], S[name]["bn2"], f"backbone.{li}.{b}.bn2")
            if f"backbone.{li}.{b}.downsample.0.weight" in sd:
                conv(P[name]["down_conv"],
                     f"backbone.{li}.{b}.downsample.0")
                bn(P[name]["down_bn"], S[name]["down_bn"],
                   f"backbone.{li}.{b}.downsample.1")
    conv(P["layer3_outconv"], "backbone.layer3_outconv")
    for lvl in (2, 1):
        conv(P[f"layer{lvl}_outconv"], f"backbone.layer{lvl}_outconv")
        conv(P[f"layer{lvl}_outconv2_0"], f"backbone.layer{lvl}_outconv2.0")
        bn(P[f"layer{lvl}_outconv2_bn"], S[f"layer{lvl}_outconv2_bn"],
           f"backbone.layer{lvl}_outconv2.1")
        conv(P[f"layer{lvl}_outconv2_1"], f"backbone.layer{lvl}_outconv2.3")

    for mod, n_layers in (("loftr_coarse", 8), ("loftr_fine", 2)):
        M = params["params"][mod]
        for i in range(n_layers):
            L = M[f"layer{i}"]
            src = f"{mod}.layers.{i}"
            for proj in ("q_proj", "k_proj", "v_proj", "merge"):
                dense(L[proj], f"{src}.{proj}")
            dense(L["mlp_0"], f"{src}.mlp.0")
            dense(L["mlp_1"], f"{src}.mlp.2")
            for norm in ("norm1", "norm2"):
                L[norm]["scale"] = jnp.asarray(np_(sd[f"{src}.{norm}.weight"]))
                L[norm]["bias"] = jnp.asarray(np_(sd[f"{src}.{norm}.bias"]))

    F = params["params"]["fine_head"]
    dense(F["down_proj"], "fine_preprocess.down_proj")
    dense(F["merge_feat"], "fine_preprocess.merge_feat")
    return flax.core.freeze(params)
