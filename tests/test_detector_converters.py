"""Numerical verification of the torch->flax SuperPoint / R2D2 converters.

Zero egress blocks the public checkpoints (``superpoint_v1.pth``,
``r2d2_WASF_N16.pt``), so each test builds a torch model with the public
repo's exact module/state_dict layout (magicleap SuperPointNet; naver r2d2
``Quad_L2Net_ConfCFS``), randomly initializes it (including BatchNorm running
stats for r2d2 — affine-free BN at fresh init is the identity and would let a
broken conversion pass silently), saves a checkpoint, runs the converter, and
asserts the Flax forward matches the torch forward to float32 precision.
When the real weights are dropped into ``features/models/checkpoints/`` the
same converter paths run untouched."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from pixsfm_tpu.features.models.r2d2 import (  # noqa: E402
    R2D2, R2D2_CONV_PLAN, load_torch_r2d2)
from pixsfm_tpu.features.models.superpoint import (  # noqa: E402
    SuperPoint, load_torch_superpoint, sample_descriptors_coarse8,
    superpoint_scores_dense)


def _rel_err(a, b):
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


# ---------------------------------------------------------------------------
# SuperPoint
# ---------------------------------------------------------------------------

class TorchSuperPointNet(nn.Module):
    """magicleap SuperPointNet layout (demo_superpoint.py): flat conv
    attributes conv1a..convDb, shared encoder, 65-ch detector head,
    256-ch descriptor head."""

    def __init__(self):
        super().__init__()
        c1, c2, c3, c4, c5, d1 = 64, 64, 128, 128, 256, 256
        self.conv1a = nn.Conv2d(1, c1, 3, 1, 1)
        self.conv1b = nn.Conv2d(c1, c1, 3, 1, 1)
        self.conv2a = nn.Conv2d(c1, c2, 3, 1, 1)
        self.conv2b = nn.Conv2d(c2, c2, 3, 1, 1)
        self.conv3a = nn.Conv2d(c2, c3, 3, 1, 1)
        self.conv3b = nn.Conv2d(c3, c3, 3, 1, 1)
        self.conv4a = nn.Conv2d(c3, c4, 3, 1, 1)
        self.conv4b = nn.Conv2d(c4, c4, 3, 1, 1)
        self.convPa = nn.Conv2d(c4, c5, 3, 1, 1)
        self.convPb = nn.Conv2d(c5, 65, 1, 1, 0)
        self.convDa = nn.Conv2d(c4, c5, 3, 1, 1)
        self.convDb = nn.Conv2d(c5, d1, 1, 1, 0)

    def forward(self, x):
        relu, pool = F.relu, lambda t: F.max_pool2d(t, 2, 2)
        x = relu(self.conv1b(relu(self.conv1a(x))))
        x = pool(x)
        x = relu(self.conv2b(relu(self.conv2a(x))))
        x = pool(x)
        x = relu(self.conv3b(relu(self.conv3a(x))))
        x = pool(x)
        x = relu(self.conv4b(relu(self.conv4a(x))))
        semi = self.convPb(relu(self.convPa(x)))
        desc = self.convDb(relu(self.convDa(x)))
        return semi, desc


def test_superpoint_converter_matches_torch(tmp_path):
    torch.manual_seed(0)
    tmodel = TorchSuperPointNet()
    pth = tmp_path / "superpoint_v1.pth"
    torch.save(tmodel.state_dict(), pth)

    sp = SuperPoint({"pretrained": None})
    sp.variables = load_torch_superpoint(pth, sp.variables)

    rng = np.random.default_rng(1)
    # odd dims stress pool flooring (torch floors; our max_pool VALID floors)
    gray = rng.uniform(0, 1, (1, 120, 160, 1)).astype(np.float32)
    semi_f, desc_f = sp.module.apply(sp.variables, jnp.asarray(gray))
    with torch.no_grad():
        semi_t, desc_t = tmodel(torch.from_numpy(gray.transpose(0, 3, 1, 2)))
    semi_t = semi_t.permute(0, 2, 3, 1).numpy()
    desc_t = desc_t.permute(0, 2, 3, 1).numpy()
    assert semi_f.shape == semi_t.shape
    assert _rel_err(np.asarray(semi_f), semi_t) < 1e-5
    assert _rel_err(np.asarray(desc_f), desc_t) < 1e-5


def test_superpoint_score_decoding_matches_torch(tmp_path):
    """The softmax + dustbin + 8x8 shuffle must reproduce the public
    decode (torch: softmax over dim 1, drop 65th, reshape Hc,Wc,8,8 ->
    interleave)."""
    rng = np.random.default_rng(2)
    semi = rng.normal(0, 1, (1, 5, 7, 65)).astype(np.float32)
    ours = np.asarray(superpoint_scores_dense(jnp.asarray(semi)))

    t = torch.from_numpy(semi.transpose(0, 3, 1, 2))
    dense = torch.softmax(t, 1)[:, :-1]
    b, _, hc, wc = dense.shape
    dense = dense.permute(0, 2, 3, 1).reshape(b, hc, wc, 8, 8)
    dense = dense.permute(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)
    np.testing.assert_allclose(ours, dense.numpy(), rtol=1e-5, atol=1e-7)


def test_superpoint_descriptor_sampling_matches_grid_sample():
    """Bilinear coarse-map sampling must match hloc's normalized
    grid_sample(align_corners=True) path."""
    rng = np.random.default_rng(3)
    Hc, Wc, C = 6, 9, 16
    desc = rng.normal(0, 1, (1, Hc, Wc, C)).astype(np.float32)
    kp = rng.uniform(4, 40, (1, 25, 2)).astype(np.float32)
    ours = np.asarray(sample_descriptors_coarse8(jnp.asarray(kp),
                                                 jnp.asarray(desc)))

    t_desc = torch.from_numpy(desc.transpose(0, 3, 1, 2))
    t_kp = torch.from_numpy(kp.copy())
    s = 8
    t_kp = t_kp - s / 2 + 0.5
    t_kp = t_kp / torch.tensor([(Wc * s - s / 2 - 0.5),
                                (Hc * s - s / 2 - 0.5)])[None, None]
    t_kp = t_kp * 2 - 1
    samp = F.grid_sample(t_desc, t_kp.view(1, 1, -1, 2), mode="bilinear",
                         align_corners=True)
    samp = F.normalize(samp.reshape(1, C, -1), p=2, dim=1)
    ref = samp.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_superpoint_detect_finds_corners():
    """End-to-end detect() smoke on random weights: static shapes, finite
    outputs, coords inside the border, descriptors unit-norm."""
    sp = SuperPoint({"pretrained": None, "max_keypoints": 64,
                     "keypoint_threshold": -1.0})
    img = np.random.default_rng(4).uniform(0, 1, (1, 96, 128, 3)).astype(
        np.float32)
    out = sp.detect(img)
    assert out["keypoints"].shape == (1, 64, 2)
    assert np.isfinite(out["scores"]).all()
    k = out["keypoints"][out["valid"]]
    assert (k[:, 0] >= 4).all() and (k[:, 0] < 124).all()
    assert (k[:, 1] >= 4).all() and (k[:, 1] < 92).all()
    n = np.linalg.norm(out["descriptors"][0], axis=-1)
    np.testing.assert_allclose(n[out["valid"][0]], 1.0, atol=1e-4)


# ---------------------------------------------------------------------------
# R2D2
# ---------------------------------------------------------------------------

def build_torch_r2d2(seed=0):
    """naver r2d2 Quad_L2Net_ConfCFS in dilated (fully-convolutional) mode:
    ops = ModuleList of Conv2d / BatchNorm2d(affine=False) / ReLU built by
    _add_conv with stride folded into dilation, + clf/sal 1x1 heads over
    the squared descriptor activations."""
    torch.manual_seed(seed)
    ops = nn.ModuleList()
    in_ch = 3
    for ch, k, d, use_bn, use_relu in R2D2_CONV_PLAN:
        pad = ((k - 1) * d) // 2
        ops.append(nn.Conv2d(in_ch, ch, kernel_size=k, padding=pad,
                             dilation=d, stride=1))
        if use_bn:
            ops.append(nn.BatchNorm2d(ch, affine=False))
        if use_relu:
            ops.append(nn.ReLU(inplace=True))
        in_ch = ch
    model = nn.Module()
    model.ops = ops
    model.clf = nn.Conv2d(128, 2, kernel_size=1)
    model.sal = nn.Conv2d(128, 1, kernel_size=1)

    # randomize running stats: affine-free fresh BN is the identity map
    gen = torch.Generator().manual_seed(seed + 1)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)
    return model


def torch_r2d2_forward(model, x):
    model.eval()
    with torch.no_grad():
        h = x
        for op in model.ops:
            h = op(h)
        desc = F.normalize(h, p=2, dim=1)
        urel = model.clf(h ** 2)
        urep = model.sal(h ** 2)
        rel = torch.softmax(urel, dim=1)[:, 1:2]
        sp = F.softplus(urep)
        rep = sp / (1 + sp)
    to = lambda t: t.permute(0, 2, 3, 1).numpy()  # noqa: E731
    return to(desc), to(rel), to(rep)


def test_r2d2_converter_matches_torch(tmp_path):
    tmodel = build_torch_r2d2(seed=5)
    pth = tmp_path / "r2d2_WASF_N16.pt"
    torch.save({"state_dict": tmodel.state_dict()}, pth)

    net = R2D2({"pretrained": None})
    net.variables = load_torch_r2d2(pth, net.variables)

    rng = np.random.default_rng(6)
    raw = rng.uniform(-1, 1, (1, 61, 77, 3)).astype(np.float32)
    desc_f, rel_f, rep_f = net.module.apply(net.variables, jnp.asarray(raw))
    desc_t, rel_t, rep_t = torch_r2d2_forward(
        tmodel, torch.from_numpy(raw.transpose(0, 3, 1, 2)))
    # full resolution preserved by the dilated plan
    assert desc_f.shape == (1, 61, 77, 128)
    assert desc_t.shape == (1, 61, 77, 128)
    assert _rel_err(np.asarray(desc_f), desc_t) < 1e-4
    assert _rel_err(np.asarray(rel_f), rel_t) < 1e-4
    assert _rel_err(np.asarray(rep_f), rep_t) < 1e-4


def test_r2d2_detect_static_shapes():
    net = R2D2({"pretrained": None, "max_keypoints": 32,
                "reliability_threshold": 0.0, "repeatability_threshold": 0.0})
    img = np.random.default_rng(7).uniform(0, 1, (1, 64, 80, 3)).astype(
        np.float32)
    out = net.detect(img)
    assert out["keypoints"].shape == (1, 32, 2)
    assert out["descriptors"].shape == (1, 32, 128)
    n = np.linalg.norm(out["descriptors"][0][out["valid"][0]], axis=-1)
    if n.size:
        np.testing.assert_allclose(n, 1.0, atol=1e-4)


# ---------------------------------------------------------------------------
# D2-Net
# ---------------------------------------------------------------------------

from pixsfm_tpu.features.models.d2net import (  # noqa: E402
    CAFFE_MEAN_BGR, D2NET_CONV_PLAN, D2Net, hard_detection, load_torch_d2net)


def build_torch_d2net(seed=0):
    """mihaidusmanu/d2-net test-time DenseFeatureExtractionModule:
    nn.Sequential of VGG16 conv1_1..conv4_3 with pool3 stride 1 and
    dilated conv4, wrapped under ``dense_feature_extraction.model`` as in
    the public ``d2_tf.pth`` checkpoint layout."""
    torch.manual_seed(seed)
    layers = []
    in_ch = 3
    for ch, d, relu, pool in D2NET_CONV_PLAN:
        layers.append(nn.Conv2d(in_ch, ch, 3, padding=d, dilation=d))
        if relu:
            layers.append(nn.ReLU(inplace=True))
        if pool == "2x2":
            layers.append(nn.MaxPool2d(2, stride=2))
        elif pool == "2x1":
            layers.append(nn.MaxPool2d(2, stride=1))
        in_ch = ch
    inner = nn.Module()
    inner.model = nn.Sequential(*layers)
    outer = nn.Module()
    outer.dense_feature_extraction = inner
    return outer


def torch_d2net_forward(model, x):
    model.eval()
    with torch.no_grad():
        out = model.dense_feature_extraction.model(x)
    return out.permute(0, 2, 3, 1).numpy()


def test_d2net_converter_matches_torch(tmp_path):
    tmodel = build_torch_d2net(seed=8)
    pth = tmp_path / "d2_tf.pth"
    torch.save(tmodel.state_dict(), pth)

    net = D2Net({"pretrained": None})
    net.variables = load_torch_d2net(pth, net.variables)

    rng = np.random.default_rng(9)
    raw = rng.uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32)
    f_flax = np.asarray(net.module.apply(net.variables, jnp.asarray(raw)))
    f_torch = torch_d2net_forward(tmodel,
                                  torch.from_numpy(raw.transpose(0, 3, 1, 2)))
    # stride 4 with the stride-1 pool3 eating one row/col: (64/4-1, 96/4-1)
    assert f_flax.shape == (1, 15, 23, 512)
    assert f_flax.shape == f_torch.shape
    assert _rel_err(f_flax, f_torch) < 1e-4


def test_d2net_hard_detection_matches_torch():
    """The hard-detection gate (depthwise max + 3x3 local max + Hessian
    edge rejection) must reproduce the public HardDetectionModule."""
    rng = np.random.default_rng(10)
    fmap = rng.normal(0, 1, (1, 12, 14, 8)).astype(np.float32)
    ours = np.asarray(hard_detection(jnp.asarray(fmap), edge_threshold=5.0))

    t = torch.from_numpy(fmap.transpose(0, 3, 1, 2))
    depth_max = t.max(dim=1, keepdim=True).values
    is_depth_max = t == depth_max
    local_max = F.max_pool2d(t, 3, stride=1, padding=1)
    is_local_max = t == local_max
    dii_f = torch.tensor([[0, 1., 0], [0, -2., 0], [0, 1., 0]])
    dij_f = 0.25 * torch.tensor([[1., 0, -1.], [0, 0., 0], [-1., 0, 1.]])
    djj_f = torch.tensor([[0, 0, 0], [1., -2., 1.], [0, 0, 0]])
    c = t.shape[1]
    conv = lambda f: F.conv2d(t, f.view(1, 1, 3, 3).expand(c, -1, -1, -1),  # noqa: E731
                              padding=1, groups=c)
    dii, dij, djj = conv(dii_f), conv(dij_f), conv(djj_f)
    det = dii * djj - dij * dij
    tr = dii + djj
    thr = (5.0 + 1) ** 2 / 5.0
    not_edge = (det > 0) & (tr * tr <= thr * det)
    detected = (is_depth_max & is_local_max & not_edge).any(dim=1)
    ref = torch.where(detected, depth_max[:, 0], torch.zeros(())).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_d2net_preprocess_is_caffe():
    img = np.random.default_rng(11).uniform(0, 1, (1, 4, 4, 3)).astype(
        np.float32)
    got = np.asarray(D2Net._preprocess_caffe(jnp.asarray(img)))
    ref = img[..., ::-1] * 255.0 - CAFFE_MEAN_BGR
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


def test_d2net_detect_static_shapes():
    net = D2Net({"pretrained": None, "max_keypoints": 32})
    img = np.random.default_rng(12).uniform(0, 1, (1, 64, 80, 3)).astype(
        np.float32)
    out = net.detect(img)
    assert out["keypoints"].shape == (1, 32, 2)
    assert out["descriptors"].shape == (1, 32, 512)
    k = out["keypoints"][out["valid"]]
    if len(k):
        # 4*p + 1.5 mapping keeps detections on the image canvas
        assert (k[:, 0] >= 1.5).all() and (k[:, 0] <= 79).all()
        assert (k[:, 1] >= 1.5).all() and (k[:, 1] <= 63).all()
    n = np.linalg.norm(out["descriptors"][0][out["valid"][0]], axis=-1)
    if n.size:
        np.testing.assert_allclose(n, 1.0, atol=1e-4)
