"""Fetch ALL pretrained checkpoints (egress-enabled environments only).

Zero-egress environments cannot download weights, so every model in this
repo falls back to deterministic random init with a warning. Once egress
exists, this ONE command drops every public checkpoint into the auto-load
location (``pixsfm_tpu/features/models/checkpoints/``) and sanity-checks
each converter on the real file — after that, every featuremetric / eval
path runs real-weight with no further steps:

- **s2dnet_weights.pth** — ECCV'20 S2DNet (the reference auto-downloads the
  same file, reference pixsfm/features/models/s2dnet.py:67). Loader:
  ``S2DNet({"pretrained": "s2dnet"})``.
- **superpoint_v1.pth** — magicleap SuperPointPretrainedNetwork. Loader:
  ``SuperPoint({"pretrained": "superpoint"})``.
- **r2d2_WASF_N16.pt** — naver/r2d2. Loader: ``R2D2({"pretrained": "r2d2"})``.
- **d2_tf.pth** — mihaidusmanu/d2-net. Loader: ``D2Net({"pretrained": "d2net"})``.
- **outdoor_ds.ckpt** — zju3dv/LoFTR outdoor (dual-softmax). Loader:
  ``LoFTR({"pretrained": "loftr"})``. The official file lives on Google
  Drive; the kornia mirror is tried first, then a gdown fallback.

Each converter's acceptance of the REAL checkpoint key layout is tested
without egress in tests/test_checkpoint_layouts.py (re-keyed random state
dicts with the public names), and numerically in
tests/test_s2dnet_converter.py / test_detector_converters.py /
test_loftr.py.

Usage:  python tools/fetch_checkpoints.py [model ...]
        (models: s2dnet superpoint r2d2 d2net loftr; default: all)
"""

import sys
import urllib.request
from pathlib import Path

CKPT_DIR = (Path(__file__).resolve().parent.parent / "pixsfm_tpu" /
            "features" / "models" / "checkpoints")

# (filename, urls-to-try-in-order, verifier)
SPECS = {
    "s2dnet": ("s2dnet_weights.pth", [
        "https://www.dropbox.com/s/hnv51iwu4hn82rj/s2dnet_weights.pth?dl=1",
    ]),
    "superpoint": ("superpoint_v1.pth", [
        "https://github.com/magicleap/SuperPointPretrainedNetwork/raw/"
        "master/superpoint_v1.pth",
    ]),
    "r2d2": ("r2d2_WASF_N16.pt", [
        "https://github.com/naver/r2d2/raw/master/models/r2d2_WASF_N16.pt",
    ]),
    "d2net": ("d2_tf.pth", [
        "https://dusmanu.com/files/d2-net/d2_tf.pth",
        "https://dsmn.ml/files/d2-net/d2_tf.pth",
    ]),
    "loftr": ("outdoor_ds.ckpt", [
        # kornia's mirror of the official zju3dv/LoFTR outdoor weights
        "https://github.com/kornia/data/raw/main/loftr_outdoor.ckpt",
    ]),
}


def _verify(model: str, path: Path) -> None:
    """Run the converter on the real file (raises on layout mismatch)."""
    if model == "s2dnet":
        from pixsfm_tpu.features.models.s2dnet import S2DNet
        net = S2DNet({"num_layers": 3, "pretrained": "s2dnet"})
    elif model == "superpoint":
        from pixsfm_tpu.features.models.superpoint import SuperPoint
        net = SuperPoint({"pretrained": "superpoint"})
    elif model == "r2d2":
        from pixsfm_tpu.features.models.r2d2 import R2D2
        net = R2D2({"pretrained": "r2d2"})
    elif model == "d2net":
        from pixsfm_tpu.features.models.d2net import D2Net
        net = D2Net({"pretrained": "d2net"})
    elif model == "loftr":
        from pixsfm_tpu.features.models.loftr import LoFTR
        net = LoFTR({"pretrained": "loftr"})
    assert net.variables is not None
    print(f"  {model}: converted to Flax params OK")


def fetch(model: str) -> bool:
    fname, urls = SPECS[model]
    dest = CKPT_DIR / fname
    if dest.exists():
        print(f"{model}: already present at {dest}")
        _verify(model, dest)
        return True
    CKPT_DIR.mkdir(parents=True, exist_ok=True)
    for url in urls:
        print(f"{model}: downloading {url}")
        try:
            urllib.request.urlretrieve(url, dest)
            _verify(model, dest)
            return True
        except Exception as e:  # noqa: BLE001 — report and try next mirror
            print(f"  failed: {type(e).__name__}: {e}", file=sys.stderr)
            dest.unlink(missing_ok=True)
    if model == "loftr":
        # official distribution is a Google Drive folder; try gdown if present
        try:
            import gdown  # type: ignore

            gdown.download(id="1w1Qhea3WLRMS81Vod_k5rxS_GNRgIi-O",
                           output=str(dest), quiet=False)
            _verify(model, dest)
            return True
        except Exception as e:  # noqa: BLE001
            print(f"  gdown fallback failed: {e}", file=sys.stderr)
            dest.unlink(missing_ok=True)
    print(f"{model}: ALL mirrors failed (no egress?)", file=sys.stderr)
    return False


def main() -> int:
    models = sys.argv[1:] or list(SPECS)
    bad = [m for m in models if m not in SPECS]
    if bad:
        print(f"unknown models {bad}; choose from {list(SPECS)}",
              file=sys.stderr)
        return 2
    ok = all([fetch(m) for m in models])
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
