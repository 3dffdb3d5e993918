"""Fetch the pretrained S2DNet checkpoint (egress-enabled environments only).

The reference auto-downloads the ECCV'20 S2DNet weights from Dropbox
(reference pixsfm/features/models/s2dnet.py:67,106-114) into its package
checkpoints/ dir. This repo's converter (pixsfm_tpu/features/models/
s2dnet.py:load_torch_s2dnet) reads the same .pth layout — verified
numerically against torch in tests/test_s2dnet_converter.py — so once this
script has run, `S2DNet({"pretrained": "s2dnet"})` picks the weights up with
no further steps.

Usage:  python tools/fetch_s2dnet_weights.py
"""

import sys
import urllib.request
from pathlib import Path

URL = "https://www.dropbox.com/s/hnv51iwu4hn82rj/s2dnet_weights.pth?dl=1"
DEST = (Path(__file__).resolve().parent.parent / "pixsfm_tpu" / "features" /
        "models" / "checkpoints" / "s2dnet_weights.pth")


def main() -> int:
    if DEST.exists():
        print(f"already present: {DEST}")
        return 0
    DEST.parent.mkdir(parents=True, exist_ok=True)
    print(f"downloading {URL} -> {DEST}")
    try:
        urllib.request.urlretrieve(URL, DEST)
    except OSError as e:
        print(f"download failed ({e}); this environment may have no egress",
              file=sys.stderr)
        return 1

    # Sanity-check: loadable and convertible.
    import torch

    sd = torch.load(DEST, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    n_enc = sum(1 for k in sd if k.startswith("encoder."))
    n_adap = sum(1 for k in sd if k.startswith("adaptation_layers."))
    print(f"checkpoint ok: {n_enc} encoder tensors, {n_adap} adaptation "
          f"tensors")
    from pixsfm_tpu.features.models.s2dnet import S2DNet

    net = S2DNet({"num_layers": 3, "pretrained": "s2dnet"})
    assert net.variables is not None
    print("converted to Flax params OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
