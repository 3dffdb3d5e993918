"""Feature-model base class (reference: pixsfm/features/models/base_model.py).

Models are Flax modules wrapped in a thin host-side driver that owns the params,
jits the forward pass per input shape, and exposes ``output_dims`` / ``scales``
like the reference's torch BaseModel.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ...config import merge

__all__ = ["BaseModel"]


class BaseModel:
    default_conf = {"name": "???"}
    output_dims: Optional[List[int]] = None   # channels per returned level
    scales: Optional[List[int]] = None        # downscale per level vs input

    def __init__(self, conf=None):
        self.conf = merge({"name": self.__class__.__name__.lower()},
                          self.default_conf, conf or {})
        self._jitted = None
        self._init(self.conf)
        assert self.output_dims is not None
        if self.scales is not None:
            assert len(self.output_dims) == len(self.scales)

    # -- to be implemented --------------------------------------------------
    def _init(self, conf):
        raise NotImplementedError

    def _forward(self, image):
        """image: [1, H, W, 3] float32 in [0,1] -> list of [1, h, w, C]."""
        raise NotImplementedError

    # -- driver -------------------------------------------------------------
    def __call__(self, image: np.ndarray) -> List[np.ndarray]:
        import jax
        if self._jitted is None:
            self._jitted = jax.jit(self._forward)
        feats = self._jitted(image)
        return list(feats)

    def preprocess(self, image) -> np.ndarray:
        """PIL.Image -> [1, H, W, 3] float32 in [0, 1] (NHWC — TPU layout)."""
        arr = np.asarray(image, dtype=np.float32)
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        if arr.shape[-1] == 4:
            arr = arr[..., :3]
        if arr.max() > 1.5:
            arr = arr / 255.0
        return arr[None]
