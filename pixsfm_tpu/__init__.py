"""pixsfm_tpu — TPU-native featuremetric Structure-from-Motion refinement.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of cvg/pixel-perfect-sfm
(reference: /root/reference). The Ceres+AVX2 C++ optimization core of the reference is
replaced by batched, padded XLA programs: bicubic feature interpolation as fused
einsum/Pallas kernels, keypoint adjustment as thousands of vmapped bounded
Levenberg-Marquardt subproblems, and bundle adjustment as a Schur-complement LM solve
that shards over a ``jax.sharding.Mesh`` for multi-chip scenes.

Logging setup mirrors the reference (pixsfm/__init__.py:1-14).
"""

import logging

__version__ = "0.1.0"

formatter = logging.Formatter(
    fmt="[%(asctime)s %(name)s %(levelname)s] %(message)s",
    datefmt="%Y/%m/%d %H:%M:%S")
handler = logging.StreamHandler()
handler.setFormatter(formatter)
handler.setLevel(logging.INFO)

logger = logging.getLogger("pixsfm_tpu")
logger.setLevel(logging.INFO)
logger.addHandler(handler)
logger.propagate = False


def set_debug():
    """Raise verbosity (reference: pixsfm/__init__.py:28-30)."""
    logger.setLevel(logging.DEBUG)
    handler.setLevel(logging.DEBUG)


from .config import DictConfig, OmegaConf, load_config, merge  # noqa: E402
from . import base  # noqa: E402
