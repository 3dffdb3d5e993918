"""Compiled-program caching helpers.

Re-defining a closure and jitting it per call retraces every time; through the
remote TPU tunnel every retrace costs seconds to minutes. ``static_jit`` caches
one jitted instance per static-argument tuple; ``bucket`` pads dynamic batch
sizes to powers of two so shape-driven retraces are logarithmic, not per-size.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

__all__ = ["static_jit", "bucket", "interp_static_key"]


def static_jit(factory: Callable):
    """``factory(*static) -> fn``; returns ``get(*static) -> jitted fn`` with
    one compiled instance per static tuple."""
    import jax

    cache: Dict[Tuple, Callable] = {}

    def get(*static):
        if static not in cache:
            cache[static] = jax.jit(factory(*static))
        return cache[static]

    return get


def bucket(n: int, minimum: int = 8) -> int:
    """Next power-of-two >= n (>= minimum)."""
    n = max(int(n), 1)
    return max(1 << int(np.ceil(np.log2(n))), minimum)


def interp_static_key(interp) -> Tuple:
    return (interp.mode, interp.l2_normalize, interp.ncc_normalize,
            tuple(tuple(x) for x in interp.nodes),
            bool(getattr(interp, "check_bounds", False)))


def interp_from_key(key):
    from ..base.interpolation import InterpolationConfig
    return InterpolationConfig(mode=key[0], l2_normalize=key[1],
                               ncc_normalize=key[2],
                               nodes=[list(n) for n in key[3]],
                               check_bounds=bool(key[4])
                               if len(key) > 4 else False)
