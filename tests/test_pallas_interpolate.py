"""Pallas gather-interpolate kernel vs jnp reference parity (interpret mode —
the kernel-vs-reference oracle of the reference's interpolation_test, SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pixsfm_tpu.base.interpolation import InterpolationConfig
from pixsfm_tpu.ops.interpolate_pallas import interpolate_batch


@pytest.mark.parametrize("l2", [False, True])
def test_kernel_matches_reference(l2, rng):
    N, ps, C, B = 12, 16, 128, 16
    patches = rng.normal(0, 1, (N, ps, ps, C)).astype(np.float32)
    rows = rng.integers(0, N, B).astype(np.int32)
    r = rng.uniform(2.0, ps - 3.0, B).astype(np.float32)
    c = rng.uniform(2.0, ps - 3.0, B).astype(np.float32)
    cfg = InterpolationConfig(mode="BICUBIC", l2_normalize=l2)

    ref = interpolate_batch(jnp.asarray(patches), jnp.asarray(rows),
                            jnp.asarray(r), jnp.asarray(c), cfg,
                            use_pallas=False)
    ker = interpolate_batch(jnp.asarray(patches), jnp.asarray(rows),
                            jnp.asarray(r), jnp.asarray(c), cfg,
                            interpret=True)
    for a, b in zip(ker, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_kernel_bf16_storage(rng):
    N, ps, C, B = 8, 16, 128, 8
    patches = rng.normal(0, 1, (N, ps, ps, C)).astype(jnp.bfloat16)
    rows = rng.integers(0, N, B).astype(np.int32)
    r = rng.uniform(2.0, ps - 3.0, B).astype(np.float32)
    c = rng.uniform(2.0, ps - 3.0, B).astype(np.float32)
    cfg = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
    ref = interpolate_batch(jnp.asarray(patches), jnp.asarray(rows),
                            jnp.asarray(r), jnp.asarray(c), cfg,
                            use_pallas=False)
    ker = interpolate_batch(jnp.asarray(patches), jnp.asarray(rows),
                            jnp.asarray(r), jnp.asarray(c), cfg,
                            interpret=True)
    for a, b in zip(ker, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
