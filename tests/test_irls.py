"""IRLS robust mean oracles (reference: base/src/irls_optim_test.cc:11-55 —
static/dynamic parity at C in {3,128}, n in {10,100,1000})."""

import jax.numpy as jnp
import numpy as np
import pytest

from pixsfm_tpu.base.losses import RobustLoss
from pixsfm_tpu.bundle_adjustment.references import robust_mean_irls


@pytest.mark.parametrize("C", [3, 128])
@pytest.mark.parametrize("n", [10, 100, 1000])
def test_trivial_loss_equals_arithmetic_mean(C, n):
    rng = np.random.default_rng(C * 1000 + n)
    d = rng.normal(0, 1, (n, C)).astype(np.float32)
    valid = np.ones(n, bool)
    m = robust_mean_irls(jnp.asarray(d), jnp.asarray(valid),
                         RobustLoss("trivial"), iters=5, l2_normalize=False)
    np.testing.assert_allclose(np.asarray(m), d.mean(axis=0), atol=1e-5)


@pytest.mark.parametrize("C", [3, 128])
def test_robust_to_outliers(C):
    """Cauchy IRLS mean stays near the inlier cluster despite 20% outliers."""
    rng = np.random.default_rng(C)
    n = 100
    center = rng.normal(0, 1, C).astype(np.float32)
    d = center[None] + 0.05 * rng.normal(0, 1, (n, C)).astype(np.float32)
    d[:20] += 5.0 * rng.normal(0, 1, (20, C)).astype(np.float32)
    valid = np.ones(n, bool)
    m = robust_mean_irls(jnp.asarray(d), jnp.asarray(valid),
                         RobustLoss("cauchy", [0.25]), iters=50,
                         l2_normalize=False)
    err_robust = np.linalg.norm(np.asarray(m) - center)
    err_plain = np.linalg.norm(d.mean(axis=0) - center)
    assert err_robust < 0.2 * err_plain, (err_robust, err_plain)
    assert err_robust < 0.1


def test_validity_mask():
    rng = np.random.default_rng(0)
    d = rng.normal(0, 1, (20, 8)).astype(np.float32)
    valid = np.zeros(20, bool)
    valid[:10] = True
    m = robust_mean_irls(jnp.asarray(d), jnp.asarray(valid),
                         RobustLoss("trivial"), iters=3, l2_normalize=False)
    np.testing.assert_allclose(np.asarray(m), d[:10].mean(axis=0), atol=1e-5)


def test_l2_normalized_mean_is_unit():
    rng = np.random.default_rng(1)
    d = rng.normal(0, 1, (50, 16)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    m = robust_mean_irls(jnp.asarray(d), jnp.asarray(np.ones(50, bool)),
                         RobustLoss("cauchy", [0.25]), iters=20,
                         l2_normalize=True)
    np.testing.assert_allclose(float(jnp.linalg.norm(m)), 1.0, atol=1e-5)
