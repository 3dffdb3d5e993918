"""VMEM-resident Pallas CG kernel vs jnp reference parity (interpret mode —
the kernel-vs-reference oracle pattern of the reference's interpolation_test,
SURVEY §4)."""

import jax.numpy as jnp
import numpy as np

from pixsfm_tpu.ops.cg_pallas import pcg_solve_pallas


def _random_spd(rng, P, N):
    A = rng.normal(0, 1, (P, N, N)).astype(np.float32)
    H = A @ np.swapaxes(A, 1, 2) / N + 0.5 * np.eye(N, dtype=np.float32)
    return H


def test_pallas_cg_matches_reference(rng):
    P, N = 8, 96
    H = _random_spd(rng, P, N)
    g = rng.normal(0, 1, (P, N)).astype(np.float32)
    dinv = 1.0 / np.einsum("pii->pi", H)

    ref = pcg_solve_pallas(jnp.asarray(H), jnp.asarray(g),
                           jnp.asarray(dinv), iters=25)
    ker = pcg_solve_pallas(jnp.asarray(H), jnp.asarray(g),
                           jnp.asarray(dinv), iters=25, interpret=True)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_cg_solves_system(rng):
    P, N = 4, 64
    H = _random_spd(rng, P, N)
    x_true = rng.normal(0, 1, (P, N)).astype(np.float32)
    g = -np.einsum("pij,pj->pi", H, x_true)
    dinv = 1.0 / np.einsum("pii->pi", H)

    x = pcg_solve_pallas(jnp.asarray(H), jnp.asarray(g), jnp.asarray(dinv),
                         iters=80, interpret=True)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-2, atol=1e-2)
