"""Unit tests for the batched bounded LM core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixsfm_tpu.ops.lm import LMOptions, lm_solve


def quadratic_problem(P=16, N=6, seed=0):
    """Random strictly-convex quadratics: f_p(x) = 0.5 (x-x*)^T A (x-x*)."""
    rng = np.random.default_rng(seed)
    Q = rng.normal(0, 1, (P, N, N))
    A = np.einsum("pij,pkj->pik", Q, Q) + 0.5 * np.eye(N)
    x_star = rng.normal(0, 1, (P, N))
    Aj = jnp.asarray(A, jnp.float32)
    xs = jnp.asarray(x_star, jnp.float32)

    def system_fn(x):
        r = x - xs
        g = jnp.einsum("pij,pj->pi", Aj, r)
        cost = 0.5 * jnp.einsum("pi,pi->p", r, g)
        return cost, jnp.broadcast_to(Aj, (P, N, N)), g

    def cost_fn(x):
        r = x - xs
        return 0.5 * jnp.einsum("pi,pij,pj->p", r, Aj, r)

    return system_fn, cost_fn, x_star


def test_converges_to_optimum():
    system_fn, cost_fn, x_star = quadratic_problem()
    x0 = jnp.zeros((16, 6), jnp.float32)
    x, summary = lm_solve(system_fn, cost_fn, x0,
                          opts=LMOptions(max_iterations=50,
                                         parameter_tolerance=1e-8))
    np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-3)
    assert bool(jnp.all(summary.final_cost < 1e-5))


def test_respects_bounds():
    system_fn, cost_fn, x_star = quadratic_problem(seed=1)
    x0 = jnp.zeros((16, 6), jnp.float32)
    lower = jnp.full((16, 6), -0.3)
    upper = jnp.full((16, 6), 0.3)
    x, _ = lm_solve(system_fn, cost_fn, x0, lower=lower, upper=upper,
                    opts=LMOptions(max_iterations=50))
    assert bool(jnp.all(x >= lower - 1e-6))
    assert bool(jnp.all(x <= upper + 1e-6))
    # clipped coordinates should sit at the boundary when x* is outside
    outside = np.abs(x_star) > 0.35
    at_bound = np.abs(np.abs(np.asarray(x)) - 0.3) < 5e-2
    assert (at_bound[outside].mean()) > 0.5


def test_frozen_params_do_not_move():
    system_fn, cost_fn, x_star = quadratic_problem(seed=2)
    x0 = jnp.zeros((16, 6), jnp.float32)
    mask = jnp.ones((16, 6), bool).at[:, 0].set(False)
    x, _ = lm_solve(system_fn, cost_fn, x0, param_mask=mask,
                    opts=LMOptions(max_iterations=30))
    np.testing.assert_allclose(np.asarray(x)[:, 0], 0.0, atol=1e-8)


def test_problem_mask_skips_padding():
    system_fn, cost_fn, x_star = quadratic_problem(seed=3)
    x0 = jnp.zeros((16, 6), jnp.float32)
    pmask = jnp.ones(16, bool).at[8:].set(False)
    x, summary = lm_solve(system_fn, cost_fn, x0, problem_mask=pmask,
                          opts=LMOptions(max_iterations=30))
    assert bool(jnp.all(summary.initial_cost[8:] == 0.0))


def test_iteration_cap():
    system_fn, cost_fn, _ = quadratic_problem(seed=4)
    x0 = jnp.zeros((16, 6), jnp.float32)
    _, summary = lm_solve(system_fn, cost_fn, x0,
                          opts=LMOptions(max_iterations=3,
                                         parameter_tolerance=0.0))
    assert int(jnp.max(summary.iterations)) <= 3


def test_nonmonotonic_acceptance():
    """GLL acceptance still converges and returns the best iterate."""
    system_fn, cost_fn, x_star = quadratic_problem(seed=5)
    x0 = jnp.zeros((16, 6), jnp.float32)
    x, summary = lm_solve(
        system_fn, cost_fn, x0,
        opts=LMOptions(max_iterations=60, parameter_tolerance=1e-8,
                       use_nonmonotonic_steps=True, nonmonotonic_window=5))
    np.testing.assert_allclose(np.asarray(x), x_star, atol=1e-3)
    # final reported cost is the best cost seen
    direct = np.asarray(cost_fn(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(summary.final_cost), direct,
                               atol=1e-5)


def test_cg_linear_solver_converges():
    """Jacobi-PCG inexact steps still converge to the optimum."""
    system_fn, cost_fn, x_star = quadratic_problem(seed=6)
    x0 = jnp.zeros((16, 6), jnp.float32)
    x, summary = lm_solve(system_fn, cost_fn, x0,
                          opts=LMOptions(max_iterations=60,
                                         parameter_tolerance=1e-8,
                                         linear_solver="cg",
                                         cg_iterations=15))
    np.testing.assert_allclose(np.asarray(x), x_star, atol=2e-3)
    assert bool(jnp.all(summary.final_cost < 1e-4))
