"""Interpolation oracle tests, porting the reference's test strategy
(pixsfm/base/src/interpolation_test.cc — SURVEY.md §4):

(a) bicubic/bilinear reproduce analytic polynomial surfaces + derivatives;
(b) L2-normalization invariant + chain rule;
(c) NCC mean-0/std-1 invariant;
(d) Jet-consistency: jax autodiff of the value == explicit dfdr/dfdc;
(e) dtype parity (half/bfloat16/float32 storage).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixsfm_tpu.base.interpolation import (
    InterpolationConfig, interpolate, interpolate_nodes,
    interpolate_with_grad, ncc_normalize,
)


def poly_patch(H=12, W=12, C=3, coeffs=None):
    """Quadratic surface per channel: f(r,c) = a + b r + c_ c + d r^2 + e rc + g c^2."""
    if coeffs is None:
        rng = np.random.default_rng(42)
        coeffs = rng.uniform(-1, 1, size=(C, 6))
    r, c = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    chans = []
    for a, b, cc, d, e, g in coeffs:
        chans.append(a + b * r + cc * c + d * r**2 + e * r * c + g * c**2)
    return np.stack(chans, axis=-1).astype(np.float32), coeffs


def eval_poly(coeffs, r, c):
    out = []
    for a, b, cc, d, e, g in coeffs:
        out.append(a + b * r + cc * c + d * r**2 + e * r * c + g * c**2)
    return np.array(out)


def eval_poly_dr(coeffs, r, c):
    return np.array([b + 2 * d * r + e * c for a, b, cc, d, e, g in coeffs])


def eval_poly_dc(coeffs, r, c):
    return np.array([cc + e * r + 2 * g * c for a, b, cc, d, e, g in coeffs])


CFG_RAW = InterpolationConfig(mode="BICUBIC", l2_normalize=False)


class TestBicubicOracle:
    def test_reproduces_quadratic_surface(self):
        patch, coeffs = poly_patch()
        for (r, c) in [(3.3, 4.7), (5.0, 5.0), (2.01, 8.99), (6.5, 3.25)]:
            f, dfdr, dfdc = interpolate_with_grad(
                jnp.asarray(patch), r, c, CFG_RAW)
            np.testing.assert_allclose(np.asarray(f), eval_poly(coeffs, r, c),
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(dfdr),
                                       eval_poly_dr(coeffs, r, c), atol=1e-3)
            np.testing.assert_allclose(np.asarray(dfdc),
                                       eval_poly_dc(coeffs, r, c), atol=1e-3)

    def test_cross_derivative(self):
        patch, coeffs = poly_patch()
        f, dfdr, dfdc, dfdrc = interpolate_with_grad(
            jnp.asarray(patch), 4.4, 5.6, CFG_RAW, cross=True)
        # For quadratic surfaces d2f/drdc = e
        np.testing.assert_allclose(np.asarray(dfdrc),
                                   [e for a, b, cc, d, e, g in coeffs],
                                   atol=1e-3)

    def test_boundary_clamping_no_nan(self):
        patch, _ = poly_patch()
        for (r, c) in [(0.0, 0.0), (-0.4, -0.4), (11.9, 11.9), (0.2, 11.0)]:
            f, dfdr, dfdc = interpolate_with_grad(jnp.asarray(patch), r, c,
                                                  CFG_RAW)
            assert np.all(np.isfinite(np.asarray(f)))
            assert np.all(np.isfinite(np.asarray(dfdr)))

    def test_interior_grid_values_exact(self):
        patch, coeffs = poly_patch()
        # at integer grid points (interior) the spline interpolates exactly
        f = interpolate(jnp.asarray(patch), 5.0, 7.0, CFG_RAW)
        np.testing.assert_allclose(np.asarray(f), patch[5, 7], atol=1e-5)


class TestBilinear:
    def test_value_on_linear_surface(self):
        rng = np.random.default_rng(1)
        coeffs = rng.uniform(-1, 1, size=(3, 6))
        coeffs[:, 3:] = 0.0  # linear only
        patch, coeffs = poly_patch(coeffs=coeffs)
        cfg = InterpolationConfig(mode="BILINEAR", l2_normalize=False)
        f, dfdr, dfdc = interpolate_with_grad(jnp.asarray(patch), 3.4, 6.8, cfg)
        np.testing.assert_allclose(np.asarray(f), eval_poly(coeffs, 3.4, 6.8),
                                   atol=1e-4)
        # reference semantics: forward differences == exact slope on linear fn
        np.testing.assert_allclose(np.asarray(dfdr),
                                   eval_poly_dr(coeffs, 0, 0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dfdc),
                                   eval_poly_dc(coeffs, 0, 0), atol=1e-4)


class TestNearest:
    def test_value(self):
        patch, _ = poly_patch()
        cfg = InterpolationConfig(mode="NEARESTNEIGHBOR", l2_normalize=False)
        f = interpolate(jnp.asarray(patch), 3.4, 6.8, cfg)
        np.testing.assert_allclose(np.asarray(f), patch[3, 7], atol=1e-6)


class TestL2Normalize:
    def test_unit_norm_and_chain_rule(self):
        patch, _ = poly_patch(C=8)
        cfg = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
        f, dfdr, dfdc = interpolate_with_grad(jnp.asarray(patch), 4.3, 5.1, cfg)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(f)), 1.0,
                                   atol=1e-5)
        # chain rule: derivative must be orthogonal to normalized f
        assert abs(float(jnp.dot(f, dfdr))) < 1e-5
        assert abs(float(jnp.dot(f, dfdc))) < 1e-5
        # finite-difference check of the normalized value
        eps = 1e-3
        f1 = interpolate(jnp.asarray(patch), 4.3 + eps, 5.1, cfg)
        f0 = interpolate(jnp.asarray(patch), 4.3 - eps, 5.1, cfg)
        fd = (np.asarray(f1) - np.asarray(f0)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dfdr), fd, atol=1e-3)


class TestJetConsistency:
    def test_autodiff_matches_explicit(self):
        """jax.grad through interpolate() == explicit dfdr/dfdc (the reference's
        Jet overload composes exactly this way, interpolation.h:130-140)."""
        patch, _ = poly_patch(C=4)
        cfg = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
        r0, c0 = 4.3, 5.1
        J = jax.jacfwd(
            lambda rc: interpolate(jnp.asarray(patch), rc[0], rc[1], cfg)
        )(jnp.asarray([r0, c0]))
        f, dfdr, dfdc = interpolate_with_grad(jnp.asarray(patch), r0, c0, cfg)
        np.testing.assert_allclose(np.asarray(J[:, 0]), np.asarray(dfdr),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(J[:, 1]), np.asarray(dfdc),
                                   atol=1e-4)


class TestNCC:
    def test_mean_std_invariant(self):
        rng = np.random.default_rng(3)
        f_nodes = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        out = np.asarray(ncc_normalize(f_nodes))
        np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-5)
        np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-4)

    def test_nodes_evaluation(self):
        patch, _ = poly_patch(C=3)
        nodes = [[dx, dy] for dy in (-0.5, 0.5) for dx in (-0.5, 0.5)]
        cfg = InterpolationConfig(mode="BICUBIC", l2_normalize=False,
                                  ncc_normalize=True, nodes=nodes)
        f = interpolate_nodes(jnp.asarray(patch), 5.0, 5.0, cfg)
        assert f.shape == (4, 3)
        np.testing.assert_allclose(np.asarray(f).mean(axis=0), 0.0, atol=1e-4)


class TestDtypeParity:
    """SIMD-vs-reference parity oracle, adapted: bf16/f16 storage vs f32 compute
    must agree with the f32 patch to storage precision (interpolation_test.cc:327-364)."""

    @pytest.mark.parametrize("dtype,atol", [
        (jnp.bfloat16, 2e-2), (jnp.float16, 2e-3), (jnp.float32, 1e-6),
    ])
    def test_storage_dtypes(self, dtype, atol):
        patch, _ = poly_patch(C=128)
        patch = patch / np.abs(patch).max()
        cfg = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
        f32 = interpolate(jnp.asarray(patch, dtype=jnp.float32), 4.4, 5.5, cfg)
        flo = interpolate(jnp.asarray(patch, dtype=dtype), 4.4, 5.5, cfg)
        np.testing.assert_allclose(np.asarray(flo, dtype=np.float32),
                                   np.asarray(f32), atol=atol)


class TestGradientFieldModes:
    def test_bicubic_chain(self):
        # channels: (f, dfdr, dfdc) of some smooth function
        H = W = 10
        r, c = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        f = (0.5 * r**2 + 0.2 * r * c).astype(np.float32)
        dfdr = (1.0 * r + 0.2 * c).astype(np.float32)
        dfdc = (0.2 * r).astype(np.float32)
        patch = np.stack([f, dfdr, dfdc], axis=-1)
        cfg = InterpolationConfig(mode="BICUBICCHAIN", l2_normalize=False)
        val, gr, gc = interpolate_with_grad(jnp.asarray(patch), 4.3, 5.6, cfg)
        np.testing.assert_allclose(float(val[0]),
                                   0.5 * 4.3**2 + 0.2 * 4.3 * 5.6, atol=1e-2)
        np.testing.assert_allclose(float(gr[0]), 4.3 + 0.2 * 5.6, atol=1e-2)
        np.testing.assert_allclose(float(gc[0]), 0.2 * 4.3, atol=1e-2)

    def test_poly_gradient_field(self):
        H = W = 10
        r, c = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        f = (0.5 * r**2 + 0.3 * c**2).astype(np.float32)
        dfdr = (1.0 * r).astype(np.float32)
        dfdc = (0.6 * c).astype(np.float32)
        patch = np.stack([f, dfdr, dfdc], axis=-1)
        cfg = InterpolationConfig(mode="POLYGRADIENTFIELD", l2_normalize=False)
        val, gr, gc = interpolate_with_grad(jnp.asarray(patch), 4.25, 5.5, cfg)
        np.testing.assert_allclose(float(val[0]),
                                   0.5 * 4.25**2 + 0.3 * 5.5**2, atol=5e-2)
        np.testing.assert_allclose(float(gr[0]), 4.25, atol=5e-2)
        np.testing.assert_allclose(float(gc[0]), 0.6 * 5.5, atol=5e-2)

    def test_bicubic_gradient_field(self):
        H = W = 10
        r, c = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        f = (0.5 * r**2 + 0.2 * r * c + 0.3 * c**2).astype(np.float32)
        dfdr = (1.0 * r + 0.2 * c).astype(np.float32)
        dfdc = (0.2 * r + 0.6 * c).astype(np.float32)
        dfdrc = np.full_like(f, 0.2)
        patch = np.stack([f, dfdr, dfdc, dfdrc], axis=-1)
        cfg = InterpolationConfig(mode="BICUBICGRADIENTFIELD",
                                  l2_normalize=False)
        val, gr, gc = interpolate_with_grad(jnp.asarray(patch), 4.25, 5.5, cfg)
        np.testing.assert_allclose(
            float(val[0]), 0.5 * 4.25**2 + 0.2 * 4.25 * 5.5 + 0.3 * 5.5**2,
            atol=1e-3)
        np.testing.assert_allclose(float(gr[0]), 4.25 + 0.2 * 5.5, atol=1e-3)
        np.testing.assert_allclose(float(gc[0]), 0.2 * 4.25 + 0.6 * 5.5,
                                   atol=1e-3)


class TestBicubicWindowEval:
    def test_matches_dense_contraction(self):
        """Window-gather bicubic == dense one-hot contraction, incl. clamped
        borders and l2-normalize chain rule."""
        import jax
        import jax.numpy as jnp
        from pixsfm_tpu.base.interpolation import (InterpolationConfig,
                                                   bicubic_window_eval,
                                                   interpolate_with_grad,
                                                   l2_normalize_with_grad)

        rng = np.random.default_rng(5)
        N, ps, C = 40, 16, 8
        patches = jnp.asarray(rng.normal(0, 1, (N, ps, ps, C)),
                              jnp.float32)
        # queries: interior + near/beyond all borders (clamping active)
        r = jnp.asarray(np.concatenate([
            rng.uniform(1.5, ps - 2.5, N - 16),
            [-0.7, -0.2, 0.1, 0.6, ps - 1.4, ps - 1.1, ps - 0.4, ps + 0.3,
             0.0, 0.5, 1.0, ps - 2.0, ps - 1.0, -1.0, ps * 1.0, 7.5]]),
            jnp.float32)
        c = jnp.asarray(np.concatenate([
            rng.uniform(1.5, ps - 2.5, N - 16),
            [ps - 0.3, 0.2, -0.5, ps + 0.1, 0.4, ps - 1.2, -0.1, 7.7,
             ps - 1.0, -1.0, ps * 1.0, 0.0, 0.5, 3.3, 4.4, 5.5]]),
            jnp.float32)

        for l2 in (False, True):
            cfg = InterpolationConfig(mode="BICUBIC", l2_normalize=l2)
            f0, dr0, dc0 = jax.vmap(
                lambda p, rr, cc: interpolate_with_grad(p, rr, cc, cfg))(
                    patches, r, c)
            f1, dr1, dc1 = bicubic_window_eval(patches, r, c)
            if l2:
                f1, (dr1, dc1) = l2_normalize_with_grad(f1, (dr1, dc1))
            np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                                       atol=2e-5)
            np.testing.assert_allclose(np.asarray(dr1), np.asarray(dr0),
                                       atol=2e-5)
            np.testing.assert_allclose(np.asarray(dc1), np.asarray(dc0),
                                       atol=2e-5)


def test_ncc_normalize_with_grad_matches_autodiff():
    """The hand chain rule for per-channel NCC across nodes (used by the
    multi-node KA residual) must match jax AD through ncc_normalize."""
    import jax

    from pixsfm_tpu.base.interpolation import (InterpolationConfig,
                                               interpolate_nodes,
                                               interpolate_nodes_with_grad)

    rng = np.random.default_rng(0)
    patch = jnp.asarray(rng.normal(0, 1, (16, 16, 3)).astype(np.float32))
    conf = InterpolationConfig(
        mode="BICUBIC", l2_normalize=False, ncc_normalize=True,
        nodes=[[dx, dy] for dy in (-1.5, -0.5, 0.5, 1.5)
               for dx in (-1.5, -0.5, 0.5, 1.5)])
    r0, c0 = 7.3, 6.8
    f, dfdr, dfdc = interpolate_nodes_with_grad(patch, r0, c0, conf)
    J = jax.jacfwd(lambda rc: interpolate_nodes(patch, rc[0], rc[1], conf))(
        jnp.asarray([r0, c0]))
    np.testing.assert_allclose(np.asarray(dfdr), np.asarray(J[..., 0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dfdc), np.asarray(J[..., 1]),
                               rtol=1e-4, atol=1e-5)
    # degenerate sigma==0 channel (constant patch) must not NaN
    const = jnp.ones((16, 16, 1), jnp.float32)
    f2, d2r, d2c = interpolate_nodes_with_grad(const, r0, c0, conf)
    assert np.isfinite(np.asarray(f2)).all()
    assert np.isfinite(np.asarray(d2r)).all()
