"""Feature-patch interpolation (reference: pixsfm/base/src/interpolation.h).

TPU-native redesign of the reference's templated interpolator hierarchy. Instead of
per-pixel virtual calls over a clamped ``Grid2D`` with AVX2 Hermite-spline SIMD
(cubic_hermite_spline_simd.h:56-193), interpolation is expressed as **separable one-hot
weight contractions**: for a query at ``(r, c)`` on a ``[H, W, C]`` patch we build dense
length-``H``/``W`` weight vectors holding the 4 Catmull-Rom taps at clamped positions and
contract ``f = wr @ P @ wc``. This has no data-dependent gathers — XLA lowers the batched
version straight onto the MXU — and boundary clamping falls out of index clipping
(duplicate clamped taps sum their weights, exactly matching Grid2D::GetValue
grid2d.h:29-45 semantics).

Because the whole computation is polynomial in the fractional offsets, standard JAX
autodiff through :func:`interpolate` reproduces the analytic ``dfdr``/``dfdc`` that the
reference composes manually for Ceres Jets (interpolation.h:130-140). Explicit
derivative-returning variants are provided for tests and costmap extraction.

Interpolator modes (interpolation.h:29-37) and the ``PixelInterpolator`` decorator
semantics (L2-normalize chain rule :648-666, NCC normalize :54-85, node evaluation
:708-729, fill-zero of unused channels :669-676) are preserved.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "InterpolationConfig", "INTERPOLATOR_TYPES",
    "interpolate", "interpolate_with_grad",
    "interpolate_nodes", "interpolate_nodes_with_grad",
    "l2_normalize_with_grad", "ncc_normalize", "bicubic_window_eval",
    "bicubic_window_eval_rows",
]

INTERPOLATOR_TYPES = (
    "BICUBIC", "BILINEAR", "NEARESTNEIGHBOR",
    "POLYGRADIENTFIELD", "BICUBICGRADIENTFIELD", "BICUBICCHAIN",
    "CERES_BICUBIC",  # alias of BICUBIC here (same math, no SIMD distinction)
)


@dataclass
class InterpolationConfig:
    """Mirrors InterpolationConfig (interpolation.h:39-51)."""
    mode: str = "BICUBIC"
    l2_normalize: bool = True
    ncc_normalize: bool = False
    nodes: Sequence[Sequence[float]] = field(default_factory=lambda: [[0.0, 0.0]])
    fill_channel_differences: bool = True
    check_bounds: bool = False
    use_float_simd: bool = False  # accepted for config parity; no-op on TPU

    def __post_init__(self):
        mode = str(self.mode).upper()
        if mode not in INTERPOLATOR_TYPES:
            raise ValueError(f"unknown interpolation mode {self.mode!r}")
        self.mode = mode
        self.nodes = [list(map(float, n)) for n in self.nodes]

    @classmethod
    def from_conf(cls, conf) -> "InterpolationConfig":
        if isinstance(conf, InterpolationConfig):
            return conf
        if conf is None:
            return cls()
        d = conf.to_dict() if hasattr(conf, "to_dict") else dict(conf)
        known = {k: v for k, v in d.items()
                 if k in ("mode", "l2_normalize", "ncc_normalize", "nodes",
                          "fill_channel_differences", "check_bounds",
                          "use_float_simd") and v is not None}
        return cls(**known)

    @property
    def n_nodes(self) -> int:
        return len(self.nodes)

    def nodes_array(self) -> np.ndarray:
        return np.asarray(self.nodes, dtype=np.float32)


# ---------------------------------------------------------------------------
# Catmull-Rom spline weights (Ceres CubicHermiteSpline tap weights)
# ---------------------------------------------------------------------------

def catmull_rom_weights(t):
    """Weights for taps p0..p3 at fractional offset t in [0,1), plus d/dt weights."""
    t2 = t * t
    t3 = t2 * t
    w = jnp.stack([
        -0.5 * t3 + t2 - 0.5 * t,
        1.5 * t3 - 2.5 * t2 + 1.0,
        -1.5 * t3 + 2.0 * t2 + 0.5 * t,
        0.5 * t3 - 0.5 * t2,
    ], axis=-1)
    dw = jnp.stack([
        -1.5 * t2 + 2.0 * t - 0.5,
        4.5 * t2 - 5.0 * t,
        -4.5 * t2 + 4.0 * t + 0.5,
        1.5 * t2 - t,
    ], axis=-1)
    return w, dw


def _dense_taps(x, size: int, taps, tap_weights):
    """Scatter ``tap_weights`` at clamped tap positions into a dense length-``size``
    vector. Clamping duplicates collapse by summation == Grid2D clamped reads."""
    base = jnp.floor(x).astype(jnp.int32)
    idx = jnp.clip(base[..., None] + taps, 0, size - 1)          # (..., T)
    iota = jax.lax.broadcasted_iota(jnp.int32, (size,), 0)
    onehot = (idx[..., None] == iota).astype(tap_weights.dtype)  # (..., T, size)
    return jnp.einsum("...t,...ts->...s", tap_weights, onehot)


_TAPS_BICUBIC = jnp.arange(-1, 3)
_TAPS_BILINEAR = jnp.arange(0, 2)


def _weights_for_mode(mode: str, r, c, H: int, W: int, derivative: bool):
    """Dense row/col weight vectors (and their d/dr, d/dc) for a separable mode."""
    if mode in ("BICUBIC", "CERES_BICUBIC", "BICUBICCHAIN"):
        tr = r - jnp.floor(r)
        tc = c - jnp.floor(c)
        wr4, dwr4 = catmull_rom_weights(tr)
        wc4, dwc4 = catmull_rom_weights(tc)
        wr = _dense_taps(r, H, _TAPS_BICUBIC, wr4)
        wc = _dense_taps(c, W, _TAPS_BICUBIC, wc4)
        if not derivative:
            return wr, wc, None, None
        dwr = _dense_taps(r, H, _TAPS_BICUBIC, dwr4)
        dwc = _dense_taps(c, W, _TAPS_BICUBIC, dwc4)
        return wr, wc, dwr, dwc
    raise ValueError(f"mode {mode} is not separable")


def _contract(patch, wr, wc):
    """f = wr @ P @ wc over a [H, W, C] patch -> [C]. Computed in f32."""
    p = patch.astype(jnp.float32)
    return jnp.einsum("h,hwc,w->c", wr.astype(jnp.float32),
                      p, wc.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# core single-point interpolation on a single patch (vmap for batches)
# ---------------------------------------------------------------------------

def _bicubic_full(patch, r, c):
    """f, dfdr, dfdc, dfdrc via separable Catmull-Rom (analytic derivatives).

    Reads only the clamped 4x4 tap window (one 16-row gather) instead of
    contracting dense one-hot weights against the whole patch — 16x less
    memory traffic at ps=16, identical values/clamping (duplicated border
    taps sum the same pixel). Differentiable in (r, c) through the weights
    (tap indices are piecewise constant), so jacfwd/grad through
    :func:`interpolate` keep working."""
    H, W, C = patch.shape
    base_r = jnp.floor(r).astype(jnp.int32)
    base_c = jnp.floor(c).astype(jnp.int32)
    wr, dwr = catmull_rom_weights(r - jnp.floor(r))          # [4]
    wc, dwc = catmull_rom_weights(c - jnp.floor(c))
    taps = jnp.arange(-1, 3, dtype=jnp.int32)
    ri = jnp.clip(base_r + taps, 0, H - 1)
    ci = jnp.clip(base_c + taps, 0, W - 1)
    idx = (ri[:, None] * W + ci[None, :]).reshape(16)
    win = patch.reshape(H * W, C)[idx].reshape(4, 4, C).astype(jnp.float32)
    wr = wr.astype(jnp.float32)
    wc = wc.astype(jnp.float32)
    f = jnp.einsum("a,abc,b->c", wr, win, wc,
                   preferred_element_type=jnp.float32)
    dfdr = jnp.einsum("a,abc,b->c", dwr.astype(jnp.float32), win, wc,
                      preferred_element_type=jnp.float32)
    dfdc = jnp.einsum("a,abc,b->c", wr, win, dwc.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    dfdrc = jnp.einsum("a,abc,b->c", dwr.astype(jnp.float32), win,
                       dwc.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    return f, dfdr, dfdc, dfdrc


def _bilinear_value(patch, r, c):
    H, W, _ = patch.shape
    tr = r - jnp.floor(r)
    tc = c - jnp.floor(c)
    wr = _dense_taps(r, H, _TAPS_BILINEAR, jnp.stack([1.0 - tr, tr], axis=-1))
    wc = _dense_taps(c, W, _TAPS_BILINEAR, jnp.stack([1.0 - tc, tc], axis=-1))
    return _contract(patch, wr, wc)


def _bilinear_full(patch, r, c):
    """Reference semantics: forward-difference derivatives (interpolation.h:543-560)."""
    f = _bilinear_value(patch, r, c)
    dfdr = _bilinear_value(patch, r + 1.0, c) - f
    dfdc = _bilinear_value(patch, r, c + 1.0) - f
    return f, dfdr, dfdc, jnp.zeros_like(f)


def _nearest_value(patch, r, c):
    H, W, _ = patch.shape
    row = jnp.clip(jnp.round(r).astype(jnp.int32), 0, H - 1)
    col = jnp.clip(jnp.round(c).astype(jnp.int32), 0, W - 1)
    return jax.lax.dynamic_slice(
        patch, (row, col, 0), (1, 1, patch.shape[2]))[0, 0].astype(jnp.float32)


def _nearest_full(patch, r, c):
    f = _nearest_value(patch, r, c)
    dfdr = _nearest_value(patch, r + 1.0, c) - f
    dfdc = _nearest_value(patch, r, c + 1.0) - f
    return f, dfdr, dfdc, jnp.zeros_like(f)


def _fit_cubic_poly(p0, p1, s0, s1):
    """Cubic a+bx+cx^2+dx^3 with p(0)=p0, p(1)=p1, p'(0)=s0, p'(1)=s1."""
    a = p0
    b = s0
    c = 3.0 * (p1 - p0) - 2.0 * s0 - s1
    d = 2.0 * (p0 - p1) + s0 + s1
    return a, b, c, d


def _bilinear_cell(patch, r, c):
    """Clamped cell corner values ll, lr, ul, ur and fractional offsets."""
    H, W, C = patch.shape
    row = jnp.floor(r).astype(jnp.int32)
    col = jnp.floor(c).astype(jnp.int32)
    dy = r - jnp.floor(r)
    dx = c - jnp.floor(c)

    def at(rr, cc):
        rr = jnp.clip(rr, 0, H - 1)
        cc = jnp.clip(cc, 0, W - 1)
        return jax.lax.dynamic_slice(patch, (rr, cc, 0), (1, 1, C))[0, 0] \
            .astype(jnp.float32)

    return at(row, col), at(row, col + 1), at(row + 1, col), at(row + 1, col + 1), dy, dx


def _poly_gradient_field_full(patch, r, c):
    """PolyGradientFieldInterpolator (interpolation.h:297-362).

    Patch channels are (cost, dcost/dr, dcost/dc[, dcost/drdc]); output is 1-D.
    Horizontal cubics constrained by values+dfdc at cell corners, vertical cubic
    constrained by the two horizontal values + lerped dfdr.
    """
    ll, lr, ul, ur, dy, dx = _bilinear_cell(patch, r, c)

    def horiz(a, b):
        co = _fit_cubic_poly(a[0], b[0], a[2], b[2])
        f = co[0] + dx * (co[1] + dx * (co[2] + co[3] * dx))
        dfdx = co[1] + dx * (2.0 * co[2] + 3.0 * dx * co[3])
        return f, dfdx

    lf, lower_dfdc = horiz(ll, lr)
    uf, upper_dfdc = horiz(ul, ur)
    lower_dfdr = ll[1] * (1.0 - dx) + lr[1] * dx
    upper_dfdr = ul[1] * (1.0 - dx) + ur[1] * dx

    co = _fit_cubic_poly(lf, uf, lower_dfdr, upper_dfdr)
    f = co[0] + dy * (co[1] + dy * (co[2] + co[3] * dy))
    dfdr = co[1] + dy * (2.0 * co[2] + 3.0 * dy * co[3])
    dfdc = upper_dfdc * dy + (1.0 - dy) * lower_dfdc
    one = jnp.stack([f]), jnp.stack([dfdr]), jnp.stack([dfdc])
    return one[0], one[1], one[2], jnp.zeros((1,), jnp.float32)


_BICUBIC_FIT_A_INV = None


def _bicubic_fit_matrix():
    """16x16 inverse for fitting a bicubic surface from values+derivatives at the
    4 cell corners (classic bicubic interpolation matrix; interpolation.h:364-386)."""
    global _BICUBIC_FIT_A_INV
    if _BICUBIC_FIT_A_INV is None:
        # Build A (16x16) by evaluating the constraint equations on monomials
        # f(x,y) = sum a_ij x^i y^j ordered as rhs = [f(0,0), f(1,0), f(0,1), f(1,1),
        # fy(...x4), fx(...x4), fxy(...x4)] with corner order (x,y) in
        # {(0,0),(1,0),(0,1),(1,1)}.
        corners = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)]

        def mono(i, j, x, y, dx=0, dy=0):
            cx = 1.0
            e = i
            for _ in range(dx):
                cx *= e
                e -= 1
            vx = cx * (x ** e) if e >= 0 else 0.0
            cy = 1.0
            e = j
            for _ in range(dy):
                cy *= e
                e -= 1
            vy = cy * (y ** e) if e >= 0 else 0.0
            return vx * vy

        rows = []
        for dx, dy in [(0, 0), (0, 1), (1, 0), (1, 1)]:
            for (x, y) in corners:
                rows.append([mono(i, j, x, y, dx, dy)
                             for j in range(4) for i in range(4)])
        A = np.array(rows, dtype=np.float64)
        # cache as NUMPY: caching a jnp array created under an active trace
        # leaks a tracer into later traces (UnexpectedTracerError)
        _BICUBIC_FIT_A_INV = np.linalg.inv(A).astype(np.float32)
    return jnp.asarray(_BICUBIC_FIT_A_INV)


def _bicubic_gradient_field_full(patch, r, c):
    """BiCubicGradientFieldInterpolator (interpolation.h:364-477): 4-channel patch
    (f, dfdr, dfdc, dfdrc); fit 16-coeff bicubic surface per cell; output 1-D."""
    ll, lr, ul, ur, dy, dx = _bilinear_cell(patch, r, c)
    # rhs order must match constraint rows: values, d/dy(=dfdr ch1), d/dx(=dfdc ch2),
    # cross (ch3) at corners (x,y)=(dx,dy) ordering (0,0),(1,0),(0,1),(1,1)
    rhs = jnp.stack([
        ll[0], lr[0], ul[0], ur[0],
        ll[1], lr[1], ul[1], ur[1],
        ll[2], lr[2], ul[2], ur[2],
        ll[3], lr[3], ul[3], ur[3],
    ])
    coeffs = _bicubic_fit_matrix() @ rhs  # a_ij, j-major: [a00,a10,a20,a30,a01,...]
    xp = jnp.stack([jnp.ones_like(dx), dx, dx * dx, dx * dx * dx])
    yp = jnp.stack([jnp.ones_like(dy), dy, dy * dy, dy * dy * dy])
    dxp = jnp.stack([jnp.zeros_like(dx), jnp.ones_like(dx), 2.0 * dx,
                     3.0 * dx * dx])
    dyp = jnp.stack([jnp.zeros_like(dy), jnp.ones_like(dy), 2.0 * dy,
                     3.0 * dy * dy])
    C4 = coeffs.reshape(4, 4)  # [j, i]
    f = yp @ C4 @ xp
    dfdr = dyp @ C4 @ xp
    dfdc = yp @ C4 @ dxp
    dfdrc = dyp @ C4 @ dxp
    return (jnp.stack([f]), jnp.stack([dfdr]), jnp.stack([dfdc]),
            jnp.stack([dfdrc]))


def _bicubic_chain_full(patch, r, c):
    """BiCubicChainInterpolator (interpolation.h:480-521): 3-channel patch
    (f, dfdr, dfdc); value channels interpolated bicubically, derivatives read
    from channels 1, 2."""
    f3, _, _, _ = _bicubic_full(patch, r, c)
    return (f3[:1], f3[1:2], f3[2:3], jnp.zeros((1,), jnp.float32))


_MODE_FULL = {
    "BICUBIC": _bicubic_full,
    "CERES_BICUBIC": _bicubic_full,
    "BILINEAR": _bilinear_full,
    "NEARESTNEIGHBOR": _nearest_full,
    "POLYGRADIENTFIELD": _poly_gradient_field_full,
    "BICUBICGRADIENTFIELD": _bicubic_gradient_field_full,
    "BICUBICCHAIN": _bicubic_chain_full,
}

GRADIENT_FIELD_MODES = ("POLYGRADIENTFIELD", "BICUBICGRADIENTFIELD",
                        "BICUBICCHAIN")


def output_dim(mode: str, channels: int, n_nodes: int = 1) -> int:
    """Descriptor length produced by :func:`interpolate` for this config
    (gradient-field modes are scalar; node windows concatenate)."""
    return 1 if mode in GRADIENT_FIELD_MODES else channels * max(n_nodes, 1)


# ---------------------------------------------------------------------------
# normalization decorators (PixelInterpolator, interpolation.h:609-736)
# ---------------------------------------------------------------------------

def bicubic_window_eval(patches, r, c):
    """Batched bicubic with derivatives via the 4x4 tap WINDOW.

    patches [N, H, W, C] (any storage dtype), r/c [N] -> (f, dfdr, dfdc)
    [N, C] in f32. Same math and clamping as the dense one-hot contraction
    (_bicubic_full) — duplicated clamped taps read the border pixel once per
    tap, which sums identically — but reads only 16 pixels per query instead
    of the whole patch: 16x less HBM traffic at ps=16. This is the KA hot
    path (reference: cubic_hermite_spline_simd.h reads the same 4x4 window)."""
    N, H, W, C = patches.shape
    rows = patches.reshape(N * H, W, C)
    row_base = jnp.arange(N, dtype=jnp.int32) * H
    return bicubic_window_eval_rows(rows, H, W, C, row_base, r, c)


def bicubic_window_eval_rows(rows, H: int, W: int, C: int, row_base, r, c):
    """Window eval against a flat ``[total_rows, W, C]`` row view.

    ``row_base[n]`` is the first row of query n's patch. Callers that hold a
    packed ``[Npatches, H, W, C]`` array should take
    ``rows = packed.reshape(-1, W, C)`` OUTSIDE any solver loop and pass
    ``row_base = patch_row * H``. Keeping the (W, C) minor dims intact makes
    that reshape a free bitcast (identical tiling) and lets the row gather
    emit ``[N, 4, W, C]`` directly — a flat ``[*, W*C]`` view instead costs
    a physical 98MB tile-layout copy per LM iteration at bench shapes.
    """
    base_r = jnp.floor(r).astype(jnp.int32)
    wr, dwr = catmull_rom_weights(r - jnp.floor(r))      # [N, 4]
    wc4, dwc4 = catmull_rom_weights(c - jnp.floor(c))
    # column taps as DENSE clamped weights (duplicates at the border sum,
    # == Grid2D clamped reads); row taps stay a 4-row GATHER — but of whole
    # W*C-contiguous rows (KBs each), which the TPU gather unit handles ~10x
    # more efficiently than 16 individual C-pixel reads per query.
    wc = _dense_taps(c, W, _TAPS_BICUBIC, wc4)           # [N, W]
    dwc = _dense_taps(c, W, _TAPS_BICUBIC, dwc4)
    taps = jnp.arange(-1, 3, dtype=jnp.int32)
    ri = jnp.clip(base_r[:, None] + taps, 0, H - 1)      # [N, 4]
    idx = row_base[:, None] + ri
    # keep the gathered window in its storage dtype: both column mixes read
    # it once each with the f32 convert fused into the reduction (an explicit
    # astype materializes an f32 copy because it has two consumers)
    win = rows[idx]                                      # [N, 4, W, C]
    wcs = jnp.stack([wc, dwc], axis=1)                   # [N, 2, W]
    mix = jnp.einsum("nawc,nsw->nsac", win, wcs,
                     preferred_element_type=jnp.float32)  # [N, 2, 4, C]
    colmix, dcolmix = mix[:, 0], mix[:, 1]
    f = jnp.einsum("nac,na->nc", colmix, wr,
                   preferred_element_type=jnp.float32)
    dfdr = jnp.einsum("nac,na->nc", colmix, dwr,
                      preferred_element_type=jnp.float32)
    dfdc = jnp.einsum("nac,na->nc", dcolmix, wr,
                      preferred_element_type=jnp.float32)
    return f, dfdr, dfdc


def l2_normalize_with_grad(f, derivs):
    """L2-normalize f and apply the chain rule to each derivative array."""
    norm_inv = 1.0 / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True),
                                 1e-20)
    fn = f * norm_inv
    out = []
    for d in derivs:
        if d is None:
            out.append(None)
            continue
        dn = d * norm_inv
        dn = dn - jnp.sum(fn * dn, axis=-1, keepdims=True) * fn
        out.append(dn)
    return fn, out


def ncc_normalize(f_nodes, eps=0.0):
    """Per-channel mean-0/std-1 across the node axis (interpolation.h:54-85).

    f_nodes: (..., n_nodes, C).
    """
    mu = jnp.mean(f_nodes, axis=-2, keepdims=True)
    var = jnp.mean((f_nodes - mu) ** 2, axis=-2, keepdims=True)
    sigma = jnp.sqrt(var)
    sigma = jnp.where(sigma > 0.0, sigma, 1.0)
    return (f_nodes - mu) / sigma


def ncc_normalize_with_grad(f_nodes, derivs):
    """NCC normalization with the chain rule applied to spatial derivatives.

    ``f_nodes``: (..., n_nodes, C); ``derivs``: sequence of arrays of the
    same shape (df/dr, df/dc, ...). Per channel c:
      g = (f - mu)/sigma,   mu/sigma over the node axis
      dg = (df - dmu)/sigma - g * dsigma/sigma
      dmu = mean_n df,  dsigma = mean_n((f - mu)(df - dmu)) / sigma
    (degenerate sigma==0 follows the reference's sigma:=1 convention, where
    the derivative reduces to the centered df)."""
    mu = jnp.mean(f_nodes, axis=-2, keepdims=True)
    fc = f_nodes - mu
    var = jnp.mean(fc * fc, axis=-2, keepdims=True)
    sigma = jnp.sqrt(var)
    ok = sigma > 0.0
    sigma = jnp.where(ok, sigma, 1.0)
    g = fc / sigma
    out = []
    for d in derivs:
        if d is None:
            out.append(None)
            continue
        dmu = jnp.mean(d, axis=-2, keepdims=True)
        dc = d - dmu
        dsigma = jnp.where(ok, jnp.mean(fc * dc, axis=-2, keepdims=True)
                           / sigma, 0.0)
        out.append(dc / sigma - g * dsigma / sigma)
    return g, out


# ---------------------------------------------------------------------------
# public API (single patch, single query; vmap for batching)
# ---------------------------------------------------------------------------

def bicubic_window_eval_single(rows_view, H: int, W: int, C: int,
                               row_base, r, c):
    """Single-query window eval against a flat row view (vmap-friendly).

    Reads only the 4-row bicubic window (``[4, W, C]``) instead of gathering
    the whole ``[H, W, C]`` patch — under ``vmap`` this becomes the same
    coalesced row gather as the KA hot path (4x less HBM than a full-patch
    gather at ps=16)."""
    f, dfdr, dfdc = bicubic_window_eval_rows(
        rows_view, H, W, C, jnp.asarray(row_base)[None],
        jnp.asarray(r)[None], jnp.asarray(c)[None])
    return f[0], dfdr[0], dfdc[0]


def interpolate_window_autodiff(rows_view, H: int, W: int, C: int,
                                row_base, r, c, l2_normalize: bool):
    """Windowed single-query bicubic with the custom-JVP composition.

    The BICUBIC fast path for autodiffed residuals: 4-row window reads
    (see :func:`bicubic_window_eval_single`) + analytic tangent composition
    (see :func:`interpolate_autodiff`). ``rows_view`` is
    ``patches.reshape(-1, W, C)`` and ``row_base = patch_row * H``."""
    return _interp_window_cjvp(H, W, C, bool(l2_normalize))(
        rows_view, row_base, r, c)


@lru_cache(maxsize=16)
def _interp_window_cjvp(H: int, W: int, C: int, l2: bool):
    from jax.custom_derivatives import SymbolicZero

    def eval_all(rows_view, row_base, r, c):
        f, dfdr, dfdc = bicubic_window_eval_single(rows_view, H, W, C,
                                                   row_base, r, c)
        if l2:
            f, (dfdr, dfdc) = l2_normalize_with_grad(f, (dfdr, dfdc))
        return f, dfdr, dfdc

    @jax.custom_jvp
    def fn(rows_view, row_base, r, c):
        return eval_all(rows_view, row_base, r, c)[0]

    def _jvp(primals, tangents):
        rows_view, row_base, r, c = primals
        tv, _, tr, tc = tangents
        if not isinstance(tv, SymbolicZero):
            raise NotImplementedError(
                "interpolate_window_autodiff: differentiation w.r.t. the "
                "feature rows is not supported")
        f, dfdr, dfdc = eval_all(rows_view, row_base, r, c)
        tan = jnp.zeros_like(f)
        if not isinstance(tr, SymbolicZero):
            tan = tan + dfdr * tr
        if not isinstance(tc, SymbolicZero):
            tan = tan + dfdc * tc
        return f, tan

    fn.defjvp(_jvp, symbolic_zeros=True)
    return fn


def inbounds_weight(r, c, H: int, W: int):
    """1.0 inside the patch extent [0, H-1] x [0, W-1], else 0.0."""
    inside = ((r >= 0.0) & (r <= H - 1.0) & (c >= 0.0) & (c <= W - 1.0))
    return inside.astype(jnp.float32)


def bounds_violation(r, c, H: int, W: int):
    """Hinge distance (in patch pixels) outside the extent [0, H-1] x
    [0, W-1]; 0 inside.

    The batched analogue of the reference's ``check_bounds`` semantics
    (patch_interpolator.h:92-96): there an out-of-bounds evaluation makes
    the Ceres cost functor fail, which rejects the whole candidate step.
    A failed evaluation has no XLA equivalent, so solvers append this
    violation as an extra residual channel instead — any step that pushes a
    reprojection outside its patch window strictly increases the cost (the
    clamped-constant border region otherwise has zero gradient and can
    absorb runaway steps) and is rejected by LM acceptance; small
    violations get a smooth gradient pulling the point back inside."""
    return (jnp.maximum(r - (H - 1.0), 0.0) + jnp.maximum(-r, 0.0)
            + jnp.maximum(c - (W - 1.0), 0.0) + jnp.maximum(-c, 0.0))


def interpolate_residual(patches, row, r, c,
                         config: Optional[InterpolationConfig] = None):
    """Interpolation for use INSIDE autodiffed solver residuals.

    Dispatches to the windowed custom-JVP path (4-row reads, analytic
    tangents) for plain bicubic configs, and to the full-patch custom-JVP
    path otherwise (NCC / gradient-field modes). ``patches [N, H, W, C]``,
    ``row`` scalar (vmap-friendly)."""
    config = config or InterpolationConfig()
    if (config.mode in ("BICUBIC", "CERES_BICUBIC")
            and not config.ncc_normalize and config.n_nodes == 1):
        N, H, W, C = patches.shape
        return interpolate_window_autodiff(
            patches.reshape(N * H, W, C), H, W, C, row * H, r, c,
            config.l2_normalize)
    return interpolate_autodiff(patches[row], r, c, config)


def interpolate_residual_with_grad(patches, row, r, c,
                                   config: Optional[InterpolationConfig]
                                   = None):
    """``interpolate_residual``'s value plus analytic (dfdr, dfdc).

    Same dispatch as :func:`interpolate_residual` (4-row window reads for
    plain bicubic, full-patch otherwise) but returns the gradients directly
    for solvers that assemble the observation Jacobian by hand instead of
    differentiating through a custom-JVP wrapper. Single-point NCC configs
    are not supported (meaningless normalization); multi-node configs
    (incl. NCC across nodes) route through the chain-ruled node path."""
    config = config or InterpolationConfig()
    if config.n_nodes > 1 and config.mode not in GRADIENT_FIELD_MODES:
        f, dfdr, dfdc = interpolate_nodes_with_grad(patches[row], r, c,
                                                    config)
        return f.reshape(-1), dfdr.reshape(-1), dfdc.reshape(-1)
    if config.ncc_normalize:
        raise NotImplementedError(
            "interpolate_residual_with_grad: single-point NCC configs use "
            "the autodiff path")
    if config.mode in ("BICUBIC", "CERES_BICUBIC"):
        N, H, W, C = patches.shape
        f, dfdr, dfdc = bicubic_window_eval_single(
            patches.reshape(N * H, W, C), H, W, C, row * H, r, c)
        if config.l2_normalize:
            f, (dfdr, dfdc) = l2_normalize_with_grad(f, (dfdr, dfdc))
        return f, dfdr, dfdc
    return interpolate_with_grad(patches[row], r, c, config)


def interpolate_autodiff(patch, r, c,
                         config: Optional[InterpolationConfig] = None):
    """:func:`interpolate` with a custom forward-mode rule.

    Plain ``interpolate`` under ``jacfwd`` re-contracts the interpolation
    window once per tangent direction (a BA residual with a 13-dim tangent
    pays ~13x the interpolation cost). This wrapper's JVP composes the
    analytic gradients instead — one value + one (dfdr, dfdc) evaluation,
    then ``dfdr * rdot + dfdc * cdot`` per tangent — the Ceres-Jet
    composition pattern of the reference (interpolation.h:130-140).

    The patch itself must not be differentiated (its tangent must be
    symbolically zero — true for solver residuals, where patches are
    constants); a non-zero patch tangent raises."""
    config = config or InterpolationConfig()
    key = (config.mode, bool(config.l2_normalize), bool(config.ncc_normalize),
           tuple(tuple(n) for n in config.nodes))
    return _interpolate_cjvp(key)(patch, r, c)


@lru_cache(maxsize=64)
def _interpolate_cjvp(key):
    from jax.custom_derivatives import SymbolicZero

    config = InterpolationConfig(mode=key[0], l2_normalize=key[1],
                                 ncc_normalize=key[2],
                                 nodes=[list(n) for n in key[3]])

    @jax.custom_jvp
    def fn(patch, r, c):
        return interpolate(patch, r, c, config)

    def _jvp(primals, tangents):
        patch, r, c = primals
        tp, tr, tc = tangents
        if not isinstance(tp, SymbolicZero):
            raise NotImplementedError(
                "interpolate_autodiff: differentiation w.r.t. the patch is "
                "not supported (use interpolate instead)")
        val, dfdr, dfdc = interpolate_with_grad(patch, r, c, config)
        tan = jnp.zeros_like(val)
        if not isinstance(tr, SymbolicZero):
            tan = tan + dfdr * tr
        if not isinstance(tc, SymbolicZero):
            tan = tan + dfdc * tc
        return val, tan

    fn.defjvp(_jvp, symbolic_zeros=True)
    return fn


def _interpolate_point(patch, r, c, config: InterpolationConfig):
    """Single-point interpolation core (ignores ``config.nodes``)."""
    f, _, _, _ = _MODE_FULL[config.mode](patch, r, c)
    if config.l2_normalize and config.mode not in GRADIENT_FIELD_MODES:
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-20)
    return f


def _interpolate_point_with_grad(patch, r, c, config: InterpolationConfig,
                                 cross: bool = False):
    """Single-point ``interpolate_with_grad`` core (ignores ``config.nodes``)."""
    f, dfdr, dfdc, dfdrc = _MODE_FULL[config.mode](patch, r, c)
    if config.l2_normalize and config.mode not in GRADIENT_FIELD_MODES:
        f, (dfdr, dfdc) = l2_normalize_with_grad(f, (dfdr, dfdc))
        # note: the reference does not chain-rule dfdrc under l2 (only costmap
        # extraction uses dfdrc, with l2_normalize handled upstream).
    if cross:
        return f, dfdr, dfdc, dfdrc
    return f, dfdr, dfdc


def interpolate(patch, r, c, config: Optional[InterpolationConfig] = None):
    """Interpolated (optionally normalized) descriptor at (r, c).

    With ``config.n_nodes > 1`` the descriptor is the CONCATENATION over the
    node window (flattened [n_nodes*C] — the reference's EvaluateNodes,
    interpolation.h:708-717), optionally NCC-normalized per channel across
    nodes; otherwise the single-point value ([C] or [1])."""
    config = config or InterpolationConfig()
    if config.n_nodes > 1 and config.mode not in GRADIENT_FIELD_MODES:
        return interpolate_nodes(patch, r, c, config).reshape(-1)
    return _interpolate_point(patch, r, c, config)


def interpolate_with_grad(patch, r, c,
                          config: Optional[InterpolationConfig] = None,
                          cross: bool = False):
    """(f, dfdr, dfdc[, dfdrc]) with normalization chain rule applied.

    Node-aware like :func:`interpolate`: with ``n_nodes > 1`` (and not
    ``cross`` — the dfdrc costmap path is single-point) all outputs are the
    flattened [n_nodes*C] node window with NCC chain-ruled through the
    derivatives."""
    config = config or InterpolationConfig()
    if (config.n_nodes > 1 and not cross
            and config.mode not in GRADIENT_FIELD_MODES):
        f, dfdr, dfdc = interpolate_nodes_with_grad(patch, r, c, config)
        return f.reshape(-1), dfdr.reshape(-1), dfdc.reshape(-1)
    return _interpolate_point_with_grad(patch, r, c, config, cross)


def interpolate_nodes(patch, r, c, config: InterpolationConfig):
    """Evaluate all config.nodes offsets around (r, c) -> (n_nodes, C).

    Node offsets are (dx, dy): Evaluate(r + node[1], c + node[0])
    (interpolation.h:708-717).
    """
    nodes = jnp.asarray(config.nodes_array())

    def one(node):
        return _interpolate_point(patch, r + node[1], c + node[0], config)

    f = jax.vmap(one)(nodes)
    if config.ncc_normalize:
        f = ncc_normalize(f)
    return f


def interpolate_nodes_with_grad(patch, r, c, config: InterpolationConfig):
    """Node evaluation with (dfdr, dfdc), all [n_nodes, C]; NCC normalization
    is chain-ruled through the derivatives (:func:`ncc_normalize_with_grad`)
    so n_nodes>1 solvers (multi-node KA, the reference's EvaluateNodes path in
    residuals/src/featuremetric.h:54-55) get exact analytic Jacobians."""
    nodes = jnp.asarray(config.nodes_array())

    def one(node):
        return _interpolate_point_with_grad(patch, r + node[1], c + node[0],
                                            config)

    f, dfdr, dfdc = jax.vmap(one)(nodes)
    if config.ncc_normalize:
        f, (dfdr, dfdc) = ncc_normalize_with_grad(f, (dfdr, dfdc))
    return f, dfdr, dfdc
