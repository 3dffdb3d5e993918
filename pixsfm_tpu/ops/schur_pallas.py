"""Fused Pallas TPU kernels for the CG Schur-complement matvec (grid regime).

The large-scene geometric BA path (ops/schur.py `schur_step_t`, grid_fast)
spends ~98% of an LM iteration in ~25 PCG applications of the Schur term
``(W V^-1 W^T) v``. The XLA formulation (one lax.scan over obs chunks with
one-hot einsums) streams the 240 MB ``Bt`` operand twice per matvec and
materializes [NR, CH]/[3, CH] intermediates in HBM between scan stages; it
measured 7.0-7.6 ms/matvec isolated and ~10.5 ms in-solve at 2M obs / 500k
points on v5e (docs/ba_throughput.md), ~10x above the mandatory-traffic
bound.

These kernels fuse the whole matvec into one pass over ``Bt``:

  - the observation axis is repacked as ``[T, NR*3, Ppad]`` (track rank on
    the leading axis, POINTS on lanes) so the per-track reduction
    ``sum_{j<T}`` is a static Python loop over sublane groups — no segment
    reduction, no R-matrix, no reshape of the lane axis;
  - the per-observation pose/camera row gathers become one-hot matmuls
    against VMEM-resident ``[6, I]`` / ``[k, Nc]`` tables (MXU);
  - the only HBM traffic is ``Bt`` once (+ index rows + point inverses),
    with [6, I] / [k, Nc] accumulators revisited in VMEM across the grid.

Reference behavior being accelerated: Ceres ITERATIVE_SCHUR's implicit
Schur-complement matvec (reference bundle_optimizer.h:180-191 selects it for
large scenes). The packing/unpacking convention matches
`ops/schur.py schur_step_t` (grid obs order o = point * T + rank, zero-padded
W blocks nullify tail slots).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _dot_oh(a, oh):
    """Exact f32 ``a @ oh`` when ``oh`` is a one-hot matrix, in 3 MXU passes.

    Every dot in these kernels has a ONE-HOT operand: one-hots are exactly
    bf16-representable (0.0/1.0), so splitting only ``a`` into its 3-term
    bf16 expansion (8+8+8 mantissa bits = f32's 24) makes each partial
    product exact and the f32 MXU accumulation reproduces the f32 result.
    Mosaic supports only DEFAULT/HIGHEST dot precisions; HIGHEST is 6
    bf16 passes of BOTH operands — 2x the MXU work for bit-equal output
    here. Measured on the 2M-obs bench: the CG matvec is MXU-pass bound
    (3.05 ms/CG-iter at HIGHEST, by cap-5 vs cap-25 LM differencing)."""
    a_hi = a.astype(jnp.bfloat16)
    r1 = a - a_hi.astype(jnp.float32)
    a_mid = r1.astype(jnp.bfloat16)
    a_lo = (r1 - a_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    ohb = oh if oh.dtype == jnp.bfloat16 else oh.astype(jnp.bfloat16)
    out = jnp.dot(a_hi, ohb, preferred_element_type=jnp.float32)
    out = out + jnp.dot(a_mid, ohb, preferred_element_type=jnp.float32)
    return out + jnp.dot(a_lo, ohb, preferred_element_type=jnp.float32)

# flipped to True by tests to run the kernels through the Pallas interpreter
# (exact, works on CPU); the production path compiles via Mosaic on TPU.
INTERPRET = False

# lane-dim tile: points per grid step. 2048 keeps the per-step working set
# (~1 MB Bt tile + 2 x 1.6 MB transient one-hots at I=200) well inside VMEM
# with double-buffered inputs.
DEFAULT_TILE = 2048


def pick_tile(I: int, Nc: int, max_tile: int = 4096) -> int:
    """Largest point tile whose [I/Nc, tile] one-hot transients fit a ~6 MB
    VMEM budget (bf16 one-hots: 2 bytes each; larger image counts force
    smaller tiles). Bigger tiles amortize the per-grid-step latency that
    dominates the serial in-loop matvec."""
    t = max_tile
    while t > 256 and (I + Nc) * t * 2 * 2 > 6 * 1024 * 1024:
        t //= 2
    return t


def enabled(mode: str, I: int, Nc: int, T: int) -> bool:
    """Gate for the grid-regime CG matvec backend. "auto" turns the kernels
    on only on real TPU backends and at shapes where the one-hot tables fit
    VMEM; "on" forces them (tests combine it with INTERPRET)."""
    if mode == "off":
        return False
    if mode == "on" or INTERPRET:
        return True
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover - backend probing only
        return False
    # beyond ~2k images the one-hot matmuls stop being the right gather and
    # the XLA scan path (or a future I-tiled kernel) should take over
    return (I + Nc) <= 2048 and 1 <= T <= 16


def _oh_np(idx_1d, n):
    """[n, P] one-hot (bf16 — exact for 0/1, halves the VMEM transient) of an
    int row — iota compare, fused on the VPU."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, idx_1d.shape[-1]), 0)
    return (idx_1d[None, :] == iota).astype(jnp.bfloat16)


def _oh_np_T(idx_1d, n):
    """[P, n] transposed one-hot — generated directly in the transposed
    orientation (a kernel-side .T of the [n, P] form would relayout)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx_1d.shape[-1], n), 1)
    return (idx_1d[:, None] == iota).astype(jnp.bfloat16)


def _wvinv(vi, t):
    """w[a] = sum_b Vinv[a, b] * t[b], all [3, P] planes."""
    return jnp.concatenate(
        [jnp.sum(vi[a] * t, axis=0, keepdims=True) for a in range(3)], axis=0)


def _bt_rows(b, rows, NR):
    """s[c] = sum_a b[3a+c] * rows[a]  -> [3, P] (W^T applied per rank)."""
    s = None
    for a in range(NR):
        term = b[3 * a:3 * a + 3, :] * rows[a:a + 1, :]
        s = term if s is None else s + term
    return s


def _b_w(b, w, NR):
    """u[a] = sum_c b[3a+c] * w[c]  -> [NR, P] (W applied per rank)."""
    return jnp.concatenate(
        [jnp.sum(b[3 * a:3 * a + 3, :] * w, axis=0, keepdims=True)
         for a in range(NR)], axis=0)


def _matvec_kernel(T, NR, I, Nc, k,
                   vpT_ref, vcT_ref, bt_ref, img_ref, cam_ref, vi_ref,
                   up_ref, uc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        up_ref[:] = jnp.zeros_like(up_ref)
        uc_ref[:] = jnp.zeros_like(uc_ref)

    P = bt_ref.shape[-1]
    vi = vi_ref[:]
    # pass 1: t = sum over ranks of W_j^T rows_j          [3, P]
    t = jnp.zeros((3, P), jnp.float32)
    for j in range(T):
        oh_i = _oh_np(img_ref[j, :], I)
        oh_c = _oh_np(cam_ref[j, :], Nc)
        rows = jnp.concatenate([
            _dot_oh(vpT_ref[:], oh_i),
            _dot_oh(vcT_ref[:], oh_c)], axis=0)
        t = t + _bt_rows(bt_ref[j], rows, NR)
    # w = Vinv t (damped point-block inverse)             [3, P]
    w = _wvinv(vi, t)
    # pass 2: scatter W_j w back to the camera planes (one-hot reduce, MXU)
    for j in range(T):
        u = _b_w(bt_ref[j], w, NR)
        oh_iT = _oh_np_T(img_ref[j, :], I)
        oh_cT = _oh_np_T(cam_ref[j, :], Nc)
        up_ref[:] += _dot_oh(u[:6], oh_iT)
        uc_ref[:] += _dot_oh(u[6:], oh_cT)


def _rhs_kernel(T, NR, I, Nc, k,
                bt_ref, img_ref, cam_ref, vi_ref, gx_ref,
                up_ref, uc_ref):
    """(W V^-1 g_x) reduced to camera planes — second half of the matvec."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        up_ref[:] = jnp.zeros_like(up_ref)
        uc_ref[:] = jnp.zeros_like(uc_ref)

    w = _wvinv(vi_ref[:], gx_ref[:])
    for j in range(T):
        u = _b_w(bt_ref[j], w, NR)
        oh_iT = _oh_np_T(img_ref[j, :], I)
        oh_cT = _oh_np_T(cam_ref[j, :], Nc)
        up_ref[:] += _dot_oh(u[:6], oh_iT)
        uc_ref[:] += _dot_oh(u[6:], oh_cT)


def _backsub_kernel(T, NR, I, Nc, k,
                    vpT_ref, vcT_ref, bt_ref, img_ref, cam_ref,
                    t_ref):
    """W^T (gathered camera rows) reduced per point — first half."""
    P = bt_ref.shape[-1]
    t = jnp.zeros((3, P), jnp.float32)
    for j in range(T):
        oh_i = _oh_np(img_ref[j, :], I)
        oh_c = _oh_np(cam_ref[j, :], Nc)
        rows = jnp.concatenate([
            _dot_oh(vpT_ref[:], oh_i),
            _dot_oh(vcT_ref[:], oh_c)], axis=0)
        t = t + _bt_rows(bt_ref[j], rows, NR)
    t_ref[:] = t


def pack_grid_blocks(Bt, img_idx, cam_idx, Vinv_t, T, tile=DEFAULT_TILE):
    """Repack the grid-ordered system for the kernels.

    Bt [NR*3, O] with obs slot o = point*T + rank  ->  Btr [T, NR*3, Ppad]
    (Ppad = ceil(Np/tile)*tile, zero-padded so tail points contribute
    exactly nothing); index rows [T, Ppad]; Vinv [3, 3, Ppad].
    """
    R3, O = Bt.shape
    Np = O // T
    Ppad = int(np.ceil(max(Np, 1) / tile)) * tile
    if Ppad * T != O:
        Bt = jnp.concatenate(
            [Bt, jnp.zeros((R3, Ppad * T - O), Bt.dtype)], axis=1)
        img_idx = jnp.concatenate(
            [img_idx, jnp.zeros(Ppad * T - O, img_idx.dtype)])
        cam_idx = jnp.concatenate(
            [cam_idx, jnp.zeros(Ppad * T - O, cam_idx.dtype)])
    Btr = jnp.moveaxis(Bt.reshape(R3, Ppad, T), 2, 0)        # [T, R3, Ppad]
    img_r = img_idx.reshape(Ppad, T).T                        # [T, Ppad]
    cam_r = cam_idx.reshape(Ppad, T).T
    if Vinv_t.shape[2] != Ppad:
        Vinv_t = jnp.concatenate(
            [Vinv_t, jnp.zeros((3, 3, Ppad - Vinv_t.shape[2]),
                               Vinv_t.dtype)], axis=2)
    # materialize the repack once per Schur step: without the barrier XLA
    # re-fuses the transpose into every one of the ~25 CG matvec consumers
    Btr = jax.lax.optimization_barrier(Btr)
    return Btr, img_r, cam_r, Vinv_t, Ppad


def _specs(T, R3, I, Nc, k, tile):
    vp_spec = pl.BlockSpec((6, I), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vc_spec = pl.BlockSpec((k, Nc), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bt_spec = pl.BlockSpec((T, R3, tile), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((T, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    vi_spec = pl.BlockSpec((3, 3, tile), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    gx_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    return vp_spec, vc_spec, bt_spec, idx_spec, vi_spec, gx_spec


@functools.partial(jax.jit, static_argnames=("T", "I", "Nc", "k", "tile"))
def schur_term_matvec(vpT, vcT, Btr, img_r, cam_r, Vinv_pad,
                      *, T: int, I: int, Nc: int, k: int,
                      tile: int = DEFAULT_TILE
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(W V^-1 W^T) v accumulated to camera planes: returns [6, I], [k, Nc]."""
    R3 = Btr.shape[1]
    NR = R3 // 3
    Ppad = Btr.shape[2]
    vp_s, vc_s, bt_s, idx_s, vi_s, _ = _specs(T, R3, I, Nc, k, tile)
    return pl.pallas_call(
        functools.partial(_matvec_kernel, T, NR, I, Nc, k),
        grid=(Ppad // tile,),
        in_specs=[vp_s, vc_s, bt_s, idx_s, idx_s, vi_s],
        out_specs=(
            pl.BlockSpec((6, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, Nc), lambda i: (0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((6, I), jnp.float32),
                   jax.ShapeDtypeStruct((k, Nc), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=2 * Ppad * T * (6 * I + k * Nc) * 2 + 4 * Ppad * T * NR * 3,
            bytes_accessed=Btr.size * 4 + 2 * img_r.size * 4
            + Vinv_pad.size * 4,
            transcendentals=0),
        interpret=INTERPRET,
    )(vpT, vcT, Btr, img_r, cam_r, Vinv_pad)


@functools.partial(jax.jit, static_argnames=("T", "I", "Nc", "k", "tile"))
def schur_rhs(Btr, img_r, cam_r, Vinv_pad, gxt_pad,
              *, T: int, I: int, Nc: int, k: int, tile: int = DEFAULT_TILE
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(W V^-1 g_x) reduced to camera planes: returns [6, I], [k, Nc]."""
    R3 = Btr.shape[1]
    NR = R3 // 3
    Ppad = Btr.shape[2]
    _, _, bt_s, idx_s, vi_s, gx_s = _specs(T, R3, I, Nc, k, tile)
    return pl.pallas_call(
        functools.partial(_rhs_kernel, T, NR, I, Nc, k),
        grid=(Ppad // tile,),
        in_specs=[bt_s, idx_s, idx_s, vi_s, gx_s],
        out_specs=(
            pl.BlockSpec((6, I), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, Nc), lambda i: (0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((6, I), jnp.float32),
                   jax.ShapeDtypeStruct((k, Nc), jnp.float32)),
        interpret=INTERPRET,
    )(Btr, img_r, cam_r, Vinv_pad, gxt_pad)


@functools.partial(jax.jit, static_argnames=("T", "I", "Nc", "k", "tile"))
def schur_backsub(vpT, vcT, Btr, img_r, cam_r,
                  *, T: int, I: int, Nc: int, k: int,
                  tile: int = DEFAULT_TILE) -> jnp.ndarray:
    """W^T (gathered rows of v) reduced per point: returns [3, Ppad]."""
    R3 = Btr.shape[1]
    NR = R3 // 3
    Ppad = Btr.shape[2]
    vp_s, vc_s, bt_s, idx_s, _, _ = _specs(T, R3, I, Nc, k, tile)
    return pl.pallas_call(
        functools.partial(_backsub_kernel, T, NR, I, Nc, k),
        grid=(Ppad // tile,),
        in_specs=[vp_s, vc_s, bt_s, idx_s, idx_s],
        out_specs=pl.BlockSpec((3, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Ppad), jnp.float32),
        interpret=INTERPRET,
    )(vpT, vcT, Btr, img_r, cam_r)


# ---------------------------------------------------------------------------
# pure-jnp oracle (same [T, ., Ppad] layout) for parity tests


def schur_term_matvec_ref(vpT, vcT, Btr, img_r, cam_r, Vinv_pad):
    T, R3, Ppad = Btr.shape
    NR = R3 // 3
    rows = jnp.concatenate([vpT.T[img_r], vcT.T[cam_r]], axis=-1)  # [T,P,NR]
    b = Btr.reshape(T, NR, 3, Ppad)
    t = jnp.einsum("jacp,jpa->cp", b, rows)
    w = jnp.einsum("abp,bp->ap", Vinv_pad, t)
    u = jnp.einsum("jacp,cp->jap", b, w)                           # [T,NR,P]
    I = vpT.shape[1]
    Nc = vcT.shape[1]
    up = jnp.zeros((6, I))
    uc = jnp.zeros((vcT.shape[0], Nc))
    for j in range(T):
        oh_i = jax.nn.one_hot(img_r[j], I, dtype=jnp.float32)      # [P, I]
        oh_c = jax.nn.one_hot(cam_r[j], Nc, dtype=jnp.float32)
        up = up + u[j, :6] @ oh_i
        uc = uc + u[j, 6:] @ oh_c
    return up, uc
