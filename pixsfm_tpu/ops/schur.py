"""Bundle-adjustment LM with Schur complement, as one jitted XLA program.

TPU-native replacement for the reference's Ceres BA solves
(pixsfm/bundle_adjustment/src/bundle_optimizer.h:114-245: DENSE_SCHUR /
SPARSE_SCHUR / ITERATIVE_SCHUR by image count). Design:

- Parameters: poses ``(qvec [I,4], tvec [I,3])`` updated through a 6-DoF left
  so(3)+R^3 tangent (the quaternion-manifold equivalent, bundle_optimizer.h:366-397),
  shared intrinsics ``cams [Nc,k]`` with per-coordinate free masks
  (refine_focal_length/principal_point/extra_params subsets, :399-442), and points
  ``xyz [Np,3]``.
- Per-observation residuals+Jacobians via **forward-mode autodiff of the tangent**
  (``jax.jacfwd`` over 6+k+3 dims) — the batched analogue of Ceres Jets flowing
  through projection+interpolation; evaluated in fixed-size observation chunks
  (``lax.map``) so the ``[O, C, 6+k+3]`` intermediate never materializes whole.
- Robustification: IRLS weights ``rho'(||r||^2)``.
- Normal equations in block form: pose blocks ``[I,6,6]``, intrinsics ``[Nc,k,k]``,
  pose-intrinsics cross ``[I,6,k]``, point blocks ``V [Np,3,3]`` via ``segment_sum``.
- Schur complement over points: per-point 3x3 inverses, then the reduced camera
  system ``S = A - sum_p W_p V_p^-1 W_p^T`` assembled from *ordered observation
  pairs of the same track* — a flat pair list precomputed on the host, reduced with
  scatter-adds. Dense Cholesky/LU solve of S (M = 6I + k*Nc), then point
  back-substitution. This is the DENSE_SCHUR regime; the pair list is the natural
  sharding axis for multi-chip scenes (psum of S).
- Optional inner point-only iterations after each accepted step
  (``use_inner_iterations``; VarPro-style refinement, bundle_optimizer.h:350-355).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..base.geometry import exp_quat, quat_mul, quat_normalize

__all__ = ["BAOptions", "BAState", "BAObservations", "ba_solve"]

# Profiling hook: when set to a dict (see examples/profile_ba_large.py),
# ba_solve additionally exports its internal stage closures (eval_chunked /
# schur_step / cost_at) so each LM-iteration stage can be compiled and timed
# in isolation. None (the default) is zero-overhead — one trace-time check.
_STAGE_EXPORT = None


@dataclass(frozen=True)
class BAOptions:
    max_iterations: int = 100
    parameter_tolerance: float = 0.0
    function_tolerance: float = 0.0
    gradient_tolerance: float = 0.0
    initial_lambda: float = 1e-4
    min_lambda: float = 1e-14
    max_lambda: float = 1e32
    min_diagonal: float = 1e-6
    max_diagonal: float = 1e32
    use_inner_iterations: bool = False
    inner_iteration_count: int = 2
    # Ceres use_nonmonotonic_steps: GLL acceptance against the max cost of
    # the last `nonmonotonic_window` accepted iterates; the best-seen state
    # is returned (matches ops/lm.py).
    use_nonmonotonic_steps: bool = False
    nonmonotonic_window: int = 10
    obs_chunk: int = 8192
    # dense-path Schur pair reduction chunk: bounds the [Q, NR, NR] pair-block
    # intermediate (one lax.scan step materializes pair_chunk blocks at a time)
    pair_chunk: int = 131072
    # "dense": materialize the reduced camera system from track pairs and
    # Cholesky it (DENSE_SCHUR). "cg": matrix-free preconditioned CG on the
    # Schur complement (ITERATIVE_SCHUR + block-Jacobi — the reference's
    # large-scene regime, bundle_optimizer.h:180-191).
    linear_solver: str = "dense"
    max_linear_solver_iterations: int = 100
    # inexact-Newton forcing tolerance for the CG path (relative residual).
    # Ceres' ITERATIVE_SCHUR solves the linear system loosely (eta ~ 0.1)
    # and lets the trust region guard descent; a tight tolerance wastes CG
    # iterations on directions LM will re-damp anyway.
    linear_solver_tol: float = 0.1
    # per-iteration progress logging from inside the jitted LM loop
    # (jax.debug.callback; the analogue of Ceres
    # minimizer_progress_to_stdout + the reference's progressbars,
    # base/src/callbacks.h:10-37 / simple_logger.h:157-188)
    progress: bool = False
    # >0: the host dispatches the LM loop in segments of this many
    # iterations, re-entering with warm-restarted damping — progress is
    # reported and Ctrl-C lands between segments with the best-so-far
    # state kept (PyInterruptCallback parity)
    segment_iterations: int = 0
    # >0: the caller packed the observation axis in POINT-MAJOR GRID order —
    # obs slot o = point * obs_grid_T + rank, padded to exactly
    # Np * obs_grid_T slots (holes carry valid=False). Point-side segment
    # reductions then become reshape-sums and point->obs broadcasts become
    # reshapes, replacing the [Np, T]-table lane-axis gathers that run at
    # ~10 GB/s on TPU (the minor-dim gather path). CG large-O regime only.
    obs_grid_T: int = 0
    # fused Pallas kernels for the grid-regime CG Schur matvec/rhs/backsub
    # (ops/schur_pallas.py): one pass over Bt per matvec with VMEM-resident
    # accumulators — measured 0.2-0.5 ms/matvec vs 7-11 ms for the XLA scan
    # at 2M obs / 500k pts on v5e. "auto" = on for TPU backends at shapes
    # whose one-hot tables fit VMEM; "on" forces (tests pair it with
    # schur_pallas.INTERPRET); "off" keeps the XLA chunked-einsum path.
    pallas_matvec: str = "auto"

    @classmethod
    def from_solver_conf(cls, conf, **overrides) -> "BAOptions":
        if conf is None:
            return cls(**overrides)
        get = conf.get if hasattr(conf, "get") else lambda k, d=None: conf[k]
        kw = dict(
            max_iterations=int(get("max_num_iterations", 100)),
            parameter_tolerance=float(get("parameter_tolerance", 0.0) or 0.0),
            function_tolerance=float(get("function_tolerance", 0.0) or 0.0),
            gradient_tolerance=float(get("gradient_tolerance", 0.0) or 0.0),
            use_inner_iterations=bool(get("use_inner_iterations", False)),
            use_nonmonotonic_steps=bool(get("use_nonmonotonic_steps", False)),
            nonmonotonic_window=int(
                get("max_consecutive_nonmonotonic_steps", 10) or 10),
            max_linear_solver_iterations=int(
                get("max_linear_solver_iterations", 100) or 100),
            linear_solver_tol=float(get("linear_solver_tol", 0.1) or 0.1),
            progress=bool(get("minimizer_progress_to_stdout", False)),
            segment_iterations=int(get("segment_iterations", 0) or 0),
            pallas_matvec=str(get("pallas_matvec", "auto") or "auto"),
        )
        kw.update(overrides)
        return cls(**kw)


class BAState(NamedTuple):
    qvec: jnp.ndarray   # [I, 4]
    tvec: jnp.ndarray   # [I, 3]
    cams: jnp.ndarray   # [Nc, k]
    xyz: jnp.ndarray    # [Np, 3]


class BAObservations(NamedTuple):
    """Flat observation arrays + the Schur pair list (host-precomputed)."""
    img_idx: jnp.ndarray     # [O] int32 -> image slot
    cam_idx: jnp.ndarray     # [O] int32 -> camera slot
    pt_idx: jnp.ndarray      # [O] int32 -> point slot
    obs_data: Tuple          # pytree of per-obs leaves [O, ...]
    valid: jnp.ndarray       # [O] bool (padding mask)
    pair_o1: jnp.ndarray     # [Q] int32 ordered same-track observation pairs
    pair_o2: jnp.ndarray     # [Q] int32
    # optional second pose block per observation (patch-warp source view,
    # reference: patch_warp_bundle_optimizer.h source pose parameter block).
    # None -> single pose block per observation.
    src_idx: Optional[jnp.ndarray] = None   # [O] int32 -> image slot
    # optional point-major index table [Np, T] (make_point_major): row p
    # lists the observation indices of point p's track, empty slots = O
    # (a zero sentinel row). When present, every point-side segment
    # reduction becomes gather -> reshape -> sum over T — scatter-free at
    # millions of points, where the one-hot matmul's [Np, n] operand blows
    # its budget and the code would otherwise fall back to scatter-adds.
    pt_slot: Optional[jnp.ndarray] = None   # [Np, T] int32 -> obs index | O
    # same table for the image axis (row i = observations of image i),
    # used by the CG matvec's full-O image reductions — at millions of
    # observations the [I, O] one-hot blows its budget and the scatter
    # fallback serializes (~1 elem/cycle on the scalar unit)
    img_slot: Optional[jnp.ndarray] = None  # [I, T_img] int32 -> obs idx | O


class _LMState(NamedTuple):
    state: BAState
    sysd: Dict                 # carried normal equations at `state` ({} when
    #                            inner iterations force per-iteration re-eval)
    lam: jnp.ndarray
    nu: jnp.ndarray
    cost: jnp.ndarray
    done: jnp.ndarray
    it: jnp.ndarray
    iters_used: jnp.ndarray
    cost_window: jnp.ndarray   # [W] recent accepted costs (nonmonotonic)
    best_state: BAState
    best_cost: jnp.ndarray


def make_pair_list(pt_idx: np.ndarray, n_points: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """All ordered pairs (o1, o2) of observations sharing a point (host side)."""
    order = np.argsort(pt_idx, kind="stable")
    sorted_pts = pt_idx[order]
    starts = np.searchsorted(sorted_pts, np.arange(n_points), side="left")
    ends = np.searchsorted(sorted_pts, np.arange(n_points), side="right")
    o1, o2 = [], []
    for s, e in zip(starts, ends):
        obs = order[s:e]
        if len(obs) == 0:
            continue
        g1, g2 = np.meshgrid(obs, obs, indexing="ij")
        o1.append(g1.ravel())
        o2.append(g2.ravel())
    if not o1:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    return (np.concatenate(o1).astype(np.int32),
            np.concatenate(o2).astype(np.int32))


def make_point_major(pt_idx: np.ndarray, n_points: int, zero_slot: int,
                     min_T: int = 4) -> np.ndarray:
    """Point-major observation table [n_points, T] (host side, vectorized).

    Row p holds the indices (into the observation axis) of point p's
    observations; empty slots hold ``zero_slot`` (callers append one zero
    row at that index before gathering). T = max track length, rounded up
    to a power of two so repeat solves share compiled programs. Pass only
    REAL observation rows in ``pt_idx`` (padding rows contribute zero to
    every segment sum anyway and would inflate T)."""
    pt_idx = np.asarray(pt_idx)
    order = np.argsort(pt_idx, kind="stable")
    sorted_pts = pt_idx[order]
    starts = np.searchsorted(sorted_pts, np.arange(n_points), side="left")
    counts = np.searchsorted(sorted_pts, np.arange(n_points),
                             side="right") - starts
    T = max(int(counts.max(initial=1)), 1)
    T = max(1 << int(np.ceil(np.log2(T))), min_T)
    out = np.full((n_points, T), zero_slot, np.int32)
    cols = np.arange(len(order)) - starts[sorted_pts]
    out[sorted_pts, cols] = order
    return out


# one-hot segment-sum budget: S targets x n items. XLA fuses the index
# comparison into the matmul operands (the one-hot never materializes in
# HBM), so the cost is the [S, n] x [n, d] MXU pass. Measured on v5e:
# scatter-add of an 8192-chunk is ~370us regardless of S; the one-hot
# matmul is ~0-20us for S<=2000 and ~190us at S=20000.
_ONEHOT_BUDGET = 1 << 28


def _oh_dot(a, b, a_is_onehot: bool):
    """Exact f32 ``a @ b`` in 3 MXU passes when one operand is a ONE-HOT.

    One-hots are exactly bf16-representable (0.0/1.0), so only the value
    operand needs the 3-term bf16 expansion (8+8+8 mantissa bits covers
    f32's 24); every partial product is then exact and the f32 MXU
    accumulation reproduces the f32 dot. HIGHEST (the previous setting)
    splits BOTH operands — 6 passes — for bit-equal output on these
    contractions; DEFAULT (1 bf16 pass) quantizes the accumulated normal
    equations and visibly loses LM steps. Measured on the 2M-obs bench:
    the eval/CG one-hot matmuls are MXU-pass bound, and 6 -> 3 passes cut
    the LM iteration 120 -> ~90 ms with identical cost trajectories."""
    def split3(x):
        hi = x.astype(jnp.bfloat16)
        r1 = x - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, mid, lo

    if a_is_onehot:
        ohb = a if a.dtype == jnp.bfloat16 else a.astype(jnp.bfloat16)
        out = None
        for part in split3(b):
            t = jnp.dot(ohb, part, preferred_element_type=jnp.float32)
            out = t if out is None else out + t
        return out
    ohb = b if b.dtype == jnp.bfloat16 else b.astype(jnp.bfloat16)
    out = None
    for part in split3(a):
        t = jnp.dot(part, ohb, preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    return out


def _segment_matmul(idx, S: int, vals):
    """sum of vals[i] into segment idx[i] via a fused one-hot matmul.

    idx [n] int32, vals [n, ...] -> [S, ...]. Caller checks _ONEHOT_BUDGET.
    """
    n = vals.shape[0]
    oh = (idx[None, :] == jnp.arange(S, dtype=jnp.int32)[:, None]
          ).astype(jnp.bfloat16)
    flat = vals.reshape(n, -1)
    out = _oh_dot(oh, flat, a_is_onehot=True)
    return out.reshape((S,) + vals.shape[1:])


def _segment_sum(idx, S: int, vals):
    """Segment reduction: fused one-hot matmul when affordable, else scatter."""
    n = vals.shape[0]
    if S * n <= _ONEHOT_BUDGET:
        return _segment_matmul(idx, S, vals)
    return jnp.zeros((S,) + vals.shape[1:], vals.dtype).at[idx].add(vals)


def _inv3x3(A):
    """Batched closed-form 3x3 inverse (adjugate/determinant) — much faster
    on TPU than the batched LU that jnp.linalg.inv lowers to."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30,
                              jnp.where(det < 0, -1e-30, 1e-30), det)
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A21, A22, A23], axis=-1),
        jnp.stack([A31, A32, A33], axis=-1)], axis=-2)
    return adj * inv_det[..., None, None]


def _apply_tangent(state: BAState, d_pose, d_cam, d_xyz) -> BAState:
    q = quat_normalize(quat_mul(exp_quat(d_pose[:, :3]), state.qvec))
    return BAState(q, state.tvec + d_pose[:, 3:], state.cams + d_cam,
                   state.xyz + d_xyz)


def ba_solve(residual_fn: Callable,
             state0: BAState,
             obs: BAObservations,
             loss,
             pose_free: jnp.ndarray,      # [I] bool
             tvec_free: jnp.ndarray,      # [I, 3] bool (gauge-fix coords)
             cam_free: jnp.ndarray,       # [Nc, k] bool
             point_free: jnp.ndarray,     # [Np] bool
             opts: BAOptions = BAOptions(),
             ctx=(),
             residual_jac_fn: Optional[Callable] = None,
             lam0=None,
             max_iters=None
             ) -> Tuple[BAState, Dict]:
    """Run the Schur LM.

    residual_fn(qvec[4], tvec[3], cam[k], xyz[3], obs_slice[, ctx]) -> r [C]
    (must be jacfwd-able; obs_slice is one element of obs.obs_data; ``ctx`` is
    an optional pytree of shared arrays — passing shared data through ctx
    instead of Python closures lets callers cache one jitted instance of the
    whole solve).

    When ``obs.src_idx`` is set, each observation carries a SECOND optimized
    pose block (the patch-warp source view) and the residual signature becomes
    ``residual_fn(q, t, q_src, t_src, cam, X, obs_slice[, ctx])``. The
    camera-side normal matrix is then assembled from per-observation full
    blocks so the img<->src<->intrinsics cross terms are exact (the reference
    couples both poses through one Ceres cost functor,
    patch_warp_bundle_optimizer.h:21-61).

    ``residual_jac_fn`` (optional) is the analytic fast path: called as
    ``residual_jac_fn(q, t, cam, X, obs_slice, ctx) -> (r [C], J [C, 6+k+3])``
    at the current state (tangent 0, same layout as the jacfwd tangent:
    [omega(3), dt(3), dcam(k), dX(3)]). When given, the Jacobian chunk eval
    uses it instead of generic ``jax.jacfwd`` over ``residual_fn`` — built
    from :func:`pixsfm_tpu.base.projection.project_with_jac` + the analytic
    interpolation gradients by the BA strategies. ``residual_fn`` is still
    used for pure cost evaluations, so the two must agree on the primal.
    Not supported together with ``src_idx`` (patch-warp keeps jacfwd)."""
    I = state0.qvec.shape[0]
    Nc, k = state0.cams.shape
    Np = state0.xyz.shape[0]
    M = 6 * I + k * Nc
    O = obs.img_idx.shape[0]
    has_src = obs.src_idx is not None
    if residual_jac_fn is not None and has_src:
        raise ValueError("residual_jac_fn is not supported with src_idx "
                         "(patch-warp uses the jacfwd path)")
    PB = 12 if has_src else 6        # pose tangent rows per observation
    NR = PB + k                      # camera-side rows per observation
    use_pm = obs.pt_slot is not None  # point-major [Np, T] reductions
    # TRANSPOSED large-O regime: TPU (8,128) tiling pads the minor dims of
    # every per-observation [O, small] array to 128 — f32[2M,10,3] stores as
    # 15.26 GB (68x). Past the point-major threshold the CG path therefore
    # keeps all per-obs/per-point structs in [d, O] / [d, Np] layout
    # (~1.07x padding) and reduces over tracks with small static loops.
    # GRID sub-regime (opts.obs_grid_T > 0): the obs axis itself is packed
    # point-major (slot = point * T + rank, exactly Np*T slots), so the
    # point reductions/broadcasts are reshape-shaped — no gather at all.
    grid_T = int(getattr(opts, "obs_grid_T", 0) or 0)
    use_grid = grid_T > 0 and not has_src and opts.linear_solver == "cg"
    use_t = (use_pm or use_grid) and not has_src \
        and opts.linear_solver == "cg"
    if use_grid and O != Np * grid_T:
        raise ValueError(
            f"obs_grid_T={grid_T}: obs axis must be exactly Np*T "
            f"({Np}*{grid_T}={Np * grid_T}), got O={O}")

    def _table_sum(table, vals):
        """Gather the [S, T] slot table (+1 zero sentinel row appended to
        vals) and sum over T — a scatter-free, one-hot-free segment sum."""
        z = jnp.zeros((1,) + vals.shape[1:], vals.dtype)
        padded = jnp.concatenate([vals, z], axis=0)
        return jnp.sum(padded[table], axis=1)

    def pt_segment_sum(vals):
        """Per-point reduction of per-observation values [O, ...] -> [Np, ...].

        Point-major path: gather the [Np, T] track table (+1 zero sentinel
        row) and sum over T — a reshape-shaped reduction with no scatter and
        no [Np, O] one-hot operand, exact at any point count."""
        if not use_pm:
            return _segment_sum(obs.pt_idx, Np, vals)
        return _table_sum(obs.pt_slot, vals)

    def img_segment_sum(vals):
        """Per-image reduction of per-observation values [O, ...] -> [I, ...]."""
        if obs.img_slot is None:
            return _segment_sum(obs.img_idx, I, vals)
        return _table_sum(obs.img_slot, vals)

    # ---- transposed-layout helpers (use_t) --------------------------------
    pt_tableT = (obs.pt_slot.T if (use_t and not use_grid) else None)

    def pt_table_sum_t(vals_t):
        """[d, O] -> [d, Np]: loop the (small, static) track axis with
        [d, Np] gathers — no [Np, T, d] intermediate (its d axis would pad
        to 128)."""
        T = pt_tableT.shape[0]
        z = jnp.zeros(vals_t.shape[:-1] + (1,), vals_t.dtype)
        padded = jnp.concatenate([vals_t, z], axis=-1)   # sentinel col = O

        def body(t, acc):
            return acc + padded[:, pt_tableT[t]]
        return jax.lax.fori_loop(
            0, T, body, jnp.zeros(vals_t.shape[:-1] + (Np,), vals_t.dtype))

    def pt_reduce_t(vals_t):
        """Point reduction [d, O] -> [d, Np] in the transposed layout."""
        if use_grid:
            # grid order: a pure reshape-sum (measured ~85 GB/s on v5e vs
            # ~10 GB/s for the minor-axis table gathers)
            return vals_t.reshape(vals_t.shape[:-1] + (Np, grid_T)).sum(-1)
        return pt_table_sum_t(vals_t)

    def pt_expand_t(vals_t):
        """Point -> obs broadcast [d, Np] -> [d, O] in the transposed layout."""
        if use_grid:
            return jnp.broadcast_to(
                vals_t[..., None],
                vals_t.shape + (grid_T,)).reshape(vals_t.shape[:-1] + (O,))
        return vals_t[..., obs.pt_idx]

    def idx_expand_t(vals, idx, S):
        """Row expand [S, d] -> [d, O] through an index vector.

        In the transposed regime the naive ``vals.T[:, idx]`` is a lane-axis
        gather (~10 GB/s); the fused one-hot matmul runs on the MXU instead
        and leaves the minor axis contiguous."""
        if not use_t:
            return vals.T[:, idx]
        oh = (idx[None, :] == jnp.arange(S, dtype=jnp.int32)[:, None]
              ).astype(jnp.bfloat16)                     # [S, O], fused
        return _oh_dot(vals.T, oh, a_is_onehot=False)

    def _seg_mm_t(idx, S, vals_t):
        """[d, O] -> [S, d] via the fused one-hot matmul, transposed so the
        one-hot contraction runs over the O axis without materializing any
        [O, d] operand."""
        oh = (idx[:, None] == jnp.arange(S, dtype=jnp.int32)[None, :]
              ).astype(jnp.bfloat16)                     # [O, S], fused
        out = _oh_dot(vals_t, oh, a_is_onehot=False)     # [d, S]
        return out.T

    def _inv3x3_t(At):
        """Closed-form 3x3 inverse on [3, 3, N] component planes."""
        a, b, c = At[0, 0], At[0, 1], At[0, 2]
        d, e, f = At[1, 0], At[1, 1], At[1, 2]
        g, h, i = At[2, 0], At[2, 1], At[2, 2]
        A11 = e * i - f * h
        A12 = c * h - b * i
        A13 = b * f - c * e
        A21 = f * g - d * i
        A22 = a * i - c * g
        A23 = c * d - a * f
        A31 = d * h - e * g
        A32 = b * g - a * h
        A33 = a * e - b * d
        det = a * A11 + b * A21 + c * A31
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30,
                                  jnp.where(det < 0, -1e-30, 1e-30), det)
        return jnp.stack([
            jnp.stack([A11, A12, A13]),
            jnp.stack([A21, A22, A23]),
            jnp.stack([A31, A32, A33])]) * inv_det[None, None, :]

    pose_mask6 = jnp.repeat(pose_free[:, None], 6, axis=1).at[:, 3:].set(
        tvec_free & pose_free[:, None])                       # [I, 6]
    cam_mask = cam_free                                        # [Nc, k]
    pt_mask = point_free[:, None] * jnp.ones((1, 3), bool)     # [Np, 3]

    def obs_residual(state: BAState, d, oi):
        """Residual at tangent d for observation oi (traced under jacfwd)."""
        img = obs.img_idx[oi]
        cam = obs.cam_idx[oi]
        pt = obs.pt_idx[oi]
        dp = d[:6]
        q = quat_normalize(quat_mul(exp_quat(dp[:3]), state.qvec[img]))
        t = state.tvec[img] + dp[3:]
        sl = jax.tree_util.tree_map(lambda a: a[oi], obs.obs_data)
        if has_src:
            src = obs.src_idx[oi]
            ds, dc, dx = d[6:12], d[12:12 + k], d[12 + k:]
            qs = quat_normalize(quat_mul(exp_quat(ds[:3]), state.qvec[src]))
            ts = state.tvec[src] + ds[3:]
            c = state.cams[cam] + dc
            X = state.xyz[pt] + dx
            try:
                return residual_fn(q, t, qs, ts, c, X, sl, ctx)
            except TypeError:
                return residual_fn(q, t, qs, ts, c, X, sl)
        dc, dx = d[6:6 + k], d[6 + k:]
        c = state.cams[cam] + dc
        X = state.xyz[pt] + dx
        try:
            return residual_fn(q, t, c, X, sl, ctx)
        except TypeError:
            return residual_fn(q, t, c, X, sl)

    pad_O = int(np.ceil(max(O, 1) / opts.obs_chunk)) * opts.obs_chunk
    n_chunks = pad_O // opts.obs_chunk
    _oidx = jnp.arange(pad_O, dtype=jnp.int32) % jnp.maximum(O, 1)
    _ochunks = _oidx.reshape(n_chunks, opts.obs_chunk)
    _vmask = jnp.where(jnp.arange(pad_O) < O, 1.0, 0.0) \
        .reshape(n_chunks, opts.obs_chunk) * obs.valid[_ochunks]

    # Transposed-regime chunk data, prepared ONCE per solve at trace level
    # (outside the LM while_loop, so XLA hoists it out of the loop): the
    # per-observation row gathers it replaces (``state.qvec[img_idx[oi]]``
    # under vmap — [n, small] intermediates the TPU pads ~32x, plus a slow
    # gather per table) dominated the chunk eval: measured 219 ms of a
    # 288 ms LM iteration at 2M obs on v5e. Scanning pre-chunked data and
    # expanding camera parameters with fused one-hot matmuls runs the same
    # r, J production in 30 ms (round-2 on-chip probe; exact parity).
    # GRID sub-regime: the per-point xyz "gather" is a dynamic_slice +
    # broadcast because chunk c covers points [c*n/T, (c+1)*n/T) exactly.
    grid_slice = use_grid and grid_T > 0 and opts.obs_chunk % grid_T == 0
    if not has_src:
        def _chunk_t(a):
            """[O, *d] -> [n_chunks, *d, chunk] (obs axis minor: ~1x pad)."""
            at = jnp.moveaxis(a[_oidx], 0, -1)
            at = at.reshape(a.shape[1:] + (n_chunks, opts.obs_chunk))
            return jnp.moveaxis(at, -2, 0)
        _scan_extra = dict(
            imgc=obs.img_idx[_oidx].reshape(n_chunks, -1),
            camc=obs.cam_idx[_oidx].reshape(n_chunks, -1),
            cidx=jnp.arange(n_chunks, dtype=jnp.int32),
            sl=jax.tree_util.tree_map(_chunk_t, obs.obs_data))
        if not grid_slice:
            _scan_extra["ptc"] = obs.pt_idx[_oidx].reshape(n_chunks, -1)
    else:
        _scan_extra = {}

    def _oh_expand(vals, idx, S):
        """[S, d] table -> [d, n] rows through a fused one-hot matmul
        (always, independent of layout regime — the MXU expansion beats
        the row gather in BOTH regimes; exact via _oh_dot's 3-pass split)."""
        oh = (idx[None, :] == jnp.arange(S, dtype=jnp.int32)[:, None]
              ).astype(jnp.bfloat16)
        return _oh_dot(vals.T, oh, a_is_onehot=False)

    def _rfn_nojac(q, t, c, X, sl):
        try:
            return residual_fn(q, t, c, X, sl, ctx)
        except TypeError:
            return residual_fn(q, t, c, X, sl)

    def eval_chunked(state: BAState, with_jac: bool):
        """Chunked per-obs eval → (cost, per-obs W blocks, reductions)."""
        zeros_d = jnp.zeros(PB + k + 3, jnp.float32)
        ochunks = _ochunks
        vmask = _vmask
        xyzT_pad = None
        if use_t and grid_slice:
            npc = opts.obs_chunk // grid_T
            xyzT_pad = state.xyz.T                       # [3, Np]
            pad_pts = n_chunks * npc
            if pad_pts > Np:
                # wrap-pad so padded chunks read finite (masked) points
                xyzT_pad = jnp.concatenate(
                    [xyzT_pad, xyzT_pad[:, :pad_pts - Np]], axis=1)

        def expand_chunk_t(inp):
            """Chunk parameter expansion in [d, n] layout.

            Camera-side tables (qvec/tvec/cams) expand through fused
            one-hot matmuls on the MXU (exact at Precision.HIGHEST);
            points come from a grid dynamic_slice + broadcast when the
            obs axis is grid-packed, else a [n, 3] row gather. Returns
            the vmap in_axes for the point operand (static)."""
            qv = _oh_expand(state.qvec, inp["imgc"], I)       # [4, n]
            tv = _oh_expand(state.tvec, inp["imgc"], I)       # [3, n]
            cm = _oh_expand(state.cams, inp["camc"], Nc)      # [k, n]
            if grid_slice:
                npc = opts.obs_chunk // grid_T
                xz = jax.lax.dynamic_slice(
                    xyzT_pad, (0, inp["cidx"] * npc), (3, npc))
                xz = jnp.broadcast_to(
                    xz[:, :, None],
                    (3, npc, grid_T)).reshape(3, opts.obs_chunk)
                return qv, tv, cm, xz, -1
            return qv, tv, cm, state.xyz[inp["ptc"]], 0

        def chunk_gram_t(carry, inp):
            """Transposed-regime chunk eval: one fused Gram matrix per obs.

            The row-major emission materializes per-obs block intermediates
            ([n,C,13] J, [n,NR,3] B, ...) whose minor dims the TPU pads to
            (8,128) — 268-537 MB per 65536-chunk, pure HBM waste. Here the
            parameters arrive already expanded in [d, n] layout (fused
            one-hot matmuls / grid slices — see the _scan_extra note), the
            vmap emits everything n-minor ([C,13,n]) and the normal-equation
            blocks come out of ONE Gram tensor G[i,j,n] = w * Ja_i·Ja_j with
            Ja = [Jp | Jc | Jx | r], so every slice is already in the
            [d, n] layout the transposed reductions want."""
            vm = inp["vm"]
            qv, tv, cm, xz, x_ax = expand_chunk_t(inp)
            r_t, J_t = jax.vmap(residual_jac_fn,
                                in_axes=(-1, -1, -1, x_ax, -1, None),
                                out_axes=-1)(qv, tv, cm, xz, inp["sl"],
                                             ctx)   # [C,n], [C,13,n]
            C = r_t.shape[0]
            s = jnp.sum(r_t * r_t, axis=0)              # [n]
            cost_c = 0.5 * jnp.sum(vm * loss(s))
            out = dict(cost=carry["cost"] + cost_c)
            w = vm * loss.weight(s)                     # [n]
            Ja = jnp.concatenate([J_t, r_t[:, None, :]], axis=1)  # [C,nj,n]
            if C <= 4:
                G = None
                for c in range(C):       # unrolled: stays on the VPU, fuses
                    t_ = (Ja[c] * w)[:, None, :] * Ja[c][None, :, :]
                    G = t_ if G is None else G + t_
            else:
                G = jnp.einsum("cin,cjn->ijn", Ja * w[None, None, :], Ja)
            px = 6 + k
            xe = px + 3
            rc = xe                                     # residual column
            img_rows = jnp.concatenate([
                G[:6, :6].reshape(36, -1), G[:6, rc],
                G[:6, 6:px].reshape(6 * k, -1)], axis=0)
            out["img_acc"] = carry["img_acc"] + _seg_mm_t(
                inp["imgc"], I, img_rows)
            cam_rows = jnp.concatenate([
                G[6:px, 6:px].reshape(k * k, -1), G[6:px, rc]], axis=0)
            out["cam_acc"] = carry["cam_acc"] + _seg_mm_t(
                inp["camc"], Nc, cam_rows)
            ys = dict(B=G[:px, px:xe].reshape(NR * 3, -1),
                      ptv=jnp.concatenate([
                          G[px:xe, px:xe].reshape(9, -1),
                          G[px:xe, rc]], axis=0))
            return out, ys

        def chunk_cost_t(carry, inp):
            """Transposed-regime cost-only chunk: same fused parameter
            expansion, residual_fn on the primal (no Jacobian)."""
            vm = inp["vm"]
            qv, tv, cm, xz, x_ax = expand_chunk_t(inp)
            r_t = jax.vmap(_rfn_nojac, in_axes=(-1, -1, -1, x_ax, -1),
                           out_axes=-1)(qv, tv, cm, xz, inp["sl"])
            s = jnp.sum(r_t * r_t, axis=0)
            cost_c = 0.5 * jnp.sum(vm * loss(s))
            return dict(cost=carry["cost"] + cost_c), None

        def chunk_fn(carry, inp):
            if use_t and with_jac and residual_jac_fn is not None:
                return chunk_gram_t(carry, inp)
            if not has_src and not with_jac:
                return chunk_cost_t(carry, inp)
            ois, vm = inp["ois"], inp["vm"]
            if with_jac and residual_jac_fn is not None:
                # row-major emission, but the same fused parameter
                # expansion as the transposed regime (the per-obs table
                # gathers are the dominant cost either way)
                qv, tv, cm, xz, x_ax = expand_chunk_t(inp)
                r, J = jax.vmap(residual_jac_fn,
                                in_axes=(-1, -1, -1, x_ax, -1, None),
                                out_axes=0)(qv, tv, cm, xz, inp["sl"], ctx)
            elif with_jac:
                def rfun(d, oi):
                    return obs_residual(state, d, oi)
                r = jax.vmap(lambda oi: obs_residual(state, zeros_d, oi))(ois)
                J = jax.vmap(lambda oi: jax.jacfwd(rfun)(zeros_d, oi))(ois)
            else:
                r = jax.vmap(lambda oi: obs_residual(state, zeros_d, oi))(ois)
                J = None
            s = jnp.sum(r * r, axis=-1)
            cost_c = 0.5 * jnp.sum(vm * loss(s))
            out = dict(cost=carry["cost"] + cost_c)
            if not with_jac:
                return out, None
            # all segment reductions below are fused one-hot matmuls (or
            # scatter above the budget) — the XLA scatter-add alternative
            # costs ~370us per chunk on TPU (examples/bench_scatter.py)
            w = (vm * loss.weight(s))[:, None, None]
            img = obs.img_idx[ois]
            cam = obs.cam_idx[ois]
            pt = obs.pt_idx[ois]
            Jcam = J[:, :, :NR]              # pose (+src pose) + cam rows
            Jp = J[:, :, :6]
            Jc = J[:, :, PB:PB + k]
            Jx = J[:, :, PB + k:]
            wJp = w * Jp
            n = ois.shape[0]
            # concatenate each target's reductions so the fused one-hot is
            # generated once per (chunk, target-kind), not once per array
            img_cat = [jnp.einsum("oca,ocb->oab", wJp, Jp).reshape(n, 36),
                       jnp.einsum("oca,oc->oa", wJp, r)]
            if not has_src:
                img_cat.append(
                    jnp.einsum("oca,ocb->oab", wJp, Jc).reshape(n, 6 * k))
            out["img_acc"] = carry["img_acc"] + _segment_sum(
                img, I, jnp.concatenate(img_cat, axis=1))
            out["cam_acc"] = carry["cam_acc"] + _segment_sum(
                cam, Nc, jnp.concatenate(
                    [jnp.einsum("oca,ocb->oab", w * Jc, Jc)
                     .reshape(n, k * k),
                     jnp.einsum("oca,oc->oa", w * Jc, r)], axis=1))
            ptv = jnp.concatenate(
                [jnp.einsum("oca,ocb->oab", w * Jx, Jx).reshape(n, 9),
                 jnp.einsum("oca,oc->oa", w * Jx, r)], axis=1)
            # per-obs W blocks for the Schur pair reduction (small:
            # [O,NR,3]) are emitted as stacked scan outputs — chunks are
            # consecutive index ranges, so no scatter is needed (padded
            # tail rows carry w=0 and are sliced off after the scan).
            B_chunk = jnp.einsum("oca,ocb->oab", w * Jcam, Jx)
            if use_t:
                # transposed emission: [NR*3, chunk] per step so the final
                # stacked B is [NR*3, O] (minor dim = O, ~1x padding)
                ys = dict(B=jnp.transpose(B_chunk, (1, 2, 0))
                          .reshape(NR * 3, n),
                          ptv=ptv.T)
            else:
                ys = dict(B=B_chunk)
                if use_pm:
                    # point-major: stack per-obs point values; reduce once
                    # after the scan through the [Np, T] table (no per-chunk
                    # one-hot against a multi-million-row point axis)
                    ys["ptv"] = ptv
                else:
                    out["pt_acc"] = carry["pt_acc"] + _segment_sum(pt, Np,
                                                                   ptv)
            if has_src:
                src = obs.src_idx[ois]
                Js = J[:, :, 6:12]
                out["src_acc"] = carry["src_acc"] + _segment_sum(
                    src, I, jnp.concatenate(
                        [jnp.einsum("oca,ocb->oab", w * Js, Js)
                         .reshape(n, 36),
                         jnp.einsum("oca,oc->oa", w * Js, r)], axis=1))
                # full per-obs camera-side block: carries every
                # img<->src<->intrinsics cross term
                ys["Aob"] = jnp.einsum("oca,ocb->oab", w * Jcam, Jcam)
            return out, ys

        carry = dict(cost=jnp.asarray(0.0, jnp.float32))
        if with_jac:
            img_d = 42 if has_src else 42 + 6 * k
            carry.update(
                img_acc=jnp.zeros((I, img_d), jnp.float32),
                cam_acc=jnp.zeros((Nc, k * k + k), jnp.float32),
            )
            if not (use_pm or use_t):
                carry["pt_acc"] = jnp.zeros((Np, 12), jnp.float32)
            if has_src:
                carry["src_acc"] = jnp.zeros((I, 42), jnp.float32)
        carry, ys = jax.lax.scan(chunk_fn, carry,
                                 dict(ois=ochunks, vm=vmask, **_scan_extra))
        if not with_jac:
            return carry
        # split the concatenated per-target accumulators back into blocks
        img_acc = carry.pop("img_acc")
        cam_acc = carry.pop("cam_acc")
        if use_t:
            ptv_t = jnp.moveaxis(ys["ptv"], 0, 1).reshape(12, pad_O)[:, :O]
            ptacc_t = pt_reduce_t(ptv_t)             # [12, Np]
            pt_acc = None
        else:
            pt_acc = (pt_segment_sum(ys["ptv"].reshape(pad_O, 12)[:O])
                      if use_pm else carry.pop("pt_acc"))
        carry["Hpp"] = img_acc[:, :36].reshape(I, 6, 6)
        carry["gp"] = img_acc[:, 36:42]
        if has_src:
            src_acc = carry.pop("src_acc")
            carry["Hpp"] = carry["Hpp"] + src_acc[:, :36].reshape(I, 6, 6)
            carry["gp"] = carry["gp"] + src_acc[:, 36:42]
        else:
            carry["Hpc"] = img_acc[:, 42:].reshape(I, 6, k)
        carry["Hcc"] = cam_acc[:, :k * k].reshape(Nc, k, k)
        carry["gc"] = cam_acc[:, k * k:]
        if use_t:
            carry["Vt"] = ptacc_t[:9].reshape(3, 3, Np)
            carry["gxt"] = ptacc_t[9:]                       # [3, Np]
            carry["Bt"] = jnp.moveaxis(ys["B"], 0, 1) \
                .reshape(NR * 3, pad_O)[:, :O]
        else:
            carry["V"] = pt_acc[:, :9].reshape(Np, 3, 3)
            carry["gx"] = pt_acc[:, 9:]
            carry["B"] = ys["B"].reshape(pad_O, NR, 3)[:O]
        if has_src:
            carry["Aob"] = ys["Aob"].reshape(pad_O, NR, NR)[:O]
        return carry

    def cost_at(state: BAState):
        return eval_chunked(state, with_jac=False)["cost"]

    # camera slot per image (for Hpc placement); each image has one camera
    obs_cam_of_img = jnp.zeros((I,), jnp.int32).at[obs.img_idx].set(
        obs.cam_idx)

    # global camera-system row index per observation row:
    # [img pose rows | (src pose rows) | intrinsics rows]
    r6 = jnp.arange(6, dtype=jnp.int32)
    rk = jnp.arange(k, dtype=jnp.int32)
    _row_parts = [obs.img_idx[:, None] * 6 + r6[None]]
    if has_src:
        _row_parts.append(obs.src_idx[:, None] * 6 + r6[None])
    _row_parts.append(6 * I + obs.cam_idx[:, None] * k + rk[None])
    obs_rows = jnp.concatenate(_row_parts, axis=1)                # [O, NR]

    def mask_system(sysd):
        """Zero out frozen parameter rows/cols in the block system."""
        pm = pose_mask6.astype(jnp.float32)
        cm = cam_mask.astype(jnp.float32)
        sysd = dict(sysd)
        sysd["Hpp"] = sysd["Hpp"] * pm[:, :, None] * pm[:, None, :]
        sysd["Hcc"] = sysd["Hcc"] * cm[:, :, None] * cm[:, None, :]
        sysd["gp"] = sysd["gp"] * pm
        sysd["gc"] = sysd["gc"] * cm
        if use_t:
            # point mask is per point (all 3 coords alike): a single [Np]
            # multiply masks both rows and columns of each 3x3 block
            xm1 = point_free.astype(jnp.float32)            # [Np]
            sysd["Vt"] = sysd["Vt"] * xm1[None, None, :]
            sysd["gxt"] = sysd["gxt"] * xm1[None, :]
            bm_t = jnp.concatenate([idx_expand_t(pm, obs.img_idx, I),
                                    idx_expand_t(cm, obs.cam_idx, Nc)],
                                   axis=0)               # [NR, O]
            sysd["Hpc"] = (sysd["Hpc"] * pm[:, :, None]
                           * cm[obs_cam_of_img][:, None, :])
            sysd["Bt"] = (sysd["Bt"] * jnp.repeat(bm_t, 3, axis=0)
                          * pt_expand_t(xm1[None, :]))
            return sysd
        xm = pt_mask.astype(jnp.float32)
        sysd["V"] = sysd["V"] * xm[:, :, None] * xm[:, None, :]
        sysd["gx"] = sysd["gx"] * xm
        # B rows: pose part masked by image, cam part by its camera
        if has_src:
            bm = jnp.concatenate([pm[obs.img_idx], pm[obs.src_idx],
                                  cm[obs.cam_idx]], axis=1)  # [O, NR]
            sysd["Aob"] = sysd["Aob"] * bm[:, :, None] * bm[:, None, :]
        else:
            bm = jnp.concatenate([pm[obs.img_idx],
                                  cm[obs.cam_idx]], axis=1)  # [O, 6+k]
            sysd["Hpc"] = (sysd["Hpc"] * pm[:, :, None]
                           * cm[obs_cam_of_img][:, None, :])
        sysd["B"] = sysd["B"] * bm[:, :, None] * xm[obs.pt_idx][:, None, :]
        return sysd

    def schur_step_t(sysd, lam):
        """Transposed-layout damped CG Schur solve (large-O regime): every
        per-observation / per-point struct lives as [d, O] / [d, Np] so the
        TPU (8,128) minor-dim padding stays ~1x instead of 10-70x."""
        Hpp, Hcc, Hpc = sysd["Hpp"], sysd["Hcc"], sysd["Hpc"]
        gp, gc = sysd["gp"], sysd["gc"]
        Vt, gxt, Bt = sysd["Vt"], sysd["gxt"], sysd["Bt"]
        ptm = point_free.astype(jnp.float32)                 # [Np]

        def damp(Hb, mask):
            D = jnp.clip(jnp.diagonal(Hb, axis1=-2, axis2=-1),
                         opts.min_diagonal, opts.max_diagonal)
            eye = jnp.eye(Hb.shape[-1], dtype=Hb.dtype)
            fill = 1.0 - mask.astype(Hb.dtype)
            return Hb + eye * (lam * D + fill)[..., None, :]

        # damped point blocks + inverse, in [3, 3, Np] planes
        Dv_t = jnp.clip(jnp.stack([Vt[0, 0], Vt[1, 1], Vt[2, 2]]),
                        opts.min_diagonal, opts.max_diagonal)   # [3, Np]
        fill_t = 1.0 - ptm
        Vd_t = Vt + jnp.eye(3)[:, :, None] * (lam * Dv_t
                                              + fill_t[None, :])[None]
        Vinv_t = _inv3x3_t(Vd_t)
        Hpp_d = damp(Hpp, pose_mask6)
        Hcc_d = damp(Hcc, cam_mask)

        def gather_rows_t(vp, vc):
            return jnp.concatenate([idx_expand_t(vp, obs.img_idx, I),
                                    idx_expand_t(vc, obs.cam_idx, Nc)],
                                   axis=0)               # [NR, O]

        def scatter_rows_t(u_t, sign=1.0):
            up = _seg_mm_t(obs.img_idx, I, sign * u_t[:6])
            uc = _seg_mm_t(obs.cam_idx, Nc, sign * u_t[6:])
            return up, uc

        def B_apply_T(rows_t):
            """W^T v: [NR, O] -> [3, O] via static row loop over Bt."""
            s = None
            for a in range(NR):
                term = rows_t[a][None, :] * Bt[3 * a:3 * a + 3]
                s = term if s is None else s + term
            return s

        def B_apply(w_t):
            """W w: [3, O] -> [NR, O]."""
            return jnp.stack([
                jnp.sum(Bt[3 * a:3 * a + 3] * w_t, axis=0)
                for a in range(NR)], axis=0)

        def vinv_apply(t_t):
            return jnp.einsum("abp,bp->ap", Vinv_t, t_t)

        # --- fused chunked Schur term (grid regime) -------------------------
        # One lax.scan over obs chunks computes expand -> W^T -> track-sum ->
        # Vinv -> broadcast -> W -> reduce per chunk with MXU einsums. The
        # unchunked path above runs the same algebra as full-[.., O] passes
        # with static NR loops on the VPU; the chunked einsum form measured
        # 7.0-7.7 ms vs 38-39 ms per matvec at 2M obs / 500k pts on v5e
        # (examples/probe_matvec3.py sweep, round 4) — the whole CG step is
        # ~25 of these. Requires grid obs ordering (chunk ci covers points
        # [ci*npc, (ci+1)*npc) exactly) so the point reduction is a reshape
        # and Vinv arrives by dynamic_slice, not gather.
        CH = int(opts.obs_chunk)
        grid_fast = (use_grid and CH % grid_T == 0
                     and not has_src and "imgc" in _scan_extra)
        use_pallas = False
        if grid_fast:
            from . import schur_pallas as _sp
            use_pallas = _sp.enabled(
                getattr(opts, "pallas_matvec", "auto"), I, Nc, grid_T)
        if use_pallas:
            # fused Pallas backend: ONE kernel pass over Bt per matvec with
            # [6, I]/[k, Nc] accumulators revisited in VMEM — measured at the
            # HBM bandwidth floor (~0.2-0.5 ms/matvec at 2M obs / 500k pts on
            # v5e vs 7-11 ms for the XLA scan below). Packing happens once
            # per Schur step; tail points are zero-padded and inert.
            _tile = _sp.pick_tile(I, Nc)
            Btr_p, img_rp, cam_rp, Vinv_p, Ppad_p = _sp.pack_grid_blocks(
                Bt, obs.img_idx, obs.cam_idx, Vinv_t, grid_T, tile=_tile)

            def schur_term_chunked(vp, vc):
                up, uc = _sp.schur_term_matvec(
                    vp.T, vc.T, Btr_p, img_rp, cam_rp, Vinv_p,
                    T=grid_T, I=I, Nc=Nc, k=k, tile=_tile)
                return up.T, uc.T

            def rhs_chunked(_gxt_pad_unused):
                gxp = jnp.concatenate(
                    [gxt, jnp.zeros((3, Ppad_p - Np), gxt.dtype)], axis=1) \
                    if Ppad_p != Np else gxt
                up, uc = _sp.schur_rhs(
                    Btr_p, img_rp, cam_rp, Vinv_p, gxp,
                    T=grid_T, I=I, Nc=Nc, k=k, tile=_tile)
                return up.T, uc.T

            def backsub_chunked(vp, vc):
                return _sp.schur_backsub(
                    vp.T, vc.T, Btr_p, img_rp, cam_rp,
                    T=grid_T, I=I, Nc=Nc, k=k, tile=_tile)
        elif grid_fast:
            npc = CH // grid_T
            n_ch = pad_O // CH
            # chunk-align the W blocks and point inverses with ZERO padding:
            # the tail chunk's wrapped img/cam indices then contribute
            # exactly nothing (b == 0 and Vinv == 0 there)
            Bt_c = Bt if pad_O == O else jnp.concatenate(
                [Bt, jnp.zeros((NR * 3, pad_O - O), Bt.dtype)], axis=1)
            Vinv_c = Vinv_t if n_ch * npc == Np else jnp.concatenate(
                [Vinv_t, jnp.zeros((3, 3, n_ch * npc - Np), Vinv_t.dtype)],
                axis=2)
            Btc = jnp.moveaxis(Bt_c.reshape(NR * 3, n_ch, CH), 1, 0)
            # materialize the chunked W blocks ONCE per Schur step: without
            # the barrier XLA fuses this 240MB transpose into every consumer
            # scan, re-reading Bt strided inside each of the ~25 CG matvecs
            Btc = jax.lax.optimization_barrier(Btc)
            imgc = _scan_extra["imgc"][:n_ch]
            camc = _scan_extra["camc"][:n_ch]
            iota_I = jnp.arange(I, dtype=jnp.int32)
            iota_C = jnp.arange(Nc, dtype=jnp.int32)
            HI = jax.lax.Precision.HIGHEST

            def schur_term_chunked(vp, vc):
                """- accumulated (W Vinv W^T) v in [6+k, I/Nc] planes."""
                vpT, vcT = vp.T, vc.T                    # [6, I], [k, Nc]

                def chunk(carry, inp):
                    ic, cc, bc, ci = inp
                    oh_i = (ic[None, :] == iota_I[:, None]).astype(jnp.bfloat16)
                    oh_c = (cc[None, :] == iota_C[:, None]).astype(jnp.bfloat16)
                    rows = jnp.concatenate([
                        _oh_dot(vpT, oh_i, a_is_onehot=False),
                        _oh_dot(vcT, oh_c, a_is_onehot=False)
                    ], axis=0)                           # [NR, CH]
                    b = bc.reshape(NR, 3, CH)
                    s = jnp.einsum("aco,ao->co", b, rows)      # [3, CH]
                    t = s.reshape(3, npc, grid_T).sum(-1)      # [3, npc]
                    vi = jax.lax.dynamic_slice(
                        Vinv_c, (0, 0, ci * npc), (3, 3, npc))
                    w = jnp.einsum("abp,bp->ap", vi, t)        # [3, npc]
                    wl = jnp.broadcast_to(
                        w[:, :, None], (3, npc, grid_T)).reshape(3, CH)
                    u = jnp.einsum("aco,co->ao", b, wl)        # [NR, CH]
                    up_a, uc_a = carry
                    up_a = up_a + _oh_dot(u[:6], oh_i.T, a_is_onehot=False)
                    uc_a = uc_a + _oh_dot(u[6:], oh_c.T, a_is_onehot=False)
                    return (up_a, uc_a), None

                (up_a, uc_a), _ = jax.lax.scan(
                    chunk,
                    (jnp.zeros((6, I), jnp.float32),
                     jnp.zeros((k, Nc), jnp.float32)),
                    (imgc, camc, Btc, jnp.arange(n_ch, dtype=jnp.int32)))
                return up_a.T, uc_a.T                     # [I, 6], [Nc, k]

            def rhs_chunked(gxt_pad):
                """(W V⁻¹ g_x) reduced to (I, Nc) planes — the einsum-chunked
                second half of the matvec (w -> u -> one-hot reduce)."""
                def chunk(carry, inp):
                    ic, cc, bc, ci = inp
                    oh_i = (ic[None, :] == iota_I[:, None]).astype(jnp.bfloat16)
                    oh_c = (cc[None, :] == iota_C[:, None]).astype(jnp.bfloat16)
                    b = bc.reshape(NR, 3, CH)
                    vi = jax.lax.dynamic_slice(
                        Vinv_c, (0, 0, ci * npc), (3, 3, npc))
                    gx_c = jax.lax.dynamic_slice(
                        gxt_pad, (0, ci * npc), (3, npc))
                    w = jnp.einsum("abp,bp->ap", vi, gx_c)
                    wl = jnp.broadcast_to(
                        w[:, :, None], (3, npc, grid_T)).reshape(3, CH)
                    u = jnp.einsum("aco,co->ao", b, wl)
                    up_a, uc_a = carry
                    up_a = up_a + _oh_dot(u[:6], oh_i.T, a_is_onehot=False)
                    uc_a = uc_a + _oh_dot(u[6:], oh_c.T, a_is_onehot=False)
                    return (up_a, uc_a), None

                (up_a, uc_a), _ = jax.lax.scan(
                    chunk,
                    (jnp.zeros((6, I), jnp.float32),
                     jnp.zeros((k, Nc), jnp.float32)),
                    (imgc, camc, Btc, jnp.arange(n_ch, dtype=jnp.int32)))
                return up_a.T, uc_a.T

            def backsub_chunked(vp, vc):
                """(Wᵀ gathered-rows) reduced per point: [3, n_ch*npc] —
                the einsum-chunked first half of the matvec."""
                vpT, vcT = vp.T, vc.T

                def chunk(carry, inp):
                    ic, cc, bc, ci = inp
                    oh_i = (ic[None, :] == iota_I[:, None]).astype(jnp.bfloat16)
                    oh_c = (cc[None, :] == iota_C[:, None]).astype(jnp.bfloat16)
                    rows = jnp.concatenate([
                        _oh_dot(vpT, oh_i, a_is_onehot=False),
                        _oh_dot(vcT, oh_c, a_is_onehot=False)
                    ], axis=0)
                    b = bc.reshape(NR, 3, CH)
                    s = jnp.einsum("aco,ao->co", b, rows)
                    return carry, s.reshape(3, npc, grid_T).sum(-1)

                _, ts = jax.lax.scan(
                    chunk, 0.0,
                    (imgc, camc, Btc, jnp.arange(n_ch, dtype=jnp.int32)))
                return jnp.moveaxis(ts, 0, 1).reshape(3, n_ch * npc)

        def s_matvec(v):
            vp, vc = v
            avp = jnp.einsum("iab,ib->ia", Hpp_d, vp) \
                + jnp.einsum("iak,ik->ia", Hpc, vc[obs_cam_of_img])
            avc = jnp.einsum("cab,cb->ca", Hcc_d, vc)
            avc = avc + _segment_sum(obs_cam_of_img, Nc,
                                     jnp.einsum("iak,ia->ik", Hpc, vp))
            if grid_fast:
                up, uc = schur_term_chunked(vp, vc)
            else:
                rows_t = gather_rows_t(vp, vc)
                t_p = pt_reduce_t(B_apply_T(rows_t))         # [3, Np]
                w_o = pt_expand_t(vinv_apply(t_p))           # [3, O]
                up, uc = scatter_rows_t(B_apply(w_o))
            return (avp - up, avc - uc)

        # plain block-Jacobi preconditioner. A SCHUR_JACOBI variant
        # (damped block diag of S via one extra chunked pass) was measured
        # SLOWER end-to-end at the 2M-obs bench shape (391 vs 289 ms/iter,
        # round 4): the diag pass costs ~1 matvec per LM iteration and the
        # 25-iteration CG budget was exhausted either way.
        Minv_p = jnp.linalg.inv(Hpp_d)
        Minv_c = jnp.linalg.inv(Hcc_d)

        def precond(v):
            vp, vc = v
            return (jnp.einsum("iab,ib->ia", Minv_p, vp),
                    jnp.einsum("cab,cb->ca", Minv_c, vc))

        # rhs = g_cam - W Vinv g_p
        if use_pallas:
            cp, cc = rhs_chunked(None)
        elif grid_fast:
            gxt_pad = gxt if n_ch * npc == Np else jnp.concatenate(
                [gxt, jnp.zeros((3, n_ch * npc - Np), gxt.dtype)], axis=1)
            cp, cc = rhs_chunked(gxt_pad)
        else:
            y_t = pt_expand_t(vinv_apply(gxt))               # [3, O]
            cp, cc = scatter_rows_t(B_apply(y_t))
        rp, rc = gp - cp, gc - cc

        from jax.scipy.sparse.linalg import cg as _cg
        (dp_neg, dc_neg), _ = _cg(
            s_matvec, (rp, rc), M=precond,
            maxiter=opts.max_linear_solver_iterations,
            tol=opts.linear_solver_tol)
        d_pose = -dp_neg * pose_mask6.astype(jnp.float32)
        d_cam = -dc_neg * cam_mask.astype(jnp.float32)

        if grid_fast:
            t_t = backsub_chunked(d_pose, d_cam)[:, :Np]
        else:
            t_t = pt_reduce_t(B_apply_T(gather_rows_t(d_pose, d_cam)))
        d_xyz_t = -vinv_apply(gxt + t_t) * ptm[None, :]
        d_xyz = d_xyz_t.T                                    # [Np, 3]

        g_all = jnp.concatenate([gp.reshape(-1), gc.reshape(-1),
                                 gxt.T.reshape(-1)])
        d_all = jnp.concatenate([d_pose.reshape(-1), d_cam.reshape(-1),
                                 d_xyz.reshape(-1)])
        Dv_all = jnp.concatenate([
            jnp.clip(jnp.diagonal(Hpp, axis1=1, axis2=2),
                     opts.min_diagonal, opts.max_diagonal).reshape(-1),
            jnp.clip(jnp.diagonal(Hcc, axis1=1, axis2=2),
                     opts.min_diagonal, opts.max_diagonal).reshape(-1),
            Dv_t.T.reshape(-1)])
        pred = 0.5 * jnp.sum(d_all * (lam * Dv_all * d_all - g_all))
        return d_pose, d_cam, d_xyz, pred

    def schur_step(sysd, lam):
        """One damped Schur solve → (d_pose [I,6], d_cam [Nc,k], d_xyz [Np,3],
        predicted_reduction)."""
        if use_t:
            return schur_step_t(sysd, lam)
        Hpp, Hcc = sysd["Hpp"], sysd["Hcc"]
        Hpc = sysd.get("Hpc")
        V, gp, gc, gx, B = sysd["V"], sysd["gp"], sysd["gc"], sysd["gx"], \
            sysd["B"]

        def damp(Hb, mask):
            D = jnp.clip(jnp.diagonal(Hb, axis1=-2, axis2=-1),
                         opts.min_diagonal, opts.max_diagonal)
            eye = jnp.eye(Hb.shape[-1], dtype=Hb.dtype)
            fill = 1.0 - mask.astype(Hb.dtype)
            return Hb + eye * (lam * D + fill)[..., None, :]

        Vd = damp(V, pt_mask)
        Vinv = _inv3x3(Vd)

        if opts.linear_solver == "cg":
            # --- matrix-free ITERATIVE_SCHUR: PCG on S without materializing
            # it; the Schur term applies through per-observation W blocks.
            Hpp_d = damp(Hpp, pose_mask6)
            Hcc_d = damp(Hcc, cam_mask)

            def gather_rows(vp, vc):
                """Per-obs camera-side vector rows [O, NR]."""
                if has_src:
                    return jnp.concatenate([vp[obs.img_idx],
                                            vp[obs.src_idx],
                                            vc[obs.cam_idx]], axis=1)
                return jnp.concatenate([vp[obs.img_idx],
                                        vc[obs.cam_idx]], axis=1)

            def scatter_rows(u_o, sign=1.0):
                """Reduce per-obs camera-side rows back to (vp, vc)."""
                up = img_segment_sum(sign * u_o[:, :6])
                if has_src:
                    up = up + _segment_sum(obs.src_idx, I,
                                           sign * u_o[:, 6:12])
                uc = _segment_sum(obs.cam_idx, Nc, sign * u_o[:, PB:])
                return up, uc

            if has_src:
                Aob = sysd["Aob"]
                # damping (+frozen-row fill) applied directly to the
                # diagonal: Aob already contains the undamped diagonal blocks
                Dp = jnp.clip(jnp.diagonal(Hpp, axis1=-2, axis2=-1),
                              opts.min_diagonal, opts.max_diagonal)
                Dc = jnp.clip(jnp.diagonal(Hcc, axis1=-2, axis2=-1),
                              opts.min_diagonal, opts.max_diagonal)
                fill_p = 1.0 - pose_mask6.astype(jnp.float32)
                fill_c = 1.0 - cam_mask.astype(jnp.float32)

            def s_matvec(v):
                vp, vc = v                        # [I,6], [Nc,k]
                if has_src:
                    # A v through per-obs full blocks + diagonal damping
                    av_o = jnp.einsum("oab,ob->oa", Aob, gather_rows(vp, vc))
                    avp, avc = scatter_rows(av_o)
                    avp = avp + (lam * Dp + fill_p) * vp
                    avc = avc + (lam * Dc + fill_c) * vc
                else:
                    avp = jnp.einsum("iab,ib->ia", Hpp_d, vp) \
                        + jnp.einsum("iak,ik->ia", Hpc, vc[obs_cam_of_img])
                    avc = jnp.einsum("cab,cb->ca", Hcc_d, vc)
                    avc = avc + _segment_sum(
                        obs_cam_of_img, Nc,
                        jnp.einsum("iak,ia->ik", Hpc, vp))
                # W^T v per obs -> per point
                s_o = jnp.einsum("oa,oab->ob", gather_rows(vp, vc),
                                 B)               # [O, 3]
                t_p = pt_segment_sum(s_o)
                w_p = jnp.einsum("pab,pb->pa", Vinv, t_p)
                u_o = jnp.einsum("oab,ob->oa", B, w_p[obs.pt_idx])  # [O,NR]
                up, uc = scatter_rows(u_o)
                return (avp - up, avc - uc)

            # block-Jacobi preconditioner from the damped diagonal blocks
            Minv_p = jnp.linalg.inv(Hpp_d)
            Minv_c = jnp.linalg.inv(Hcc_d)

            def precond(v):
                vp, vc = v
                return (jnp.einsum("iab,ib->ia", Minv_p, vp),
                        jnp.einsum("cab,cb->ca", Minv_c, vc))

            # rhs = g_cam - W Vinv g_p
            corr = jnp.einsum("oab,ob->oa",
                              jnp.einsum("oab,obc->oac", B,
                                         Vinv[obs.pt_idx]), gx[obs.pt_idx])
            cp, cc = scatter_rows(corr)
            rp, rc = gp - cp, gc - cc

            from jax.scipy.sparse.linalg import cg as _cg
            (dp_neg, dc_neg), _ = _cg(
                s_matvec, (rp, rc), M=precond,
                maxiter=opts.max_linear_solver_iterations,
                tol=opts.linear_solver_tol)
            d_pose = -dp_neg * pose_mask6.astype(jnp.float32)
            d_cam = -dc_neg * cam_mask.astype(jnp.float32)

            t = pt_segment_sum(
                jnp.einsum("oab,oa->ob", B, gather_rows(d_pose, d_cam)))
            d_xyz = -jnp.einsum("pab,pb->pa", Vinv, gx + t) * pt_mask

            g_all = jnp.concatenate([gp.reshape(-1), gc.reshape(-1),
                                     gx.reshape(-1)])
            d_all = jnp.concatenate([d_pose.reshape(-1), d_cam.reshape(-1),
                                     d_xyz.reshape(-1)])
            Dv = jnp.concatenate([
                jnp.clip(jnp.diagonal(Hpp, axis1=1, axis2=2),
                         opts.min_diagonal, opts.max_diagonal).reshape(-1),
                jnp.clip(jnp.diagonal(Hcc, axis1=1, axis2=2),
                         opts.min_diagonal, opts.max_diagonal).reshape(-1),
                jnp.clip(jnp.diagonal(V, axis1=1, axis2=2),
                         opts.min_diagonal, opts.max_diagonal).reshape(-1)])
            pred = 0.5 * jnp.sum(d_all * (lam * Dv * d_all - g_all))
            return d_pose, d_cam, d_xyz, pred

        # assemble dense A [M, M] via block placements
        A = jnp.zeros((M, M), jnp.float32)
        if has_src:
            # every camera-side term (img/src pose + intrinsics, including
            # all cross blocks) lives in the per-obs full blocks
            A = A.at[obs_rows[:, :, None], obs_rows[:, None, :]].add(
                sysd["Aob"])

        def place_pose(A):
            def body(i, A):
                A = jax.lax.dynamic_update_slice(
                    A, jax.lax.dynamic_slice(A, (i * 6, i * 6), (6, 6))
                    + Hpp[i], (i * 6, i * 6))
                c = obs_cam_of_img[i]
                r0 = 6 * I + c * k
                blk = jax.lax.dynamic_slice(A, (i * 6, r0), (6, k)) + Hpc[i]
                A = jax.lax.dynamic_update_slice(A, blk, (i * 6, r0))
                blk2 = jax.lax.dynamic_slice(A, (r0, i * 6), (k, 6)) \
                    + Hpc[i].T
                A = jax.lax.dynamic_update_slice(A, blk2, (r0, i * 6))
                return A
            return jax.lax.fori_loop(0, I, body, A)

        def place_cams(A):
            def body(c, A):
                r0 = 6 * I + c * k
                blk = jax.lax.dynamic_slice(A, (r0, r0), (k, k)) + Hcc[c]
                return jax.lax.dynamic_update_slice(A, blk, (r0, r0))
            return jax.lax.fori_loop(0, Nc, body, A)

        if not has_src:
            A = place_cams(place_pose(A))
        # damping on the camera-side diagonal
        diagA = jnp.clip(jnp.diag(A), opts.min_diagonal, opts.max_diagonal)
        free_rows = jnp.concatenate([pose_mask6.reshape(-1),
                                     cam_mask.reshape(-1)]).astype(jnp.float32)
        A = A + jnp.diag(lam * diagA + (1.0 - free_rows))

        g_cam_full = jnp.concatenate([gp.reshape(-1), gc.reshape(-1)])

        # Schur reduction over track pairs, chunked so only [pair_chunk,
        # NR, NR] pair blocks materialize per lax.scan step:
        # S -= B[o1] @ Vinv[pt] @ B[o2]^T placed at (rows(o1), rows(o2))
        Q = int(obs.pair_o1.shape[0])
        pc = min(opts.pair_chunk, max(Q, 1))
        padQ = int(np.ceil(Q / pc)) * pc
        # pad by repeating pair 0; padded entries are masked to zero
        p1p = jnp.concatenate(
            [obs.pair_o1, jnp.broadcast_to(obs.pair_o1[:1], (padQ - Q,))])
        p2p = jnp.concatenate(
            [obs.pair_o2, jnp.broadcast_to(obs.pair_o2[:1], (padQ - Q,))])
        qm = (jnp.arange(padQ) < Q).astype(jnp.float32)

        def pair_body(Ssub, inp):
            p1c, p2c, mc = inp
            T1 = jnp.einsum("qab,qbc->qac", B[p1c], Vinv[obs.pt_idx[p1c]])
            Cp = jnp.einsum("qac,qdc->qad", T1, B[p2c]) * mc[:, None, None]
            return Ssub.at[obs_rows[p1c][:, :, None],
                           obs_rows[p2c][:, None, :]].add(Cp), None

        Ssub, _ = jax.lax.scan(
            pair_body, jnp.zeros((M, M), jnp.float32),
            (p1p.reshape(-1, pc), p2p.reshape(-1, pc), qm.reshape(-1, pc)))
        S = A - Ssub

        # rhs: g_cam - sum_obs B_o Vinv_p g_p
        corr = jnp.einsum("oab,ob->oa",
                          jnp.einsum("oab,obc->oac", B,
                                     Vinv[obs.pt_idx]), gx[obs.pt_idx])
        rhs = g_cam_full - _segment_sum(obs_rows.reshape(-1), M,
                                        corr.reshape(-1))

        # Jacobi-scaled solve: BA camera systems are badly conditioned at pixel
        # scale; symmetric diagonal scaling keeps the f32 Cholesky accurate.
        ds = 1.0 / jnp.sqrt(jnp.clip(jnp.abs(jnp.diag(S)), 1e-12, None))
        Ss = S * ds[:, None] * ds[None, :]
        L = jax.lax.linalg.cholesky(Ss)
        y = jax.lax.linalg.triangular_solve(L, (ds * rhs)[:, None],
                                            left_side=True, lower=True)
        sol = jax.lax.linalg.triangular_solve(L, y, left_side=True,
                                              lower=True,
                                              transpose_a=True)[:, 0]
        dc_full = -ds * sol
        dc_full = dc_full * free_rows
        d_pose = dc_full[:6 * I].reshape(I, 6)
        d_cam = dc_full[6 * I:].reshape(Nc, k)

        # back-substitute points: dx = -Vinv (gx + sum_obs B^T dcam_of_obs)
        dcam_obs = dc_full[obs_rows]                             # [O, NR]
        t = pt_segment_sum(jnp.einsum("oab,oa->ob", B, dcam_obs))
        d_xyz = -jnp.einsum("pab,pb->pa", Vinv, gx + t)
        d_xyz = d_xyz * pt_mask

        # predicted model reduction 0.5*d^T(lam D d - g) over all params
        g_all = jnp.concatenate([g_cam_full, gx.reshape(-1)])
        d_all = jnp.concatenate([dc_full, d_xyz.reshape(-1)])
        Dv = jnp.concatenate([
            diagA, jnp.clip(jnp.diagonal(V, axis1=1, axis2=2),
                            opts.min_diagonal,
                            opts.max_diagonal).reshape(-1)])
        pred = 0.5 * jnp.sum(d_all * (lam * Dv * d_all - g_all))
        return d_pose, d_cam, d_xyz, pred

    def inner_point_iterations(state: BAState, lam):
        """Point-only refinement with cameras fixed (use_inner_iterations)."""
        def one(_, carry):
            st, cur_cost = carry
            sysd = mask_system(eval_chunked(st, with_jac=True))
            D = jnp.clip(jnp.diagonal(sysd["V"], axis1=1, axis2=2),
                         opts.min_diagonal, opts.max_diagonal)
            fill = 1.0 - pt_mask.astype(jnp.float32)
            Vd = sysd["V"] + jnp.eye(3) * (lam * D + fill)[:, None, :]
            dx = -jnp.einsum("pab,pb->pa", _inv3x3(Vd), sysd["gx"])
            dx = dx * pt_mask
            cand = BAState(st.qvec, st.tvec, st.cams, st.xyz + dx)
            cand_cost = cost_at(cand)
            better = cand_cost < cur_cost
            xyz = jnp.where(better, cand.xyz, st.xyz)
            return (BAState(st.qvec, st.tvec, st.cams, xyz),
                    jnp.where(better, cand_cost, cur_cost))
        st, c = jax.lax.fori_loop(0, opts.inner_iteration_count, one,
                                  (state, cost_at(state)))
        return st, c

    # ------------------------------------------------------------------ loop
    # Without inner iterations the normal equations are carried across
    # iterations (ONE jacobian eval per iteration: the candidate is evaluated
    # with full normal equations which become the next carry on acceptance).
    # Inner point iterations mutate xyz after acceptance, so there the system
    # is re-evaluated at the top of each iteration instead.
    if _STAGE_EXPORT is not None:
        _STAGE_EXPORT.update(
            eval_chunked=eval_chunked, cost_at=cost_at,
            mask_system=mask_system, schur_step=schur_step, state0=state0)

    carry_sys = not opts.use_inner_iterations
    if carry_sys:
        sys0 = mask_system(eval_chunked(state0, with_jac=True))
        cost0 = sys0["cost"]
    else:
        sys0 = {}
        cost0 = cost_at(state0)

    iter_cap = opts.max_iterations if max_iters is None else max_iters

    def cond(ls: _LMState):
        return (ls.it < iter_cap) & ~ls.done

    def body(ls: _LMState):
        if carry_sys:
            sysd = ls.sysd
        else:
            sysd = mask_system(eval_chunked(ls.state, with_jac=True))
        d_pose, d_cam, d_xyz, pred = schur_step(sysd, ls.lam)
        cand = _apply_tangent(ls.state, d_pose, d_cam, d_xyz)
        if carry_sys:
            sys_new = mask_system(eval_chunked(cand, with_jac=True))
            new_cost = sys_new["cost"]
        else:
            new_cost = cost_at(cand)
        actual = ls.cost - new_cost
        rho = actual / jnp.maximum(pred, 1e-30)
        if opts.use_nonmonotonic_steps:
            # GLL acceptance: beat the max cost over the recent window
            accept = (new_cost < jnp.max(ls.cost_window)) & (pred > 0)
        else:
            accept = (actual > 0) & (pred > 0)

        lam_acc = ls.lam * jnp.maximum(1.0 / 3.0, 1.0 - (2 * rho - 1.0) ** 3)
        lam = jnp.clip(jnp.where(accept, lam_acc, ls.lam * ls.nu),
                       opts.min_lambda, opts.max_lambda)
        nu = jnp.where(accept, 2.0, ls.nu * 2.0)

        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), ls.state, cand)
        if opts.use_inner_iterations:
            state, inner_cost = jax.lax.cond(
                accept, lambda s: inner_point_iterations(s, lam),
                lambda s: (s, ls.cost), state)
            cost_after = jnp.where(accept, inner_cost, ls.cost)
            sysd_out = ls.sysd
        else:
            cost_after = jnp.where(accept, new_cost, ls.cost)
            sysd_out = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, b, a), sysd, sys_new)

        step = jnp.concatenate([d_pose.reshape(-1), d_cam.reshape(-1),
                                d_xyz.reshape(-1)])
        xn = jnp.sqrt(jnp.sum(ls.state.tvec ** 2) + jnp.sum(ls.state.cams ** 2)
                      + jnp.sum(ls.state.xyz ** 2) + 1.0)
        ptol = opts.parameter_tolerance
        conv_x = accept & (jnp.linalg.norm(step) <= ptol * (xn + ptol)) \
            if ptol > 0 else jnp.asarray(False)
        conv_f = accept & (jnp.abs(actual) <= opts.function_tolerance
                           * jnp.maximum(ls.cost, 1e-30)) \
            if opts.function_tolerance > 0 else jnp.asarray(False)
        stuck = lam >= opts.max_lambda
        done = conv_x | conv_f | stuck

        window = jnp.where(
            accept,
            jnp.concatenate([ls.cost_window[1:], cost_after[None]]),
            ls.cost_window)
        improve = accept & (cost_after < ls.best_cost)
        best_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(improve, b, a), ls.best_state, state)
        best_cost = jnp.where(improve, cost_after, ls.best_cost)
        if opts.progress:
            def _report(it, cost, cand_cost, lam_v, acc):
                print(f"  LM iter {int(it):4d}: cost {float(cost):.6g} "
                      f"(candidate {float(cand_cost):.6g}, "
                      f"lambda {float(lam_v):.2e}, "
                      f"{'accepted' if bool(acc) else 'rejected'})",
                      flush=True)
            jax.debug.callback(_report, ls.it, cost_after, new_cost, ls.lam,
                               accept, ordered=False)
        return _LMState(state, sysd_out, lam, nu, cost_after, done, ls.it + 1,
                        ls.iters_used + 1, window, best_state, best_cost)

    W = max(int(opts.nonmonotonic_window), 1)
    lam_init = (jnp.asarray(opts.initial_lambda, jnp.float32)
                if lam0 is None else jnp.asarray(lam0, jnp.float32))
    init = _LMState(state0, sys0, lam_init,
                    jnp.asarray(2.0, jnp.float32), cost0,
                    jnp.asarray(False), jnp.asarray(0, jnp.int32),
                    jnp.asarray(0, jnp.int32),
                    jnp.full((W,), cost0, jnp.float32), state0, cost0)
    final = jax.lax.while_loop(cond, body, init)
    # with non-monotonic acceptance the final iterate may be worse than the
    # best one seen; return the best (Ceres returns the lowest-cost state)
    better = final.best_cost < final.cost
    out_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(better, b, a), final.state, final.best_state)
    summary = dict(initial_cost=cost0,
                   final_cost=jnp.minimum(final.cost, final.best_cost),
                   iterations=final.iters_used,
                   lam=final.lam, done=final.done)
    return out_state, summary
