"""Featuremetric keypoint adjustment as one batched LM program.

The reference fans independent Ceres problems (one per FFD bin of tracks) across a
thread pool (pixsfm/keypoint_adjustment/src/featuremetric_keypoint_optimizer.h:22-156 +
base/src/parallel_optimizer.h). The TPU-native design solves *all* bins lock-stepped:

- parameters: ``kp [P, K, 2]`` image-coordinate keypoints, padded per problem;
- residuals: per intra-track match edge ``r_e = f_i(kp_i) - f_j(kp_j)`` with ``f`` the
  L2-normalized bicubic interpolation of each keypoint's feature patch
  (residuals/src/featuremetric.h:24-69);
- robustification: IRLS weights ``sim_e * rho'(||r||^2)`` (ScaledLoss-by-similarity,
  featuremetric_keypoint_optimizer.h:190-195);
- normal equations assembled **gather-free** with one-hot edge incidence matrices:
  ``H += S_i^T (w J_i^T J_i) S_i - S_i^T (w J_i^T J_j) S_j + ...`` — all einsums on
  the MXU;
- bounds: patch extent intersected with ``kp0 +- bound/scale``
  (keypoint_optimizer.h:110-157), enforced by step projection inside
  :func:`pixsfm_tpu.ops.lm.lm_solve`.

Root keypoints are frozen (SetMaskedNodesConstant, keypoint_adjustment_options.cc:5-45).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..base.interpolation import InterpolationConfig, interpolate_with_grad
from ..base.losses import RobustLoss
from ..ops.lm import LMOptions, lm_solve

__all__ = ["KAProblems", "build_ka_problems", "solve_ka_problems"]


def _interp_key(interp: InterpolationConfig):
    return (interp.mode, interp.l2_normalize, interp.ncc_normalize,
            tuple(tuple(n) for n in interp.nodes))



@dataclass
class KAProblems:
    """Padded, batched KA subproblems (host arrays; shipped to device per chunk)."""
    kp0: np.ndarray          # [P, K, 2] image coords
    patch_row: np.ndarray    # [P, K] row into packed patches
    corner: np.ndarray       # [P, K, 2]
    scale: np.ndarray        # [P, K, 2]
    ups: np.ndarray          # [P, K]
    kp_free: np.ndarray      # [P, K] bool
    kp_valid: np.ndarray     # [P, K] bool
    edge_i: np.ndarray       # [P, E] local kp index
    edge_j: np.ndarray       # [P, E]
    edge_w: np.ndarray       # [P, E] similarity weight (0 for padding)
    lower: np.ndarray        # [P, K, 2]
    upper: np.ndarray        # [P, K, 2]
    # write-back bookkeeping: node -> (problem, slot)
    node_problem: np.ndarray
    node_slot: np.ndarray
    node_ids: np.ndarray     # original graph node indices


def build_ka_problems(keypoints: Dict[str, np.ndarray], graph,
                      problem_labels: np.ndarray, root_labels: np.ndarray,
                      packed, bound: float,
                      edges: Optional[Tuple[np.ndarray, np.ndarray,
                                            np.ndarray]] = None,
                      constant_nodes: Optional[np.ndarray] = None,
                      weight_by_sim: bool = True,
                      root_edges_only: bool = False) -> KAProblems:
    """Pack graph subproblems into padded arrays.

    problem_labels: per-node problem id (-1 = skip). packed: PackedFeatures for the
    participating (image, keypoint) pairs. ``edges`` overrides the graph's edge list
    (used by the topological_reference strategy to pass star edges toward roots).
    """
    image_ids, feature_idxs = graph.nodes_array()
    src, dst, sim = edges if edges is not None else graph.edges_array()
    labels = np.asarray(problem_labels)

    active = labels >= 0
    node_ids = np.nonzero(active)[0]
    n_problems = int(labels.max()) + 1 if len(node_ids) else 0

    # local slot per node within its problem
    order = np.argsort(labels[node_ids], kind="stable")
    sorted_nodes = node_ids[order]
    sorted_probs = labels[sorted_nodes]
    slot = np.zeros(len(sorted_nodes), dtype=np.int64)
    if len(sorted_nodes):
        new_prob = np.r_[True, sorted_probs[1:] != sorted_probs[:-1]]
        starts = np.nonzero(new_prob)[0]
        slot = np.arange(len(sorted_nodes))
        slot -= np.repeat(starts, np.diff(np.r_[starts, len(sorted_nodes)]))
    node_problem = np.full(graph.num_nodes, -1, dtype=np.int64)
    node_slot = np.full(graph.num_nodes, -1, dtype=np.int64)
    node_problem[sorted_nodes] = sorted_probs
    node_slot[sorted_nodes] = slot

    K = int(slot.max()) + 1 if len(sorted_nodes) else 1

    # intra-track edges with both ends in the same (active) problem
    keep = (active[src] & active[dst] & (labels[src] == labels[dst])
            & (src != dst))
    if root_edges_only:
        keep &= (root_labels[src] | root_labels[dst])
    e_src, e_dst, e_sim = src[keep], dst[keep], sim[keep]
    e_prob = labels[e_src]

    # per-problem edge slots
    eorder = np.argsort(e_prob, kind="stable")
    e_src, e_dst, e_sim, e_prob = (e_src[eorder], e_dst[eorder],
                                   e_sim[eorder], e_prob[eorder])
    eslot = np.arange(len(e_prob))
    if len(e_prob):
        enew = np.r_[True, e_prob[1:] != e_prob[:-1]]
        estarts = np.nonzero(enew)[0]
        eslot -= np.repeat(estarts, np.diff(np.r_[estarts, len(e_prob)]))
    E = int(eslot.max()) + 1 if len(e_prob) else 1

    def pad8(x):
        return max(int(np.ceil(x / 8)) * 8, 8)

    K, E = pad8(K), pad8(E)

    P = max(n_problems, 1)
    kp0 = np.zeros((P, K, 2), np.float32)
    patch_row = np.zeros((P, K), np.int32)
    corner = np.zeros((P, K, 2), np.float32)
    scale = np.ones((P, K, 2), np.float32)
    ups = np.ones((P, K), np.float32)
    kp_free = np.zeros((P, K), bool)
    kp_valid = np.zeros((P, K), bool)
    lower = np.full((P, K, 2), -np.inf, np.float32)
    upper = np.full((P, K, 2), np.inf, np.float32)

    const = (np.zeros(graph.num_nodes, bool) if constant_nodes is None
             else np.asarray(constant_nodes, bool))

    # patch extent per keypoint axis (x, y) -> (W, H): dense maps aren't square
    ext = (np.array([packed.patches.shape[2], packed.patches.shape[1]],
                    np.float64) if packed.num_patches else np.zeros(2))
    if len(sorted_nodes):
        # vectorized packing: per-image numpy gathers instead of a Python
        # loop per node (the loop dominated host time at Aachen-scale scenes)
        p_arr = node_problem[sorted_nodes]
        k_arr = node_slot[sorted_nodes]
        img_arr = image_ids[sorted_nodes]
        fid_arr = np.asarray(feature_idxs)[sorted_nodes]
        rows_all = np.empty(len(sorted_nodes), np.int64)
        kp_all = np.empty((len(sorted_nodes), 2), np.float64)
        for iid in np.unique(img_arr):
            m = img_arr == iid
            name = graph.image_id_to_name[int(iid)]
            fi = fid_arr[m]
            kp_all[m] = np.asarray(keypoints[name])[fi]
            rows_all[m] = packed.rows_for_image(name, fi)
        kp0[p_arr, k_arr] = kp_all
        patch_row[p_arr, k_arr] = rows_all
        corner[p_arr, k_arr] = packed.corners[rows_all]
        scale[p_arr, k_arr] = packed.scales[rows_all]
        ups[p_arr, k_arr] = packed.upsampling[rows_all]
        kp_valid[p_arr, k_arr] = True
        kp_free[p_arr, k_arr] = ~(
            np.asarray(root_labels, bool)[sorted_nodes]
            | const[sorted_nodes])
        # bounds: patch extent (in image coords) intersect kp +- bound/scale
        sc = packed.scales[rows_all]
        lo = (packed.corners[rows_all] + 0.5) / sc
        hi = lo + ext / sc
        if bound > 0:
            lo = np.maximum(lo, kp_all - bound / sc)
            hi = np.minimum(hi, kp_all + bound / sc)
        lower[p_arr, k_arr] = lo
        upper[p_arr, k_arr] = hi

    edge_i = np.zeros((P, E), np.int32)
    edge_j = np.zeros((P, E), np.int32)
    edge_w = np.zeros((P, E), np.float32)
    edge_i[e_prob, eslot] = node_slot[e_src]
    edge_j[e_prob, eslot] = node_slot[e_dst]
    edge_w[e_prob, eslot] = e_sim if weight_by_sim else 1.0

    return KAProblems(kp0, patch_row, corner, scale, ups, kp_free, kp_valid,
                      edge_i, edge_j, edge_w, lower, upper,
                      node_problem, node_slot, node_ids)


# ---------------------------------------------------------------------------
# device-side system assembly
# ---------------------------------------------------------------------------

def _eval_keypoints(patches, kp, corner, scale, ups, interp: InterpolationConfig,
                    rows_spec=None):
    """Batched per-keypoint interpolation: returns f, dfdx, dfdy [P, K, C]
    (derivatives w.r.t. image coordinates).

    ``rows_spec = (rows, H, W, C, patch_row)`` routes the bicubic window eval
    against a pre-materialized flat row view of the PACKED patch array
    (``rows = packed.reshape(-1, W, C)``, hoisted out of the solver loop);
    ``patches`` is ignored then and no per-problem patch gather happens.
    H/W are carried separately — dense featuremaps are not square."""
    uv = (kp * scale - 0.5 - corner) * ups[..., None]
    r = uv[..., 1]
    c = uv[..., 0]

    # n_nodes > 1 configs (the reference's EvaluateNodes residual,
    # residuals/src/featuremetric.h:54-55) take the generic branch below:
    # interpolate_with_grad is node-aware and returns the flattened
    # [n_nodes*C] window per keypoint — the well-posed form for low-channel
    # features (a single-point RGB/grayscale residual is an aperture
    # problem). _compiled_ka_chunk routes them here by gating its
    # window/pallas fast paths on n_nodes == 1.
    if rows_spec is not None:
        from ..base.interpolation import (bicubic_window_eval_rows,
                                          l2_normalize_with_grad)
        rows, H, W, C, patch_row = rows_spec
        P, K = r.shape
        row_base = patch_row.reshape(-1).astype(jnp.int32) * H
        f, dfdr, dfdc = bicubic_window_eval_rows(
            rows, H, W, C, row_base, r.reshape(-1), c.reshape(-1))
        if interp.l2_normalize:
            f, (dfdr, dfdc) = l2_normalize_with_grad(f, (dfdr, dfdc))
        f = f.reshape(P, K, C)
        dfdr = dfdr.reshape(P, K, C)
        dfdc = dfdc.reshape(P, K, C)
    elif (interp.mode in ("BICUBIC", "CERES_BICUBIC")
          and not interp.ncc_normalize):
        # hot path: 4x4-window gather (16x less HBM than the dense one-hot
        # contraction at ps=16)
        from ..base.interpolation import (bicubic_window_eval,
                                          l2_normalize_with_grad)
        P, K = r.shape
        f, dfdr, dfdc = bicubic_window_eval(
            patches.reshape((P * K,) + patches.shape[2:]),
            r.reshape(-1), c.reshape(-1))
        if interp.l2_normalize:
            f, (dfdr, dfdc) = l2_normalize_with_grad(f, (dfdr, dfdc))
        C = f.shape[-1]
        f = f.reshape(P, K, C)
        dfdr = dfdr.reshape(P, K, C)
        dfdc = dfdc.reshape(P, K, C)
    else:
        def one(patch, rr, cc):
            return interpolate_with_grad(patch, rr, cc, interp)

        f, dfdr, dfdc = jax.vmap(jax.vmap(one))(patches, r, c)
    su = scale * ups[..., None]
    dfdx = dfdc * su[..., 0:1]
    dfdy = dfdr * su[..., 1:2]
    return f, dfdx, dfdy


def make_ka_system(all_patches, interp: InterpolationConfig, loss: RobustLoss,
                   K: int, use_pallas: bool = False, pregathered: bool = False,
                   rows_spec=None, kp_free_mask=None):
    """Return (system_fn, cost_fn) factories closing over static config.

    The returned functions take the padded problem arrays explicitly so a single
    jitted instance serves every chunk of equal shape. ``use_pallas`` routes the
    interpolation through the fused gather-interpolate kernel (no [P,K,ps,ps,C]
    gather materialization in HBM). ``pregathered`` means ``all_patches`` is
    already the per-problem [P,K,ps,ps,C] tensor — the HBM gather was hoisted
    out of the LM while_loop (it is loop-invariant: the same patches serve
    every iteration's system/cost evaluation). ``rows_spec = (rows, H, W, C)``
    is the fastest path: interpolate straight from the flat row view of the
    PACKED array (no per-problem gather at all; the window gather indexes
    ``patch_row * ps`` rows).
    """

    def _delta_edges(edge_i, edge_j):
        """Signed edge incidence Delta = Si - Sj, [P, E, K] — TPU gathers are
        slow; every edge-indexed read below is a batched matmul on the MXU."""
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
        return ((edge_i[..., None] == iota).astype(jnp.float32)
                - (edge_j[..., None] == iota).astype(jnp.float32))

    def _common(x, data):
        (patch_row, corner, scale, ups, edge_i, edge_j, edge_w) = data
        P = x.shape[0]
        kp = x.reshape(P, K, 2)
        if rows_spec is not None:
            rows, H, W, C = rows_spec
            f, dfdx, dfdy = _eval_keypoints(
                None, kp, corner, scale, ups, interp,
                rows_spec=(rows, H, W, C, patch_row))
        elif pregathered:
            f, dfdx, dfdy = _eval_keypoints(all_patches, kp, corner, scale,
                                            ups, interp)
        elif use_pallas:
            from ..ops.interpolate_pallas import interpolate_batch
            uv = (kp * scale - 0.5 - corner) * ups[..., None]
            fB, drB, dcB = interpolate_batch(
                all_patches, patch_row.reshape(-1),
                uv[..., 1].reshape(-1), uv[..., 0].reshape(-1), interp,
                use_pallas=True)
            C = fB.shape[-1]
            f = fB.reshape(P, K, C)
            su = scale * ups[..., None]
            dfdx = dcB.reshape(P, K, C) * su[..., 0:1]
            dfdy = drB.reshape(P, K, C) * su[..., 1:2]
        else:
            patches = all_patches[patch_row]      # [P, K, ps, ps, C] gather
            f, dfdx, dfdy = _eval_keypoints(patches, kp, corner, scale, ups,
                                            interp)
        if kp_free_mask is not None:
            # zero the frozen keypoints' Jacobians at assembly: their H
            # rows/cols and g entries vanish exactly, so the LM solver can
            # skip its [P, N, N] mask passes (assume_masked_system)
            mfree = kp_free_mask.astype(f.dtype)[..., None]
            dfdx = dfdx * mfree
            dfdy = dfdy * mfree
        Delta = _delta_edges(edge_i, edge_j)
        r = jnp.einsum("pek,pkc->pec", Delta, f)    # f_i - f_j, [P, E, C]
        s = jnp.sum(r * r, axis=-1)                 # [P, E]
        return kp, f, dfdx, dfdy, Delta, r, s

    def cost_fn(x, data):
        (_, _, _, _, _, _, edge_w) = data
        *_, r, s = _common(x, data)
        return 0.5 * jnp.sum(edge_w * loss(s), axis=1)

    def system_fn(x, data):
        """Gram-factorized normal equations.

        The edge Jacobian separates: d r_e / d kp_m = Delta[e, k_m] * df[k_m]
        (each residual only touches its two endpoint keypoints and the
        descriptor gradient df is a per-KEYPOINT quantity). Therefore

            H = (Delta^T diag(w) Delta) \\u2297_{2x2} (DF DF^T)
            g = rows(DF) . rows(Delta^T diag(w) r)

        i.e. one [K,E]x[E,K] and one [2K,C]x[C,2K] batched matmul plus a
        Hadamard product — instead of per-edge 2x2 block tensors scattered
        through one-hot contractions (the previous 5-D einsum chain; ~6x
        faster on TPU at P=128,K=48,E=96,C=128)."""
        (patch_row, corner, scale, ups, edge_i, edge_j, edge_w) = data
        kp, f, dfdx, dfdy, Delta, r, s = _common(x, data)
        P = kp.shape[0]
        C = f.shape[-1]

        cost = 0.5 * jnp.sum(edge_w * loss(s), axis=1)
        w = edge_w * loss.weight(s)                # [P, E]

        # DF [P, 2K, C]: row m = 2k+a holds df_a(kp_k), a in {x, y}
        DF = jnp.stack([dfdx, dfdy], axis=2).reshape(P, 2 * K, C)
        G = jnp.einsum("pek,pe,pel->pkl", Delta, w, Delta)   # [P, K, K]
        D = jnp.einsum("pmc,pnc->pmn", DF, DF)               # [P, 2K, 2K]
        G2 = jnp.broadcast_to(G[:, :, None, :, None],
                              (P, K, 2, K, 2)).reshape(P, 2 * K, 2 * K)
        H = G2 * D

        Rt = jnp.einsum("pek,pe,pec->pkc", Delta, w, r)      # [P, K, C]
        gx = jnp.sum(dfdx * Rt, axis=-1)                     # [P, K]
        gy = jnp.sum(dfdy * Rt, axis=-1)
        g = jnp.stack([gx, gy], axis=2).reshape(P, 2 * K)
        return cost, H, g

    return system_fn, cost_fn


@lru_cache(maxsize=32)
def _compiled_descriptor_eval_rows(interp_key, H, W, C):
    """Windowed descriptor eval against the flat row view of the packed
    array: 4-row bicubic reads, so dense featuremaps are never replicated
    per keypoint (a dense 765x1020x128 map fancy-indexed per observation
    allocates hundreds of GB — the round-2 localization OOM)."""
    from ..base.interpolation import bicubic_window_eval_rows
    from ..util.jit_cache import interp_from_key

    interp = interp_from_key(interp_key)

    @jax.jit
    def run(rows_view, row_base, r, c):
        f, _, _ = bicubic_window_eval_rows(rows_view, H, W, C, row_base, r, c)
        if interp.l2_normalize:
            f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True),
                                1e-20)
        return f

    return run


@lru_cache(maxsize=32)
def _compiled_descriptor_eval_single(interp_key):
    """Per-patch descriptor eval (generic modes): one patch, a batch of
    queries."""
    from ..base.interpolation import interpolate
    from ..util.jit_cache import interp_from_key

    interp = interp_from_key(interp_key)

    @jax.jit
    def run(patch, r, c):
        return jax.vmap(lambda rr, cc: interpolate(patch, rr, cc, interp))(
            r, c)

    return run


def evaluate_descriptors(packed_patches, rows, kps, corners, scales, ups,
                         interp: InterpolationConfig,
                         query_chunk: int = 1024) -> np.ndarray:
    """Batched descriptor lookup at image coords (no gradients) — used to freeze
    root/reference descriptors. Returns [N, C] float32. Batch sizes are padded
    to power-of-two buckets so repeat calls hit the compiled cache."""
    from ..util.jit_cache import bucket

    rows = np.asarray(rows)
    n = len(rows)
    kps = np.asarray(kps, np.float32)
    corners = np.asarray(corners, np.float32)
    scales = np.asarray(scales, np.float32)
    ups = np.asarray(ups, np.float32)
    uv = (kps * scales - 0.5 - corners) * ups[..., None]

    N, H, W, C = packed_patches.shape
    if (interp.mode in ("BICUBIC", "CERES_BICUBIC")
            and not interp.ncc_normalize and interp.n_nodes == 1):
        # windowed path: never replicates patches; chunk the query axis so
        # the [q, 4, W, C] row gather stays bounded on dense maps
        run = _compiled_descriptor_eval_rows(_interp_key(interp), H, W, C)
        rows_view = jnp.asarray(packed_patches).reshape(N * H, W, C)
        out = np.empty((n, C), np.float32)
        for s in range(0, n, query_chunk):
            e = min(s + query_chunk, n)
            q_pad = bucket(e - s, minimum=64)
            rb = np.zeros(q_pad, np.int64)
            rb[:e - s] = rows[s:e] * H
            r = np.zeros(q_pad, np.float32)
            c = np.zeros(q_pad, np.float32)
            r[:e - s] = uv[s:e, 1]
            c[:e - s] = uv[s:e, 0]
            out[s:e] = np.asarray(run(rows_view, jnp.asarray(rb),
                                      jnp.asarray(r),
                                      jnp.asarray(c)))[:e - s]
        return out

    # generic modes: group queries by patch row (dense maps repeat rows
    # heavily) and evaluate per unique patch
    from ..base.interpolation import output_dim
    run = _compiled_descriptor_eval_single(_interp_key(interp))
    out = np.empty((n, output_dim(interp.mode, C, interp.n_nodes)),
                   np.float32)
    uniq, inv = np.unique(rows, return_inverse=True)
    for u_i, u in enumerate(uniq):
        sel = np.nonzero(inv == u_i)[0]
        q_pad = bucket(len(sel), minimum=64)
        r = np.zeros(q_pad, np.float32)
        c = np.zeros(q_pad, np.float32)
        r[:len(sel)] = uv[sel, 1]
        c[:len(sel)] = uv[sel, 0]
        patch = jnp.asarray(packed_patches[int(u)])
        out[sel] = np.asarray(run(patch, jnp.asarray(r),
                                  jnp.asarray(c)))[:len(sel)]
    return out


def make_target_system(all_patches, interp: InterpolationConfig,
                       loss: RobustLoss, pregathered: bool = False,
                       rows_spec=None):
    """Fixed-target system: per problem one 2-DoF keypoint against constant
    reference descriptors (covers topological_reference KA — the root is constant
    so its descriptor is a fixed target — and QKA's FeatureReference2DCostFunctor,
    reference residuals/src/feature_reference.h:23-66).

    Problem data: patch_row [P], corner/scale [P,2], ups [P], targets [P,T,C],
    target_w [P,T] (0 = padding). ``rows_spec = (rows, H, W, C)`` interpolates
    straight from the flat row view of the packed array (see make_ka_system).
    """

    def _eval(x, data):
        patch_row, corner, scale, ups, targets, target_w = data
        kp = x  # [P, 2]
        uv = (kp * scale - 0.5 - corner) * ups[..., None]

        if rows_spec is not None:
            from ..base.interpolation import (bicubic_window_eval_rows,
                                              l2_normalize_with_grad)
            rows, H, W, C = rows_spec
            row_base = patch_row.astype(jnp.int32) * H
            f, dfdr, dfdc = bicubic_window_eval_rows(
                rows, H, W, C, row_base, uv[..., 1], uv[..., 0])
            if interp.l2_normalize:
                f, (dfdr, dfdc) = l2_normalize_with_grad(f, (dfdr, dfdc))
            su = scale * ups[..., None]
            dfdx = dfdc * su[..., 0:1]
            dfdy = dfdr * su[..., 1:2]
            r = f[:, None, :] - targets          # [P, T, C]
            s = jnp.sum(r * r, axis=-1)          # [P, T]
            return f, dfdx, dfdy, r, s

        def one(patch, rr, cc):
            return interpolate_with_grad(patch, rr, cc, interp)

        patches = all_patches if pregathered else all_patches[patch_row]
        f, dfdr, dfdc = jax.vmap(one)(patches, uv[..., 1], uv[..., 0])
        su = scale * ups[..., None]
        dfdx = dfdc * su[..., 0:1]
        dfdy = dfdr * su[..., 1:2]
        r = f[:, None, :] - targets          # [P, T, C]
        s = jnp.sum(r * r, axis=-1)          # [P, T]
        return f, dfdx, dfdy, r, s

    def cost_fn(x, data):
        target_w = data[-1]
        *_, s = _eval(x, data)
        return 0.5 * jnp.sum(target_w * loss(s), axis=1)

    def system_fn(x, data):
        target_w = data[-1]
        f, dfdx, dfdy, r, s = _eval(x, data)
        cost = 0.5 * jnp.sum(target_w * loss(s), axis=1)
        w = target_w * loss.weight(s)        # [P, T]
        J = jnp.stack([dfdx, dfdy], axis=-1)  # [P, C, 2]
        JtJ = jnp.einsum("pca,pcb->pab", J, J)  # same J for all targets
        H = jnp.sum(w, axis=1)[:, None, None] * JtJ
        g = jnp.einsum("pt,ptc,pca->pa", w, r, J)
        return cost, H, g

    return system_fn, cost_fn


def _target_chunk_core(interp_key, loss_key, lm_opts: LMOptions):
    """UNjitted fixed-target chunk solver — jitted by
    :func:`_compiled_target_chunk`, or composed into a larger fused program
    (the localization QKA->PnP single-dispatch path)."""
    interp = InterpolationConfig(mode=interp_key[0], l2_normalize=interp_key[1],
                                 ncc_normalize=interp_key[2],
                                 nodes=[list(n) for n in interp_key[3]])
    loss = RobustLoss(loss_key[0], list(loss_key[1]), scale=loss_key[2])

    def run_chunk(all_patches, x0, data, lower, upper, pmask, fmask):
        window_ok = (interp.mode in ("BICUBIC", "CERES_BICUBIC")
                     and not interp.ncc_normalize and interp.n_nodes == 1)
        if window_ok:
            n, H, W, C = all_patches.shape
            rows = all_patches.reshape(n * H, W, C)  # free bitcast
            system_fn, cost_fn = make_target_system(
                None, interp, loss, rows_spec=(rows, H, W, C))
        else:
            # hoist the loop-invariant patch gather out of the LM while_loop
            patches_p = all_patches[data[0]]
            system_fn, cost_fn = make_target_system(patches_p, interp, loss,
                                                    pregathered=True)
        sysf = lambda x: system_fn(x, data)
        costf = lambda x: cost_fn(x, data)
        return lm_solve(sysf, costf, x0, param_mask=fmask,
                        problem_mask=pmask, lower=lower, upper=upper,
                        opts=lm_opts)

    return run_chunk


@lru_cache(maxsize=32)
def _compiled_target_chunk(interp_key, loss_key, lm_opts: LMOptions):
    return jax.jit(_target_chunk_core(interp_key, loss_key, lm_opts))


def solve_target_problems(kp0, patch_row, corner, scale, ups, targets,
                          target_w, lower, upper, packed_patches,
                          interp: InterpolationConfig, loss: RobustLoss,
                          lm_opts: LMOptions, chunk: int = 8192,
                          free_mask: Optional[np.ndarray] = None,
                          mesh=None):
    """Batched fixed-target LM over P independent keypoints. Returns
    (kp, summary). ``mesh`` (jax.sharding.Mesh): shard the problem axis of
    each chunk over the device mesh (fixed-target problems are independent
    — the QKA serving fan-out); patches are replicated."""
    P = kp0.shape[0]
    ndev = int(mesh.devices.size) if mesh is not None else 1
    _shard = _repl = None
    if ndev > 1:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P
        _shard = NamedSharding(mesh, _P(mesh.axis_names[0]))
        _repl = NamedSharding(mesh, _P())
    all_patches = jnp.asarray(packed_patches) if _repl is None \
        else jax.device_put(np.asarray(packed_patches), _repl)
    run_chunk_c = _compiled_target_chunk(
        _interp_key(interp), (loss.name, tuple(loss.params), loss.scale),
        lm_opts)

    def _put(a):
        a = np.asarray(a)
        return jnp.asarray(a) if _shard is None else jax.device_put(a, _shard)

    def run_chunk(x0, data, lower, upper, pmask, fmask):
        return run_chunk_c(all_patches, x0, data, lower, upper, pmask, fmask)

    out = np.array(kp0, np.float32, copy=True)
    tot = dict(initial_cost=0.0, final_cost=0.0, num_problems=P, iterations=0)
    if free_mask is None:
        free_mask = np.ones(P, bool)
    # bucket the chunk size to powers of two so repeated queries of similar
    # size reuse the compiled program (recompiles are expensive on TPU)
    if P:
        chunk = min(chunk, 1 << max(int(np.ceil(np.log2(max(P, 1)))), 3))
    else:
        chunk = 8
    if ndev > 1:
        chunk = max(chunk, ndev)   # powers of two keep divisibility
    n_chunks = int(np.ceil(P / chunk)) if P else 0
    for ci in range(n_chunks):
        sl = slice(ci * chunk, min((ci + 1) * chunk, P))
        n = sl.stop - sl.start
        pad = chunk - n

        def pad0(a, fill=0):
            if pad == 0:
                return np.ascontiguousarray(a)
            return np.concatenate(
                [a, np.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)

        data = tuple(_put(x) for x in (
            pad0(patch_row[sl]), pad0(corner[sl]), pad0(scale[sl], 1),
            pad0(ups[sl], 1), pad0(targets[sl]), pad0(target_w[sl])))
        lo = pad0(np.nan_to_num(lower[sl], neginf=-1e30), -1e30)
        hi = pad0(np.nan_to_num(upper[sl], posinf=1e30), 1e30)
        pmask = np.zeros(chunk, bool)
        pmask[:n] = free_mask[sl]
        fmask = np.repeat(pmask[:, None], 2, axis=1)

        x, summary = run_chunk(_put(pad0(kp0[sl]).astype(np.float32)),
                               data, _put(lo.astype(np.float32)),
                               _put(hi.astype(np.float32)),
                               _put(pmask), _put(fmask))
        xs = np.asarray(x)[:n]
        sel = free_mask[sl]
        out[sl] = np.where(sel[:, None], xs, out[sl])
        # ONE packed fetch for the three scalars: on tunnel backends every
        # device->host read costs ~10 ms of transfer latency regardless of
        # size, so fetch count — not bytes — is the serving-path cost
        sc = np.asarray(jnp.stack([
            jnp.sum(summary.initial_cost[:n]),
            jnp.sum(summary.final_cost[:n]),
            jnp.max(summary.iterations).astype(jnp.float32)]))
        tot["initial_cost"] += float(sc[0])
        tot["final_cost"] += float(sc[1])
        tot["iterations"] = max(tot["iterations"], int(sc[2]))
    return out, tot




@lru_cache(maxsize=32)
def _compiled_ka_chunk(interp_key, loss_key, lm_opts: LMOptions, K: int,
                       use_pallas: bool = False):
    """One jitted KA chunk solver per static configuration — reused across
    levels, calls, and bench repetitions (jit caching is essential: through the
    TPU tunnel every recompile costs minutes)."""
    interp = InterpolationConfig(mode=interp_key[0], l2_normalize=interp_key[1],
                                 ncc_normalize=interp_key[2],
                                 nodes=[list(n) for n in interp_key[3]])
    loss = RobustLoss(loss_key[0], list(loss_key[1]), scale=loss_key[2])

    from dataclasses import replace as _dc_replace
    masked_opts = _dc_replace(lm_opts, assume_masked_system=True)

    @jax.jit
    def run_chunk(all_patches, x0, data, kp_free, lower, upper, pmask,
                  lam0=None):
        window_ok = (interp.mode in ("BICUBIC", "CERES_BICUBIC")
                     and not interp.ncc_normalize and interp.n_nodes == 1)
        if use_pallas and interp.n_nodes == 1:
            system_fn, cost_fn = make_ka_system(all_patches, interp, loss, K,
                                                use_pallas=True,
                                                kp_free_mask=kp_free)
        elif window_ok:
            # flat row view of the PACKED array, materialized ONCE before the
            # LM while_loop (the reshape is a physical tile-layout copy; the
            # window gather then indexes patch_row*ps rows directly — no
            # per-problem [P,K,ps,ps,C] gather at all)
            n, H, W, C = all_patches.shape
            rows = all_patches.reshape(n * H, W, C)  # free bitcast
            system_fn, cost_fn = make_ka_system(None, interp, loss, K,
                                                rows_spec=(rows, H, W, C),
                                                kp_free_mask=kp_free)
        else:
            # hoist the [P,K,ps,ps,C] patch gather out of the LM while_loop:
            # it is loop-invariant and otherwise re-reads HBM twice/iteration
            patches_pk = all_patches[data[0]]
            system_fn, cost_fn = make_ka_system(patches_pk, interp, loss, K,
                                                pregathered=True,
                                                kp_free_mask=kp_free)
        sysf = lambda x: system_fn(x, data)
        costf = lambda x: cost_fn(x, data)
        mask = jnp.repeat(kp_free, 2, axis=1)
        x, summary = lm_solve(sysf, costf, x0, param_mask=mask,
                              problem_mask=pmask,
                              lower=lower.reshape(x0.shape),
                              upper=upper.reshape(x0.shape),
                              opts=masked_opts, lam0=lam0)
        return x, summary

    return run_chunk


def solve_ka_problems(problems: KAProblems, packed_patches: np.ndarray,
                      interp: InterpolationConfig, loss: RobustLoss,
                      lm_opts: LMOptions, chunk: int = 128,
                      use_pallas: bool = False,
                      compaction_segment: int = 0,
                      mesh=None) -> Tuple[np.ndarray,
                                          Dict]:
    """Run all padded problems through the batched LM, chunked to bound memory.

    ``compaction_segment > 0`` runs the LM in segments of that many
    iterations and re-packs only the UNCONVERGED problems between segments
    (warm-starting their damping) — stragglers no longer hold a whole
    lock-stepped chunk at the iteration cap while its converged neighbors
    burn idle FLOPs. The reference gets this for free from its per-problem
    thread pool (parallel_optimizer.h); this is the batched equivalent.
    Off by default: it pays one dispatch round-trip per chunk per segment,
    which only amortizes when dispatch is cheap (local accelerators) and a
    large fraction of problems converges early — on the remote-tunnel dev
    setup it measured slower (examples/bench_compaction.py).

    ``mesh`` (a jax.sharding.Mesh): shard the problem batch axis of every
    chunk over the device mesh — KA subproblems are independent, so this is
    pure data parallelism with zero cross-chip communication (the multi-chip
    analogue of the reference's thread pool over FFD bins,
    parallel_optimizer.h:70-216). The per-device chunk size stays ``chunk``
    (the global chunk scales by the mesh size); patches are replicated.

    Returns refined kp [P, K, 2] and a merged summary dict (the reference
    merges per-subset Ceres summaries — util/src/statistics.h:14-60).
    """
    from dataclasses import replace as _dc_replace

    P, K, _ = problems.kp0.shape

    _shard = None
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P
        ndev = int(mesh.devices.size)
        chunk = max(1, chunk) * ndev      # constant per-device load
        _shard = NamedSharding(mesh, _P(mesh.axis_names[0]))
        _repl = NamedSharding(mesh, _P())
        all_patches = jax.device_put(jnp.asarray(packed_patches), _repl)
    else:
        all_patches = jnp.asarray(packed_patches)

    def _dput(a):
        a = jnp.asarray(a)
        return a if _shard is None else jax.device_put(a, _shard)

    seg = int(compaction_segment) if compaction_segment else 0
    if seg <= 0 or seg >= lm_opts.max_iterations:
        seg = lm_opts.max_iterations
    seg_opts = _dc_replace(lm_opts, max_iterations=seg)
    run_chunk_c = _compiled_ka_chunk(
        _interp_key(interp), (loss.name, tuple(loss.params), loss.scale),
        seg_opts, K, use_pallas)

    # mutable per-problem state across segments
    x_cur = problems.kp0.reshape(P, K * 2).astype(np.float32).copy()
    lam_cur = np.full(P, lm_opts.initial_lambda, np.float32)
    init_cost = np.zeros(P, np.float32)
    final_cost = np.zeros(P, np.float32)
    iters_used = np.zeros(P, np.int32)
    lower_np = np.nan_to_num(problems.lower, neginf=-1e30).astype(np.float32)
    upper_np = np.nan_to_num(problems.upper, posinf=1e30).astype(np.float32)

    active = np.arange(P)
    it_done = 0
    first_segment = True
    interrupted = False
    from ..util.prefetch import prefetch_map
    while len(active) and it_done < lm_opts.max_iterations and not interrupted:
        still = []
        n_chunks = int(np.ceil(len(active) / chunk))

        def pack_chunk(ci):
            """Host packing + device staging of one chunk — pipelined one
            chunk ahead of the running solve (chunks index disjoint problem
            rows, so packing N+1 while N's results write back is race-free)."""
            idx = active[ci * chunk:(ci + 1) * chunk]
            n = len(idx)
            pad = chunk - n

            def pad0(a, fill=0):
                if pad == 0:
                    return a
                return np.concatenate(
                    [a, np.full((pad,) + a.shape[1:], fill, a.dtype)],
                    axis=0)

            x0 = pad0(x_cur[idx]).reshape(chunk, K * 2)
            data = tuple(_dput(pad0(a)) for a in (
                problems.patch_row[idx], problems.corner[idx],
                problems.scale[idx], problems.ups[idx],
                problems.edge_i[idx], problems.edge_j[idx],
                problems.edge_w[idx]))
            kp_free = pad0(problems.kp_free[idx]).reshape(chunk, K)
            lower = pad0(lower_np[idx], -1e30)
            upper = pad0(upper_np[idx], 1e30)
            pmask = np.zeros(chunk, bool)
            pmask[:n] = True
            return (idx, n, _dput(x0), data, _dput(kp_free),
                    _dput(lower), _dput(upper),
                    _dput(pmask),
                    _dput(pad0(lam_cur[idx], lm_opts.initial_lambda)))

        packed_chunks = prefetch_map(pack_chunk, range(n_chunks), depth=1)
        for ci, (idx, n, x0_d, data, kp_free_d, lower_d, upper_d, pmask_d,
                 lam_d) in enumerate(packed_chunks):
            try:
                x, summary = run_chunk_c(
                    all_patches, x0_d, data, kp_free_d, lower_d, upper_d,
                    pmask_d, lam_d)
                x_cur[idx] = np.asarray(x).reshape(chunk, K * 2)[:n]
                lam_cur[idx] = np.asarray(summary.lam)[:n]
                conv = np.asarray(summary.converged)[:n]
                if first_segment:
                    init_cost[idx] = np.asarray(summary.initial_cost)[:n]
                final_cost[idx] = np.asarray(summary.final_cost)[:n]
                iters_used[idx] += np.asarray(summary.iterations)[:n]
                still.append(idx[~conv])
            except KeyboardInterrupt:
                # graceful termination (reference PyInterruptCallback,
                # base/src/callbacks.h:10-37): keep every completed chunk's
                # keypoints; the interrupted chunk stays at its pre-chunk
                # values
                from .. import logger
                interrupted = True
                logger.warning(
                    "KA interrupted after %d/%d chunks of this segment: "
                    "keeping all completed results.", ci, n_chunks)
                break
        active = np.concatenate(still) if still else np.zeros(0, np.int64)
        it_done += seg
        first_segment = False

    tot = dict(initial_cost=float(init_cost.sum()),
               final_cost=float(final_cost.sum()),
               num_problems=P, iterations=int(iters_used.max(initial=0)))
    if interrupted:
        tot["interrupted"] = True
    return x_cur.reshape(P, K, 2), tot
