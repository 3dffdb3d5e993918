"""Multi-chip sharding for the batched solvers (SURVEY.md §2.9 / §5.8).

The reference's only parallelism is a thread pool over subproblems plus Ceres
threads (parallel_optimizer.h); the TPU-native scaling axes are:

- **KA**: the problem batch axis ``P`` is embarrassingly parallel — shard it over
  the mesh (data-parallel); no cross-chip communication at all.
- **BA**: observations and Schur track-pairs shard over the mesh; the block
  reductions (``Hpp``/``Hcc``/``V``/``g`` segment-sums and the reduced camera
  system ``S``) become ``psum``s over ICI that XLA inserts automatically from the
  sharding annotations. Camera-side state stays replicated (it is tiny); point
  blocks shard with the observations that touch them via scatter-add + psum.

Implementation: ``jax.jit`` with ``NamedSharding`` annotations on the flat
observation arrays — XLA SPMD propagates the shardings through ``ba_solve``
unchanged, which is exactly the "annotate and let the compiler insert
collectives" recipe. Arrays are padded to multiples of the mesh size.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


__all__ = ["make_mesh", "shard_ka_chunk", "sharded_ka_solve",
           "sharded_ba_solve", "sharded_reference_extraction"]


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def _pad_to(a: jnp.ndarray, mult: int, axis: int = 0, fill=0):
    n = a.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=fill)


def shard_ka_chunk(mesh: Mesh, axis: str = "data"):
    """Sharding spec for KA problem batches: shard the leading P axis."""
    return NamedSharding(mesh, P(axis))


def sharded_ka_solve(problems, packed_patches, interp, loss, lm_opts,
                     mesh: Mesh, axis: str = "data"):
    """Run the batched KA LM with the problem axis ``P`` sharded over
    ``mesh`` — KA subproblems are independent, so this is pure data
    parallelism with zero cross-chip communication (the TPU analogue of the
    reference's thread pool over FFD bins, parallel_optimizer.h).

    ``problems``: a :class:`KAProblems`; ``packed_patches`` stays replicated
    (each chip gathers only the rows its problems touch). Returns
    (kp [P, K, 2] numpy, summary dict) like ``solve_ka_problems``.
    """
    from ..keypoint_adjustment.solver import (_compiled_ka_chunk, _interp_key)

    n = mesh.devices.size
    nP, K, _ = problems.kp0.shape
    L = max(((nP + n - 1) // n) * n, n)
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def padP(a, fill=0):
        a = np.asarray(a)
        if len(a) >= L:
            return a
        return np.concatenate(
            [a, np.full((L - len(a),) + a.shape[1:], fill, a.dtype)])

    x0 = jax.device_put(jnp.asarray(
        padP(problems.kp0).reshape(L, K * 2)), shard)
    data = tuple(jax.device_put(jnp.asarray(padP(a)), shard) for a in (
        problems.patch_row, problems.corner, problems.scale, problems.ups,
        problems.edge_i, problems.edge_j, problems.edge_w))
    kp_free = jax.device_put(jnp.asarray(padP(problems.kp_free)), shard)
    lower = np.nan_to_num(padP(problems.lower, -1e30), neginf=-1e30)
    upper = np.nan_to_num(padP(problems.upper, 1e30), posinf=1e30)
    lower[nP:] = -1e30
    upper[nP:] = 1e30
    pmask = np.zeros(L, bool)
    pmask[:nP] = True

    run_chunk = _compiled_ka_chunk(
        _interp_key(interp), (loss.name, tuple(loss.params), loss.scale),
        lm_opts, K)
    with mesh:
        x, summary = run_chunk(
            jax.device_put(jnp.asarray(packed_patches), repl), x0, data,
            kp_free, jax.device_put(jnp.asarray(lower), shard),
            jax.device_put(jnp.asarray(upper), shard),
            jax.device_put(jnp.asarray(pmask), shard))
    kp = np.asarray(x).reshape(L, K, 2)[:nP]
    tot = dict(initial_cost=float(jnp.sum(summary.initial_cost[:nP])),
               final_cost=float(jnp.sum(summary.final_cost[:nP])),
               num_problems=nP,
               iterations=int(jnp.max(summary.iterations)))
    return kp, tot


def sharded_ba_solve(residual_fn, state0, obs, loss, pose_free, tvec_free,
                     cam_free, point_free, opts, mesh: Mesh,
                     axis: str = "data"):
    """Run :func:`pixsfm_tpu.ops.schur.ba_solve` with observations and Schur
    pairs sharded over ``mesh``. Parameters stay replicated; reductions become
    ICI psums inserted by XLA SPMD."""
    from ..ops.schur import BAObservations

    n = mesh.devices.size
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    O = obs.img_idx.shape[0]
    # pad the obs axis with at least one invalid slot (the Schur pair padding
    # target); padded entries are masked by valid=False
    L = (O // n + 1) * n

    def pad_obs(a, fill=0):
        a = jnp.asarray(a)
        widths = [(0, L - O)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    valid = pad_obs(obs.valid, False)
    obs_p = BAObservations(
        img_idx=jax.device_put(pad_obs(obs.img_idx), shard),
        cam_idx=jax.device_put(pad_obs(obs.cam_idx), shard),
        pt_idx=jax.device_put(pad_obs(obs.pt_idx), shard),
        obs_data=jax.tree_util.tree_map(
            lambda a: jax.device_put(pad_obs(a), shard), obs.obs_data),
        valid=jax.device_put(valid, shard),
        pair_o1=jax.device_put(_pad_to(jnp.asarray(obs.pair_o1), n), shard),
        pair_o2=jax.device_put(_pad_to(jnp.asarray(obs.pair_o2), n), shard),
        # pt_slot/img_slot (axis-major tables) are intentionally dropped:
        # they index the GLOBAL observation axis, which is sharded here —
        # the flat segment sums stay correct under SPMD (XLA inserts psums)
    )
    # Padded pairs must reference an *invalid* obs slot (zero B block) so they
    # contribute nothing to the Schur reduction. Slot O is always padding.
    q = obs.pair_o1.shape[0]
    po1 = _pad_to(jnp.asarray(obs.pair_o1), n, 0, O)
    po2 = _pad_to(jnp.asarray(obs.pair_o2), n, 0, O)
    obs_p = obs_p._replace(pair_o1=jax.device_put(po1, shard),
                           pair_o2=jax.device_put(po2, shard))

    state0 = jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), repl), state0)

    from ..ops.schur import ba_solve
    with mesh:
        return ba_solve(residual_fn, state0, obs_p, loss,
                        jax.device_put(jnp.asarray(pose_free), repl),
                        jax.device_put(jnp.asarray(tvec_free), repl),
                        jax.device_put(jnp.asarray(cam_free), repl),
                        jax.device_put(jnp.asarray(point_free), repl),
                        opts=opts)


def sharded_reference_extraction(reconstruction, feature_set, view, conf,
                                 interp, mesh: Mesh, axis: str = "data",
                                 **kwargs):
    """Reference extraction with both device stages (per-observation
    descriptor interpolation + per-point IRLS) data-parallel over ``mesh``.

    Both stages are batched elementwise programs, so sharding the batch axis
    needs no cross-chip communication at all — the multi-chip analogue of the
    reference's per-point3D-bin thread pool (reference_extractor.h:125-162).
    Same signature/result as ``bundle_adjustment.references.extract_references``.
    """
    from ..bundle_adjustment.references import extract_references

    shard = NamedSharding(mesh, P(axis))
    with mesh:
        return extract_references(reconstruction, feature_set, view, conf,
                                  interp, sharding=shard, **kwargs)
