"""Pallas TPU kernel: batched preconditioned CG with VMEM-resident Hessians.

The batched LM solver's CG path (``ops.lm._masked_solve``) is HBM-bound on
TPU: every CG iteration re-reads the full ``[P, N, N]`` damped Hessian for
its matvec — 15 iterations x 4.7 MB at bench shapes = ~70 MB per LM
iteration, comparable to the feature-interpolation traffic itself. This
kernel blocks the problem axis, loads each ``[Pb, N, N]`` Hessian block into
VMEM **once** (double-buffered across grid steps by the standard BlockSpec
pipeline), and runs all CG iterations in-register: per-LM-iteration HBM
traffic for the solve drops ~``cg_iterations``-fold.

Matvec formulation: ``Ap[p, i] = sum_j Hd[p, i, j] * pvec[p, j]`` — a lane
(minor-axis) reduction of a broadcast product, the Mosaic-friendly pattern
(no batched ``dot_general`` needed). All vectors are ``[Pb, N]`` f32.

Inputs are the *damped, masked* normal equations exactly as `_masked_solve`
builds them (frozen rows already identity, gradient already masked), plus
the Jacobi preconditioner diagonal — keeping the XLA side responsible for
the cheap elementwise prep and the kernel for the bandwidth-critical loop.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

__all__ = ["pcg_solve_pallas", "pallas_cg_available"]


def pallas_cg_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@lru_cache(maxsize=32)
def _make_call(P: int, N: int, Pb: int, iters: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(H_ref, g_ref, dinv_ref, dx_ref):
        H = H_ref[...]                        # [Pb, N, N] f32, VMEM-resident
        g = g_ref[...]                        # [Pb, N]
        dinv = dinv_ref[...]                  # [Pb, N]

        def matvec(v):
            # [Pb, 1, N] broadcast * [Pb, N, N], reduce the minor axis
            return jnp.sum(H * v[:, None, :], axis=2)

        x = jnp.zeros_like(g)
        r = -g
        z = dinv * r
        p = z
        rz = jnp.sum(r * z, axis=1, keepdims=True)    # [Pb, 1]

        def body(_, carry):
            x, r, p, rz = carry
            Ap = matvec(p)
            pAp = jnp.sum(p * Ap, axis=1, keepdims=True)
            alpha = rz / jnp.maximum(pAp, 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            z = dinv * r
            rz_new = jnp.sum(r * z, axis=1, keepdims=True)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return (x, r, p, rz_new)

        x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
        dx_ref[...] = x

    grid_spec = pl.GridSpec(
        grid=(P // Pb,),
        in_specs=[
            pl.BlockSpec((Pb, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pb, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pb, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Pb, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((P, N), jnp.float32),
        grid_spec=grid_spec, interpret=interpret)


def _pick_block(P: int, N: int) -> int:
    """Largest Pb dividing P with ~2 x [Pb, N, N] f32 under ~6 MB of VMEM."""
    budget = 6 * 1024 * 1024
    per = N * N * 4 * 2
    best = 1
    for pb in range(1, P + 1):
        if P % pb == 0 and pb * per <= budget:
            best = pb
    return best


def pcg_solve_pallas(Hd, g, dinv, iters: int, interpret: bool = False):
    """Jacobi-preconditioned CG: solve ``Hd dx = -g`` for a batch of dense
    SPD systems. ``Hd [P, N, N]``, ``g/dinv [P, N]`` (dinv = 1/diag(Hd)).

    Falls back to the jnp implementation off-TPU unless ``interpret``.
    """
    P, N = g.shape
    if not (pallas_cg_available() or interpret):
        # jnp reference (identical math; used on CPU and in tests)
        x = jnp.zeros_like(g)
        r = -g
        z = dinv * r
        p = z
        rz = jnp.sum(r * z, axis=1)

        def body(carry, _):
            x, r, p, rz = carry
            Ap = jnp.einsum("pij,pj->pi", Hd, p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap, axis=1), 1e-30)
            x = x + alpha[:, None] * p
            r = r - alpha[:, None] * Ap
            z = dinv * r
            rz_new = jnp.sum(r * z, axis=1)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta[:, None] * p
            return (x, r, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None,
                                       length=int(iters))
        return x

    Pb = _pick_block(P, N)
    call = _make_call(P, N, Pb, int(iters), interpret)
    return call(Hd.astype(jnp.float32), g.astype(jnp.float32),
                dinv.astype(jnp.float32))
