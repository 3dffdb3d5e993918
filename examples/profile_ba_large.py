"""Stage-level breakdown of the 2M-obs / 500k-point geometric BA iteration.

Round-2 verdict: ba_lm_ms_per_iter_2m_obs_500k_pts = 398 ms with no evidence
of where the time goes. This script times each stage of one LM iteration via
the ops.schur._STAGE_EXPORT hook.

MEASUREMENT METHODOLOGY (important): timing `jit(stage)` calls back-to-back
with block_until_ready over identical inputs measures THROUGHPUT on this
remote (axon) backend, not latency — independent dispatches overlap on
device and a stage that takes 180 ms of serial latency reads as ~90 ms.
(Observed directly: the full LM body timed 143 ms with repeated identical
inputs but 400 ms when each call's input depended on the previous call's
output — matching the in-solve per-iteration cost exactly.) Every number
here therefore comes from a DEPENDENT CHAIN: n stage evaluations inside one
jitted lax.fori_loop where iteration i+1's input is perturbed by iteration
i's output, timed at n=2 vs n=12 and differenced — the same methodology as
bench.py's _per_iter_ms.

Usage: python examples/profile_ba_large.py  (runs on the default device).
Results recorded in docs/ba_throughput.md.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from pixsfm_tpu.base.losses import RobustLoss  # noqa: E402
from pixsfm_tpu.ops import schur  # noqa: E402
from pixsfm_tpu.ops.schur import BAOptions, ba_solve  # noqa: E402


def chain_ms(make_loop, label, lo=2, hi=12):
    """Marginal per-iteration ms of a dependent chain: (t_hi - t_lo)/(hi-lo).
    ``make_loop(n)`` returns a jitted fn of zero data args running n chained
    stage evaluations."""
    ts = {}
    for n in (lo, hi):
        fn = make_loop(n)
        out = jax.block_until_ready(fn())            # compile + first run
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn())
            best = min(best or 9e9, time.perf_counter() - t0)
        ts[n] = best
    ms = (ts[hi] - ts[lo]) / (hi - lo) * 1e3
    print(f"{label:44s} {ms:8.1f} ms/iter  "
          f"(chain {lo}: {ts[lo]*1e3:.0f} ms, {hi}: {ts[hi]*1e3:.0f} ms)",
          flush=True)
    return ms


def main(I=200, Np=500_000, track=4, obs_chunk=65536, cg_iters=25):
    print(f"building problem: I={I} Np={Np} track={track}", flush=True)
    rfn, jfn, state0, obs, args = bench.ba_large_problem(I, Np, track)
    loss = RobustLoss("trivial")

    def export_stages(cg):
        opts = BAOptions(max_iterations=1, linear_solver="cg",
                         obs_chunk=obs_chunk,
                         max_linear_solver_iterations=cg,
                         obs_grid_T=track)
        ex = {}
        schur._STAGE_EXPORT = ex
        ba_solve(rfn, state0, obs, loss, *args, opts=opts,
                 residual_jac_fn=jfn)
        schur._STAGE_EXPORT = None
        return ex

    ex = export_stages(cg_iters)
    eval_chunked = ex["eval_chunked"]
    mask_system = ex["mask_system"]
    schur_step = ex["schur_step"]
    cost_at = ex["cost_at"]

    # one dependent-chain loop per stage: iteration i+1 consumes a scalar
    # produced by iteration i so the device cannot overlap evaluations
    def eval_loop(n):
        @jax.jit
        def run():
            def body(i, carry):
                st, acc = carry
                sysd = mask_system(eval_chunked(st, True))
                st = st._replace(xyz=st.xyz + 1e-30 * sysd["cost"])
                return (st, acc + sysd["cost"])
            _, acc = jax.lax.fori_loop(0, n, body, (state0, 0.0))
            return acc
        return run

    ms_eval = chain_ms(eval_loop, "eval_chunked(with_jac) + mask")

    sysd0 = jax.jit(lambda s: mask_system(eval_chunked(s, True)))(state0)
    sysd0 = jax.block_until_ready(sysd0)

    def step_loop_factory(step_fn):
        def step_loop(n):
            # sysd0 must be an ARGUMENT: closing over it bakes ~300 MB of
            # consts (incl. Bt [30, O]) into the program, which the remote
            # compile endpoint rejects (HTTP 413)
            @jax.jit
            def run(sysd):
                def body(i, carry):
                    lam, acc = carry
                    d_pose, d_cam, d_xyz, pred = step_fn(sysd, lam)
                    lam = lam * (1.0 + 1e-30 * pred)   # serializing dep
                    return (lam, acc + pred)
                _, acc = jax.lax.fori_loop(
                    0, n, body, (jnp.asarray(1e-4, jnp.float32), 0.0))
                return acc
            return lambda: run(sysd0)
        return step_loop

    ms_step = chain_ms(step_loop_factory(schur_step),
                       f"schur_step (CG tol-capped at {cg_iters})")

    ex5 = export_stages(5)
    ms_step5 = chain_ms(step_loop_factory(ex5["schur_step"]),
                        "schur_step (CG capped at 5)")

    def cost_loop(n):
        @jax.jit
        def run():
            def body(i, carry):
                st, acc = carry
                c = cost_at(st)
                st = st._replace(xyz=st.xyz + 1e-30 * c)
                return (st, acc + c)
            _, acc = jax.lax.fori_loop(0, n, body, (state0, 0.0))
            return acc
        return run

    ms_cost = chain_ms(cost_loop, "cost_at (cost-only eval)")

    print(f"-> carry_sys LM iteration = eval + step = "
          f"{ms_eval + ms_step:.1f} ms (bench r02: 398 ms)", flush=True)

    # --- eval sub-probes (same chaining) -----------------------------------
    import numpy as np
    O = int(obs.img_idx.shape[0])
    n_chunks = (O + obs_chunk - 1) // obs_chunk
    pad_O = n_chunks * obs_chunk
    ochunks = jnp.arange(pad_O, dtype=jnp.int32).reshape(n_chunks, obs_chunk)
    ochunks = jnp.minimum(ochunks, O - 1)

    def jac_gram_loop(with_gram):
        def mk(n):
            @jax.jit
            def run():
                def chunk(c, ois):
                    q = state0.qvec[obs.img_idx[ois]]
                    t = state0.tvec[obs.img_idx[ois]]
                    cm = state0.cams[obs.cam_idx[ois]]
                    x = state0.xyz[obs.pt_idx[ois]] + c * 1e-30
                    r_t, J_t = jax.vmap(jfn, in_axes=(0, 0, 0, 0, 0, None),
                                        out_axes=-1)(
                        q, t, cm, x, obs.obs_data[ois], None)
                    if with_gram:
                        Ja = jnp.concatenate([J_t, r_t[:, None, :]], axis=1)
                        G = jnp.einsum("cin,cjn->ijn", Ja, Ja)
                        return c + jnp.sum(G), None
                    return c + jnp.sum(r_t) + jnp.sum(J_t), None

                def body(i, acc):
                    c, _ = jax.lax.scan(chunk, acc, ochunks)
                    return c
                return jax.lax.fori_loop(0, n, body,
                                         jnp.asarray(0.0, jnp.float32))
            return run
        return mk

    chain_ms(jac_gram_loop(False), "sub-probe: row-gather + jac eval only")
    chain_ms(jac_gram_loop(True), "sub-probe: + Gram einsum (no reductions)")


if __name__ == "__main__":
    main()
