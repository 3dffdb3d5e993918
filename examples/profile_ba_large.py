"""Stage-level breakdown of the 2M-obs / 500k-point geometric BA iteration.

Round-2 verdict: ba_lm_ms_per_iter_2m_obs_500k_pts = 398 ms with no evidence
of where the time goes. This script times each stage of one LM iteration in
isolation via the ops.schur._STAGE_EXPORT hook:

  1. eval_chunked(with_jac=True)  — residual+Jacobian+Gram+segment reductions
  2. schur_step                   — damping + CG Schur solve + back-subst.
  3. cost_at                      — cost-only candidate evaluation
  4. CG marginal cost             — schur_step at 5 vs 25 CG iterations

plus sub-probes of stage 1 (Jacobian eval only / + Gram, reductions DCE'd).

Usage: python examples/profile_ba_large.py  (runs on the default device).
Results recorded in docs/ba_throughput.md.
"""

import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from pixsfm_tpu.base.losses import RobustLoss  # noqa: E402
from pixsfm_tpu.ops import schur  # noqa: E402
from pixsfm_tpu.ops.schur import BAOptions, ba_solve  # noqa: E402


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best * 1e3, out


def main(I=200, Np=500_000, track=4, obs_chunk=65536, cg_iters=25):
    print(f"building problem: I={I} Np={Np} track={track}", flush=True)
    rfn, jfn, state0, obs, args = bench.ba_large_problem(I, Np, track)
    loss = RobustLoss("trivial")
    opts = BAOptions(max_iterations=1, linear_solver="cg",
                     obs_chunk=obs_chunk,
                     max_linear_solver_iterations=cg_iters,
                     obs_grid_T=track)

    export = {}
    schur._STAGE_EXPORT = export
    # eager call builds + exports the stage closures (max_iterations=1 so the
    # eager path stays cheap); closures capture obs/opts/loss concretely.
    ba_solve(rfn, state0, obs, loss, *args, opts=opts, residual_jac_fn=jfn)
    schur._STAGE_EXPORT = None

    eval_chunked = export["eval_chunked"]
    mask_system = export["mask_system"]
    schur_step = export["schur_step"]
    cost_at = export["cost_at"]

    sys_fn = jax.jit(lambda s: mask_system(eval_chunked(s, True)))
    ms_eval, sysd = timeit(sys_fn, state0)
    print(f"eval_chunked(with_jac) + mask:  {ms_eval:8.1f} ms", flush=True)

    lam = jnp.asarray(1e-4, jnp.float32)
    step_fn = jax.jit(schur_step)
    ms_step, _ = timeit(step_fn, sysd, lam)
    print(f"schur_step (CG x{cg_iters}):        {ms_step:8.1f} ms",
          flush=True)

    ms_cost, _ = timeit(jax.jit(cost_at), state0)
    print(f"cost_at (cost-only eval):       {ms_cost:8.1f} ms", flush=True)

    total = ms_eval + ms_step
    print(f"-> LM iteration (carry_sys) = eval + step = {total:.1f} ms "
          f"(bench_r02: 398 ms)", flush=True)

    # --- CG marginal cost: re-run ba_solve stage export at 5 CG iters -----
    export5 = {}
    schur._STAGE_EXPORT = export5
    opts5 = BAOptions(max_iterations=1, linear_solver="cg",
                      obs_chunk=obs_chunk, max_linear_solver_iterations=5,
                      obs_grid_T=track)
    ba_solve(rfn, state0, obs, loss, *args, opts=opts5, residual_jac_fn=jfn)
    schur._STAGE_EXPORT = None
    ms_step5, _ = timeit(jax.jit(export5["schur_step"]), sysd, lam)
    per_cg = (ms_step - ms_step5) / (cg_iters - 5)
    print(f"schur_step (CG x5):             {ms_step5:8.1f} ms "
          f"-> {per_cg:.2f} ms per CG iteration", flush=True)

    # --- eval sub-probes ---------------------------------------------------
    # jacobian eval only: same chunked vmap of the analytic residual+jac,
    # reduced to a scalar so XLA keeps the compute but drops the reductions
    O = int(obs.img_idx.shape[0])
    n_chunks = (O + obs_chunk - 1) // obs_chunk
    pad_O = n_chunks * obs_chunk
    ochunks = jnp.arange(pad_O, dtype=jnp.int32).reshape(n_chunks, obs_chunk)
    ochunks = jnp.minimum(ochunks, O - 1)

    def jac_only(state):
        def chunk(c, ois):
            q = state.qvec[obs.img_idx[ois]]
            t = state.tvec[obs.img_idx[ois]]
            cm = state.cams[obs.cam_idx[ois]]
            x = state.xyz[obs.pt_idx[ois]]
            r, J = jax.vmap(jfn, in_axes=(0, 0, 0, 0, 0, None))(
                q, t, cm, x, obs.obs_data[ois], None)
            return c + jnp.sum(r) + jnp.sum(J), None
        c, _ = jax.lax.scan(chunk, jnp.asarray(0.0, jnp.float32), ochunks)
        return c

    ms_jac, _ = timeit(jax.jit(jac_only), state0)
    print(f"sub-probe: row-gather + jac eval only: {ms_jac:8.1f} ms",
          flush=True)

    def jac_gram(state):
        def chunk(c, ois):
            q = state.qvec[obs.img_idx[ois]]
            t = state.tvec[obs.img_idx[ois]]
            cm = state.cams[obs.cam_idx[ois]]
            x = state.xyz[obs.pt_idx[ois]]
            r_t, J_t = jax.vmap(jfn, in_axes=(0, 0, 0, 0, 0, None),
                                out_axes=-1)(q, t, cm, x, obs.obs_data[ois],
                                             None)
            Ja = jnp.concatenate([J_t, r_t[:, None, :]], axis=1)
            G = jnp.einsum("cin,cjn->ijn", Ja, Ja)
            return c + jnp.sum(G), None
        c, _ = jax.lax.scan(chunk, jnp.asarray(0.0, jnp.float32), ochunks)
        return c

    ms_gram, _ = timeit(jax.jit(jac_gram), state0)
    print(f"sub-probe: + Gram einsum (no reductions): {ms_gram:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
