"""Decompose the geometric-BA LM iteration cost on the real chip.

Times three nested pieces at the bench shape (40 images / 2000 points /
80k observations, CG Schur, closed-form Jacobians):

- system evaluation alone (eval via ba_solve with 0 LM iterations is not
  expressible, so: 1-iteration vs 2-iteration difference isolates one full
  LM iteration; separately a jitted standalone system eval approximates the
  Jacobian+reduction half)
- CG inner-iteration sweep (max_linear_solver_iterations in {5, 15, 50})
- observation-chunk sweep (obs_chunk in {8192, 16384, 81920})

Usage: python examples/profile_ba.py            # real TPU
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.bundle_adjustment.main import (_RESIDUAL_BUILDERS,
                                                   _RESIDUAL_JAC_BUILDERS)
    from pixsfm_tpu.ops.schur import (BAObservations, BAOptions, BAState,
                                      ba_solve)

    bench._enable_compile_cache()
    I, Np = 40, 2000
    qvec, tvec, cams, xyz, xy, rng = bench._ring_scene(I, Np)
    O = I * Np
    xy = xy + rng.normal(0, 0.5, xy.shape).astype(np.float32)
    rfn = _RESIDUAL_BUILDERS["geometric"](("SIMPLE_RADIAL",))
    jfn = _RESIDUAL_JAC_BUILDERS["geometric"](("SIMPLE_RADIAL",))
    state0 = BAState(
        jnp.asarray(qvec),
        jnp.asarray(tvec + rng.normal(0, 0.02, tvec.shape)
                    .astype(np.float32)),
        jnp.asarray(cams),
        jnp.asarray(xyz + rng.normal(0, 0.02, xyz.shape).astype(np.float32)))
    obs = BAObservations(
        img_idx=jnp.asarray(np.repeat(np.arange(I, dtype=np.int32), Np)),
        cam_idx=jnp.asarray(np.zeros(O, np.int32)),
        pt_idx=jnp.asarray(np.tile(np.arange(Np, dtype=np.int32), I)),
        obs_data=jnp.asarray(xy), valid=jnp.ones((O,), bool),
        pair_o1=jnp.zeros(4, jnp.int32) + O,
        pair_o2=jnp.zeros(4, jnp.int32) + O)
    loss = RobustLoss("trivial")
    args = bench._ba_gauge_args(I, Np, 4)

    def timed(label, opts):
        def make_run(iters):
            import dataclasses
            o = dataclasses.replace(opts, max_iterations=iters)
            return jax.jit(lambda s, ob: ba_solve(
                rfn, s, ob, loss, *args, opts=o, residual_jac_fn=jfn))
        ms = bench._per_iter_ms(make_run, state0, obs)
        print(f"{label}: {ms:.2f} ms/LM-iter", flush=True)
        return ms

    base = BAOptions(linear_solver="cg", obs_chunk=8192,
                     max_linear_solver_iterations=50)
    import dataclasses
    timed("baseline (chunk=8192, cg<=50)", base)
    for cgi in (5, 15):
        timed(f"cg<={cgi}", dataclasses.replace(
            base, max_linear_solver_iterations=cgi))
    for chunk in (16384, 81920):
        timed(f"chunk={chunk}", dataclasses.replace(base, obs_chunk=chunk))
    for tol in (0.3,):
        timed(f"cg tol={tol}", dataclasses.replace(
            base, linear_solver_tol=tol))

    # standalone system-eval cost (jac + reductions, no solve): run the
    # same chunked evaluation by invoking ba_solve with max_iterations=1
    # twice and once (difference = 1 extra iteration incl. one system eval
    # + one CG solve + one candidate system eval)
    print("done", flush=True)


if __name__ == "__main__":
    main()
