"""A/B probe: per-observation closed-form BA Jacobian, matmul form vs
scalar-expanded form, on the 2M-obs chunked Gram eval.

Round-5 finding: the dependent-chain profiler (profile_ba_large.py) showed
the Jacobian-eval scan at ~151 ms/iter — 90% of the 169 ms LM iteration —
while residual-only costs 4.6 ms. Hypothesis: `project_with_jac`'s internal
[2,3]x[3,3] / [3,3]@[3] matmuls, vmapped over a 65536-obs chunk, lower to
batched tiny dot_generals that the TPU pads to (8,128) MXU tiles (>97%
waste), instead of fusing into elementwise VPU ops. The scalar-expanded
variant computes identical algebra with explicit index arithmetic (no
jnp matmuls), which vmap turns into pure [n]-vector elementwise work.

Methodology: dependent chains (see profile_ba_large.py docstring) —
throughput timing over identical inputs overlaps dispatches and reads ~2x
fast on the remote backend.
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from pixsfm_tpu.base.cameras import img_from_cam_with_jac  # noqa: E402
from pixsfm_tpu.base.geometry import quat_to_rotmat  # noqa: E402
# the scalar-expanded form WON the A/B and is now the production
# implementation; the losing matmul form is kept here (only) for the probe
from pixsfm_tpu.base.projection import \
    project_with_jac as project_with_jac_scalar  # noqa: E402


def _skew(v):
    z = jnp.zeros((), v.dtype)
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z])])


def project_with_jac_matmul(model, cam_params, qvec, tvec, X, z_eps=1e-8):
    """The pre-round-5 production form: same algebra via [2,3]/[3,3] jnp
    matmuls (this is what vmap lowers to padded MXU dot_generals)."""
    R = quat_to_rotmat(qvec)
    RX = R @ X
    x_cam = RX + tvec
    z = x_cam[2]
    z = jnp.where(jnp.abs(z) < z_eps, z_eps, z)
    inv_z = 1.0 / z
    uv = x_cam[:2] * inv_z
    pix, J_uv, J_cam = img_from_cam_with_jac(model, cam_params, uv)
    duv_dxc = jnp.stack([
        jnp.stack([inv_z, jnp.zeros((), z.dtype), -uv[0] * inv_z]),
        jnp.stack([jnp.zeros((), z.dtype), inv_z, -uv[1] * inv_z])])
    A = J_uv @ duv_dxc
    J_w = -A @ _skew(RX)
    J_pose = jnp.concatenate([J_w, A], axis=1)
    J_X = A @ R
    return pix, J_pose, J_cam, J_X


def main(I=200, Np=500_000, track=4, obs_chunk=65536):
    model = "SIMPLE_RADIAL"
    rng = np.random.default_rng(0)
    # parity check
    q0 = rng.normal(0, 1, 4); q0 /= np.linalg.norm(q0)
    args0 = (jnp.asarray(np.r_[500.0, 320, 240, 0.03], jnp.float32),
             jnp.asarray(q0, jnp.float32),
             jnp.asarray(rng.normal(0, 1, 3), jnp.float32),
             jnp.asarray([0.3, -0.2, 4.0], jnp.float32))
    outs_a = jax.jit(lambda *a: project_with_jac_matmul(model, *a))(*args0)
    outs_b = jax.jit(lambda *a: project_with_jac_scalar(model, *a))(*args0)
    for oa, ob in zip(outs_a, outs_b):
        # the matmul form's jnp dots run at TPU default precision (bf16
        # operands on the MXU) — up to ~0.5% relative error; the scalar
        # form is full f32 on the VPU and is the MORE precise of the two
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                                   rtol=2e-2, atol=2e-2)
    print("parity OK (within MXU bf16 truncation of the matmul form)",
          flush=True)

    rfn, jfn, state0, obs, _ = bench.ba_large_problem(I, Np, track)
    O = int(obs.img_idx.shape[0])
    n_chunks = (O + obs_chunk - 1) // obs_chunk
    pad_O = n_chunks * obs_chunk
    ochunks = jnp.arange(pad_O, dtype=jnp.int32).reshape(n_chunks, obs_chunk)
    ochunks = jnp.minimum(ochunks, O - 1)

    def chain_ms(make_loop, label, lo=2, hi=12):
        ts = {}
        for n in (lo, hi):
            fn = make_loop(n)
            jax.block_until_ready(fn())
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn())
                best = min(best or 9e9, time.perf_counter() - t0)
            ts[n] = best
        ms = (ts[hi] - ts[lo]) / (hi - lo) * 1e3
        print(f"{label:44s} {ms:8.1f} ms/iter", flush=True)
        return ms

    def jac_fn_probe(impl):
        def per_obs(q, t, cm, x, xy):
            pix, Jp, Jc, JX = impl(model, cm, q, t, x)
            r = pix - xy
            return r, jnp.concatenate([Jp, Jc, JX], axis=1)

        def mk(n):
            @jax.jit
            def run():
                def chunk(cacc, ois):
                    q = state0.qvec[obs.img_idx[ois]]
                    t = state0.tvec[obs.img_idx[ois]]
                    cm = state0.cams[obs.cam_idx[ois]]
                    x = state0.xyz[obs.pt_idx[ois]] + cacc * 1e-30
                    r, J = jax.vmap(per_obs, out_axes=-1)(
                        q, t, cm, x, obs.obs_data[ois])
                    Ja = jnp.concatenate([J, r[:, None, :]], axis=1)
                    G = jnp.einsum("cin,cjn->ijn", Ja, Ja)
                    return cacc + jnp.sum(G), None

                def body(i, acc):
                    c, _ = jax.lax.scan(chunk, acc, ochunks)
                    return c
                return jax.lax.fori_loop(0, n, body,
                                         jnp.asarray(0.0, jnp.float32))
            return run
        return mk

    chain_ms(jac_fn_probe(project_with_jac_matmul), "jac+gram: matmul form")
    chain_ms(jac_fn_probe(project_with_jac_scalar), "jac+gram: scalar form")


if __name__ == "__main__":
    main()
