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
from pixsfm_tpu.base.projection import project_with_jac  # noqa: E402


def project_with_jac_scalar(model, cam_params, qvec, tvec, X):
    """Same contract as project_with_jac, no matmul-shaped ops."""
    w, x, y, z = qvec[0], qvec[1], qvec[2], qvec[3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    R = ((1.0 - (yy + zz), xy - wz, xz + wy),
         (xy + wz, 1.0 - (xx + zz), yz - wx),
         (xz - wy, yz + wx, 1.0 - (xx + yy)))
    X0, X1, X2 = X[0], X[1], X[2]
    RX = [R[i][0] * X0 + R[i][1] * X1 + R[i][2] * X2 for i in range(3)]
    xc = [RX[i] + tvec[i] for i in range(3)]
    zc = xc[2]
    zc = jnp.where(jnp.abs(zc) < 1e-8, 1e-8, zc)
    iz = 1.0 / zc
    u, v = xc[0] * iz, xc[1] * iz
    pix, J_uv, J_cam = img_from_cam_with_jac(model, cam_params,
                                             jnp.stack([u, v]))
    Juv = ((J_uv[0, 0], J_uv[0, 1]), (J_uv[1, 0], J_uv[1, 1]))
    # A = J_uv @ [[iz,0,-u iz],[0,iz,-v iz]]
    A = [[Juv[i][0] * iz, Juv[i][1] * iz,
          -(Juv[i][0] * u + Juv[i][1] * v) * iz] for i in range(2)]
    a, b, c = RX[0], RX[1], RX[2]
    # J_w = -A @ skew(RX); skew = [[0,-c,b],[c,0,-a],[-b,a,0]]
    Jw = [[-(A[i][1] * c - A[i][2] * b),
           -(-A[i][0] * c + A[i][2] * a),
           -(A[i][0] * b - A[i][1] * a)] for i in range(2)]
    JX = [[A[i][0] * R[0][j] + A[i][1] * R[1][j] + A[i][2] * R[2][j]
           for j in range(3)] for i in range(2)]
    J_pose = jnp.stack([jnp.stack(Jw[i] + A[i]) for i in range(2)])
    J_X = jnp.stack([jnp.stack(JX[i]) for i in range(2)])
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
    outs_a = jax.jit(lambda *a: project_with_jac(model, *a))(*args0)
    outs_b = jax.jit(lambda *a: project_with_jac_scalar(model, *a))(*args0)
    for oa, ob in zip(outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob),
                                   rtol=2e-5, atol=2e-5)
    print("parity OK", flush=True)

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

    chain_ms(jac_fn_probe(project_with_jac), "jac+gram: matmul form")
    chain_ms(jac_fn_probe(project_with_jac_scalar), "jac+gram: scalar form")


if __name__ == "__main__":
    main()
