"""Probe: fused Pallas Schur-term matvec vs the XLA chunked-einsum path.

Dependent-chain methodology (docs/ba_throughput.md): n matvecs inside one
jitted fori_loop where iteration i+1's input is perturbed by iteration i's
output; timed at n=2 vs n=12 and differenced, so overlap across independent
dispatches cannot flatter the number. Bench shape: I=200, Np=500k, T=4,
NR=10 (6 pose + 4 SIMPLE_RADIAL), O=2M — the ba_large bench problem."""

import functools
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pixsfm_tpu.ops import schur_pallas as sp  # noqa: E402

HI = jax.lax.Precision.HIGHEST


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
    print(f"{label:52s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main(I=200, Np=500_000, T=4, NR=10, Nc=1, k=4):
    O = Np * T
    rng = np.random.default_rng(0)
    img_np = ((rng.integers(0, I, Np)[:, None] + np.arange(T)[None]) % I
              ).astype(np.int32).reshape(-1)
    cam_np = np.zeros(O, np.int32)
    Bt = jnp.asarray(rng.normal(size=(NR * 3, O)).astype(np.float32))
    Vinv = jnp.asarray((rng.normal(size=(3, 3, Np)) * 0.1
                        ).astype(np.float32))
    vp0 = jnp.asarray(rng.normal(size=(I, 6)).astype(np.float32))
    vc0 = jnp.asarray(rng.normal(size=(Nc, k)).astype(np.float32))

    img_j = jnp.asarray(img_np)
    cam_j = jnp.asarray(cam_np)

    @functools.partial(jax.jit, static_argnames=("tile",))
    def pack(b, im, cm, vi, tile):
        return sp.pack_grid_blocks(b, im, cm, vi, T, tile=tile)

    for tile in (1024, 2048, 4096):
        Btr, img_r, cam_r, Vi, Ppad = pack(Bt, img_j, cam_j, Vinv, tile=tile)

        @functools.partial(jax.jit, static_argnames=("n", "tile"))
        def run_chain(Btr, img_r, cam_r, Vi, vp_i, vc_i, n, tile):
            def body(_, vv):
                vp, vc = vv
                up, uc = sp.schur_term_matvec(
                    vp.T, vc.T, Btr, img_r, cam_r, Vi,
                    T=T, I=I, Nc=Nc, k=k, tile=tile)
                return (vp + 1e-6 * up.T, vc + 1e-6 * uc.T)
            return jax.lax.fori_loop(0, n, body, (vp_i, vc_i))

        def make_loop(n, tile=tile, Btr=Btr, img_r=img_r, cam_r=cam_r,
                      Vi=Vi, rc=run_chain):
            return lambda: rc(Btr, img_r, cam_r, Vi, vp0, vc0,
                              n=n, tile=tile)
        chain_ms(make_loop, f"pallas fused matvec tile={tile}")

    # timing of the one-time repack (amortized once per LM iteration)
    jax.block_until_ready(pack(Bt, img_j, cam_j, Vinv, tile=2048))
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(pack(Bt, img_j, cam_j, Vinv, tile=2048))
    print(f"{'pack_grid_blocks (once per LM iter)':52s} "
          f"{(time.perf_counter() - t0) / 5 * 1e3:8.3f} ms", flush=True)

    # numeric cross-check vs the jnp oracle
    Btr, img_r, cam_r, Vi, Ppad = pack(Bt, img_j, cam_j, Vinv, tile=2048)
    up, uc = sp.schur_term_matvec(vp0.T, vc0.T, Btr, img_r, cam_r, Vi,
                                  T=T, I=I, Nc=Nc, k=k, tile=2048)
    up_r, uc_r = sp.schur_term_matvec_ref(vp0.T, vc0.T, Btr, img_r,
                                          cam_r, Vi)
    err = float(jnp.max(jnp.abs(up - up_r)) / jnp.max(jnp.abs(up_r)))
    print(f"max rel err vs jnp oracle: {err:.2e}")


if __name__ == "__main__":
    main()
