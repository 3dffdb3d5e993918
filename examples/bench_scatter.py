"""Measure TPU segment-reduction strategies for the BA eval.

The BA normal-equation assembly reduces per-observation blocks into
per-image/per-camera/per-point accumulators. Candidates:
  a. x.at[idx].add(blocks)                  (current: XLA scatter-add)
  b. same with indices_are_sorted=True      (sorted obs)
  c. one-hot einsum: onehot[S, n] @ blocks  (MXU matmul)
Run manually: python examples/bench_scatter.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache

    _enable_compile_cache()

    n = 8192          # chunk size
    LOOP = 200

    def sync(x):
        return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

    z = jnp.zeros(8)
    sync(z)

    def measure_rtt():
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(z + 1.0)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def timeit(fn, *args):
        sync(fn(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(*args))
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - measure_rtt(), 1e-7) / LOOP

    rng = np.random.default_rng(0)
    for S, bshape, label in [(40, (6, 6), "img Hpp [40]x(6,6)"),
                             (2000, (3, 3), "pt V [2000]x(3,3)"),
                             (2000, (3,), "pt gx [2000]x(3,)"),
                             (20000, (3, 3), "pt V [20000]x(3,3)")]:
        idx_sorted = np.sort(rng.integers(0, S, n)).astype(np.int32)
        idx_rand = rng.permutation(idx_sorted)
        blocks = rng.normal(0, 1, (n,) + bshape).astype(np.float32)
        bj, ij_r, ij_s = (jnp.asarray(blocks), jnp.asarray(idx_rand),
                          jnp.asarray(idx_sorted))

        @jax.jit
        def scatter(idx, blocks):
            def body(i, acc):
                return acc.at[idx].add(blocks * (1.0 + 1e-9 * acc[0].ravel()
                                                 [0]))
            return jax.lax.fori_loop(
                0, LOOP, body, jnp.zeros((S,) + bshape, jnp.float32))

        @jax.jit
        def scatter_sorted(idx, blocks):
            def body(i, acc):
                return acc.at[idx].add(
                    blocks * (1.0 + 1e-9 * acc[0].ravel()[0]),
                    indices_are_sorted=True)
            return jax.lax.fori_loop(
                0, LOOP, body, jnp.zeros((S,) + bshape, jnp.float32))

        @jax.jit
        def onehot_mm(idx, blocks):
            flat = blocks.reshape(n, -1)
            oh = (idx[None, :] == jnp.arange(S, dtype=jnp.int32)[:, None]
                  ).astype(jnp.float32)

            def body(i, acc):
                f = flat * (1.0 + 1e-9 * acc.ravel()[0])
                return acc + jnp.dot(oh, f,
                                     preferred_element_type=jnp.float32)
            out = jax.lax.fori_loop(
                0, LOOP, body, jnp.zeros((S, flat.shape[1]), jnp.float32))
            return out.reshape((S,) + bshape)

        t_a = timeit(scatter, ij_r, bj)
        t_b = timeit(scatter_sorted, ij_s, bj)
        t_c = timeit(onehot_mm, ij_r, bj)
        print(f"{label:22s} scatter {t_a*1e6:8.1f} us | sorted "
              f"{t_b*1e6:8.1f} us | one-hot mm {t_c*1e6:8.1f} us",
              flush=True)


if __name__ == "__main__":
    main()
