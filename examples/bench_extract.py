"""S2DNet dense-feature extraction throughput on the current backend.

Times the jitted forward at 480x640 for f32 and bf16 compute (weights +
activations cast; descriptors are consumed in bf16 storage downstream
anyway). Run manually on TPU: python examples/bench_extract.py
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
    from pixsfm_tpu.features.models.s2dnet import S2DNet

    H, W = 480, 640
    model = S2DNet({"num_layers": 1, "pretrained": None})

    def sync(x):
        return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

    @jax.jit
    def synth(key):
        return jax.random.uniform(key, (1, H, W, 3), jnp.float32)

    img = synth(jax.random.PRNGKey(0))
    img.block_until_ready()

    def measure_rtt():
        z = jnp.zeros(8)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync((z + 1.0,))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for dtype_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dtype_name)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
            model.variables)

        @jax.jit
        def forward(image, variables):
            x = image.astype(dt)
            from pixsfm_tpu.features.models.s2dnet import (IMAGENET_MEAN,
                                                           IMAGENET_STD)
            x = (x - IMAGENET_MEAN.astype(dt)) / IMAGENET_STD.astype(dt)
            feats = model.module.apply(variables, x)
            return [f.astype(jnp.float32) for f in feats]

        LOOP = 20

        @jax.jit
        def loop(image, variables):
            def body(i, acc):
                f = forward(image + acc * 1e-20, variables)
                return jnp.sum(f[0]) * 1e-20
            return jax.lax.fori_loop(0, LOOP, body, jnp.asarray(0.0))

        t0 = time.time()
        sync(loop(img, variables))
        print(f"{dtype_name}: first (incl compile) {time.time() - t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(loop(img, variables))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - measure_rtt()) / LOOP
        print(f"{dtype_name}: {per*1e3:7.2f} ms/image at {H}x{W} "
              f"({1/per:6.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
