"""Capture an XLA device trace of the KA chunk solve and print the top HLO ops.

Usage: python examples/trace_ka.py [outdir]. Parses the xplane with
tensorboard_plugin_profile (hlo_stats) and aggregates self-time by op.
"""

import glob
import gzip
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import _enable_compile_cache, build_workload


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ka_trace"
    P, K = 128, 48
    problems, patches = build_workload(P=P, K=K)

    from pixsfm_tpu.base.interpolation import InterpolationConfig
    from pixsfm_tpu.base.losses import RobustLoss
    from pixsfm_tpu.keypoint_adjustment.solver import (_compiled_ka_chunk,
                                                       _interp_key)
    from pixsfm_tpu.ops.lm import LMOptions

    interp = InterpolationConfig(mode="BICUBIC", l2_normalize=True)
    loss = RobustLoss("cauchy", [0.25])
    run = _compiled_ka_chunk(
        _interp_key(interp), (loss.name, tuple(loss.params), loss.scale),
        LMOptions(max_iterations=100, parameter_tolerance=1e-5), K)

    staged = jnp.asarray(patches)
    x0 = jnp.asarray(problems.kp0.reshape(P, K * 2).astype(np.float32))
    data = tuple(jnp.asarray(a) for a in (
        problems.patch_row, problems.corner, problems.scale, problems.ups,
        problems.edge_i, problems.edge_j, problems.edge_w))
    kp_free = jnp.asarray(problems.kp_free)
    lower = jnp.asarray(np.nan_to_num(problems.lower, neginf=-1e30)
                        .astype(np.float32))
    upper = jnp.asarray(np.nan_to_num(problems.upper, posinf=1e30)
                        .astype(np.float32))
    pmask = jnp.asarray(np.ones(P, bool))
    args = (staged, x0, data, kp_free, lower, upper, pmask)

    def sync(out):
        return float(np.asarray(out[0])[0, 0])

    sync(run(*args))  # compile/warm
    with jax.profiler.trace(outdir):
        sync(run(*args))
    print("trace captured", flush=True)

    pbs = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    print("xplanes:", pbs, flush=True)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data_out, _ = rtd.xspace_to_tool_data(pbs, "hlo_stats", {})
    if isinstance(data_out, bytes):
        data_out = data_out.decode()
    out_path = outdir + "/hlo_stats.json"
    open(out_path, "w").write(data_out)
    stats = json.loads(data_out)
    # gviz table: cols + rows
    cols = [c["label"] for c in stats[0]["cols"]] if isinstance(stats, list) \
        else [c["label"] for c in stats["cols"]]
    rows = (stats[0]["rows"] if isinstance(stats, list) else stats["rows"])
    i_cat = next((i for i, c in enumerate(cols) if "category" in c.lower()), None)
    i_self = next((i for i, c in enumerate(cols)
                   if "self" in c.lower() and "time" in c.lower()
                   and "%" not in c), None)
    i_name = next((i for i, c in enumerate(cols) if "name" in c.lower()), 0)
    print("columns:", cols, flush=True)
    agg = {}
    for r in rows:
        c = r["c"]
        cat = c[i_cat]["v"] if i_cat is not None else "?"
        t = float(c[i_self]["v"]) if i_self is not None else 0.0
        agg[cat] = agg.get(cat, 0.0) + t
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v:12.1f}  {k}")


if __name__ == "__main__":
    main()
