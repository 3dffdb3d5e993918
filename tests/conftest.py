"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are validated on
virtual CPU devices (the driver separately dry-runs ``__graft_entry__.dryrun_multichip``).

Note: the environment force-registers a remote TPU backend ("axon") and pins
``JAX_PLATFORMS=axon`` programmatically, so the platform override must go through
``jax.config`` *after* importing jax — env vars alone are ignored.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# No persistent compilation cache in tests: XLA:CPU AOT entries are
# machine-specific — loading a cache warmed on a different host logs
# "Machine type used for XLA:CPU compilation doesn't match ... could lead
# to execution errors such as SIGILL" (observed in bench_err.log r03, and
# the round-3 suite died once with a segfault inside XLA-CPU). bench.py
# guards its cache with a host-identity stamp; tests simply never use one.
jax.config.update("jax_compilation_cache_dir", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
