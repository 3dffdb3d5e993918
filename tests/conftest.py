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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
