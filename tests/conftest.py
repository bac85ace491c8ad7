"""Test config: run everything on CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the driver
separately dry-runs the multi-chip path); the real-TPU numbers come from
bench.py, not the test suite.  Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin registers itself from sitecustomize before conftest
# runs, overriding JAX_PLATFORMS — force the platform back via jax.config.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA-CPU compile cache: the interpret-mode Pallas kernel
# tests are compile-dominated (~90 s per distinct kernel config, ~50 ms
# execution), and the suite re-runs identical programs every invocation.
# First run pays the compiles; re-runs load from the temp dir.  The dir
# is namespaced by user: on a multi-user box a world-shared path can be
# owned by someone else, silently degrading to full recompiles.
import getpass
import tempfile

_cache_dir = os.path.join(
    tempfile.gettempdir(), f"legmov_jax_cache-{getpass.getuser()}"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 4.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
