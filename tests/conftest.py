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

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
