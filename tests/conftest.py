"""Test configuration: force an 8-device virtual CPU mesh before jax loads.

Multi-chip sharding tests run on virtual CPU devices
(xla_force_host_platform_device_count), per the project testing strategy.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the remote TPU
# tunnel (axon), which is slow to compile and uses bf16 matmul defaults —
# unit tests need the fast, deterministic host backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon already captured; override through the config API.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
