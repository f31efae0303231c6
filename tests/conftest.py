"""Test harness setup: force an 8-device virtual CPU mesh.

JAX's standard fake-backend mechanism for testing pjit/shard_map without real
TPU hardware. Must run before jax initializes its backends, hence the env
vars are set at import time of conftest (pytest imports it before tests).
"""

import os

# Force CPU even if the environment pre-sets a TPU platform (e.g. axon):
# tests must be hardware-independent and use the virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep test numerics deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Full-precision matmuls for golden-parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax

# The environment's TPU plugin (axon) ignores the JAX_PLATFORMS env var, so
# force the platform through the config API before any backend is touched.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
