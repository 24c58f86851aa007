"""Test harness config: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware.

Note: this environment's sitecustomize registers an `axon` TPU backend and
forces jax_platforms at import time, so the env var alone is not enough —
we override via jax.config before any backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
