"""Test harness: force a local 8-device virtual CPU platform so multi-chip
sharding is exercised without TPU hardware (SURVEY §4: the TPU answer to
testing multi-node without a cluster).

Note: the environment's sitecustomize registers a remote TPU backend and
overrides JAX_PLATFORMS, so we must force CPU via jax.config *after* import —
otherwise every test compile goes through the TPU tunnel.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
