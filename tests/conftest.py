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

# Persistent compilation cache: the suite's wall time is dominated by XLA CPU
# compiles of many distinct tiny programs; caching them makes repeat runs
# (the common case when iterating) start warm.  Keyed per backend, see
# fsvid2vid_tpu/cache.py.
from fsvid2vid_tpu.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import resource

# XLA's CPU compiler recurses deeply on the big fused programs in this suite;
# with the container's default stack limit a long single-process run can
# segfault in backend_compile_and_load.  Allow the main stack to grow.
try:
    resource.setrlimit(resource.RLIMIT_STACK,
                       (resource.RLIM_INFINITY, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked @pytest.mark.slow (>60s on one CPU)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow test; re-run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Drop compiled executables between test modules to bound memory over
    the full suite (dozens of large CPU programs accumulate otherwise)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
