"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4: the rebuild
tests multi-host behavior on a single host by faking mesh axes)."""

import os

# Force the CPU backend with 8 virtual devices. Note: a sitecustomize module
# may have imported jax already (registering an experimental TPU plugin), so
# setting JAX_PLATFORMS in os.environ is NOT enough — jax.config must be
# updated explicitly, or every dispatch silently routes through the TPU
# tunnel at ~50ms per host sync.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The 1-second liveness deadline the reference enforces per integration test
# (pipe_test.go:16-18). Compilation on CPU is slower than Go, so scale up,
# but keep a hard ceiling so hangs fail rather than stall CI.
PIPE_TIMEOUT = 60.0


@pytest.fixture
def pipe_timeout():
    return PIPE_TIMEOUT


@pytest.fixture
def rng():
    return np.random.default_rng(42)
