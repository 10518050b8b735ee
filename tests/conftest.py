"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the reference tests
its "multi-node" Flight paths with an in-process mock server the same way,
arrow-flight/tests/common/server.rs); real-TPU benchmarking happens in
bench.py, not under pytest.

Must run before jax initializes.  NOTE: in this image the axon TPU plugin
ignores JAX_PLATFORMS / JAX_PLATFORM_NAME set via os.environ after process
start; jax.config.update('jax_platform_name', 'cpu') is the reliable
selector, combined with the XLA_FLAGS host-device-count flag which must be
in place before the CPU client initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Restrict platform DISCOVERY to cpu (not just selection): when the axon
# tunnel is unhealthy, initializing its backend at all hangs in retry
# sleeps, stalling the whole CPU-only suite at collection time.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
