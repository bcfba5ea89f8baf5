"""Test harness: force an 8-virtual-device CPU backend (SURVEY §4) so
data-parallel sharding, global-batch BN and the k-means collectives are
exercised without a TPU pod. Must run before jax initializes."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some pytest entry-point plugins import jax before this conftest runs; the
# env vars above are then too late for the platform choice (tests would
# silently run on the TPU with bf16-default matmuls). The backend client is
# not created until first use, so forcing the config here still works.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(3407)
