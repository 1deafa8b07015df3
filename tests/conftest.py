"""Test configuration.

Tests run on CPU with a faked 8-device mesh so multi-chip sharding logic is
exercised without TPU hardware (the reference has no distributed tests at all;
SURVEY.md §4 calls this out as a gap the build must fill).  Env vars must be
set before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def reference_available():
    """Whether the read-only reference checkout is mounted (for parity tests)."""
    return os.path.isdir("/root/reference")
