"""Test configuration.

Tests run on CPU with a faked 8-device mesh so multi-chip sharding logic is
exercised without TPU hardware (the reference has no distributed tests at all;
SURVEY.md §4 calls this out as a gap the build must fill).

NB: this environment's sitecustomize imports jax at interpreter startup, so
setting JAX_PLATFORMS via os.environ here is too late.  Backends are still
uninitialized at that point, so ``jax.config.update`` + XLA_FLAGS works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; backend was initialized before conftest "
        f"(got {jax.default_backend()})"
    )
    assert jax.device_count() == 8


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def reference_available():
    """Whether the read-only reference checkout is mounted (for parity tests)."""
    return os.path.isdir("/root/reference")
