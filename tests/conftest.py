"""Test configuration: CPU backend with 8 virtual devices.

Multi-chip sharding behavior is validated on a simulated mesh, the
single-host analogue of a TPU slice (SURVEY.md §4: `XLA_FLAGS=
--xla_force_host_platform_device_count=N`).

Note: plain `JAX_PLATFORMS=cpu` is not enough in this environment — a
site hook pre-registers the remote TPU backend — so we force the platform
through jax.config before any computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("RAINIER_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def require_devices(n: int):
    """Skip when the attached backend has fewer than n devices (mesh
    tests run on the 8-virtual-device CPU CI config; a single real TPU
    chip legitimately cannot shard)."""
    if jax.device_count() < n:
        pytest.skip(f"needs >= {n} devices "
                    f"(have {jax.device_count()})")


def require_cpu():
    """Skip on non-CPU backends: bit-pinned goldsets and f64 oracle
    comparisons are defined on the deterministic CPU backend only."""
    if jax.default_backend() != "cpu":
        pytest.skip("CPU-backend-pinned test (bit determinism / f64 "
                    "oracle)")
