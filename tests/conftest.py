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
