"""Fused-HMC Pallas kernel tests.

The kernel uses the TPU on-core PRNG (pltpu.prng_seed/prng_random_bits),
which has no CPU interpreter lowering — these tests run only when a real
TPU is attached (the bench driver exercises them every round; CPU CI
covers the XLA sampler path instead).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _has_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _has_tpu(),
                                reason="requires TPU (on-core PRNG)")


def test_fused_hmc_standard_normal_moments():
    from rainier_tpu.ops import fused_hmc

    def lp(q):
        return -0.5 * jnp.sum(q * q, axis=0)

    q0 = jnp.zeros((3, 512))
    _, samples, acc = fused_hmc(lp, q0, step_size=0.9, n_steps=5,
                                n_iterations=800, seed=0, collect_every=1,
                                block_chains=256)
    s = np.asarray(samples)[200:]
    assert 0.5 < float(np.mean(acc)) <= 1.0
    assert np.all(np.abs(s.mean(axis=(0, 2))) < 0.1)
    assert np.all(np.abs(s.std(axis=(0, 2)) - 1.0) < 0.1)


def test_fused_hmc_diag_mass_standardization():
    from rainier_tpu.ops import fused_hmc

    # NB: lp_fn must not close over device arrays (pallas kernels reject
    # captured constants); per-row scalar arithmetic instead
    scales = [0.5, 2.0, 8.0]

    def lp(q):
        return -0.5 * jnp.sum(
            (q[0:1] / scales[0]) ** 2 + (q[1:2] / scales[1]) ** 2
            + (q[2:3] / scales[2]) ** 2, axis=0)

    q0 = jnp.zeros((3, 512))
    _, samples, acc = fused_hmc(
        lp, q0, step_size=0.9, n_steps=5, n_iterations=800, seed=1,
        inv_mass_diag=np.asarray(scales) ** 2, collect_every=1,
        block_chains=256)
    s = np.asarray(samples)[200:]
    ratio = s.std(axis=(0, 2)) / np.asarray(scales)
    assert np.all(np.abs(ratio - 1.0) < 0.12), ratio


def test_fused_hmc_funnel_matches_xla_driver():
    from rainier_tpu.ops import fused_hmc

    def lp(q):
        y = q[0:1]
        x = q[1:10]
        return (-0.5 * (y / 3.0) ** 2 - 0.5 * jnp.sum(
            x * x * jnp.exp(-y), axis=0, keepdims=True) - 4.5 * y)[0]

    q0 = jnp.zeros((10, 1024))
    _, samples, acc = fused_hmc(lp, q0, step_size=0.18, n_steps=5,
                                n_iterations=2000, seed=2,
                                collect_every=2, block_chains=512)
    y = np.asarray(samples)[300:, 0, :]
    assert abs(y.mean()) < 0.35
    # centered-funnel fixed-step HMC under-explores the neck (known
    # pathology; the driver's adapted/non-centered paths recover 3.0):
    # accept a broad band — the kernel mechanics are what's under test
    assert 2.0 < y.std() < 3.6
