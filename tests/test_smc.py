"""Tempered-SMC tests: resampling kernel, conjugate-posterior moments,
analytic evidence, and the sharded-particle path on the virtual mesh.

No reference counterpart (stripe/rainier is HMC-only); acceptance is
analytic ground truth, in the spirit of the reference's
sampler-in-isolation moment tests (LeapFrogTest.scala:15-79)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rainier_tpu as rt
from rainier_tpu.parallel import make_mesh
from rainier_tpu.sampler.smc import (SMCConfig, run_smc, smc,
                                     systematic_resample)

from conftest import require_cpu, require_devices  # noqa: E402


def test_systematic_resample_concentrated():
    log_w = jnp.full((64,), -jnp.inf).at[17].set(0.0)
    idx = systematic_resample(jax.random.PRNGKey(0), log_w, 64)
    assert np.all(np.asarray(idx) == 17)


def test_systematic_resample_uniform_counts():
    n = 256
    log_w = jnp.zeros((n,))
    idx = np.asarray(systematic_resample(jax.random.PRNGKey(1), log_w, n))
    counts = np.bincount(idx, minlength=n)
    # systematic resampling of uniform weights keeps every particle once
    assert np.all(counts == 1)


def test_systematic_resample_proportional():
    # two particles at weight ratio 3:1 → counts ≈ 3:1 exactly under
    # systematic resampling (low-variance property)
    # one systematic draw is deterministic given u0 (aliasing on periodic
    # weights is expected); unbiasedness holds over the uniform offset
    n = 64
    log_w = jnp.log(jnp.array([3.0, 1.0] * (n // 2)) / (2.0 * n))
    fracs = []
    for k in range(40):
        idx = np.asarray(
            systematic_resample(jax.random.PRNGKey(k), log_w, n))
        fracs.append(np.isin(idx, np.arange(0, n, 2)).mean())
    assert abs(np.mean(fracs) - 0.75) < 0.08


@pytest.fixture(scope="module")
def conjugate():
    rng = np.random.default_rng(3)
    ys = (1.5 + rng.normal(size=20)).tolist()
    mu = rt.Normal(0, 1).latent()
    model = rt.Model.observe(ys, rt.Normal(mu, 1))
    n = len(ys)
    post_prec = 1.0 + n
    post_mean = float(np.sum(ys) / post_prec)
    # evidence: y ~ N(0, I + 11ᵀ)
    y = np.array(ys)
    cov = np.eye(n) + np.ones((n, n))
    sign, logdet = np.linalg.slogdet(cov)
    log_z = float(-0.5 * (y @ np.linalg.solve(cov, y))
                  - 0.5 * logdet - 0.5 * n * np.log(2 * np.pi))
    return model, post_mean, 1.0 / post_prec, log_z


def test_smc_conjugate_posterior_and_evidence(conjugate):
    model, post_mean, post_var, log_z = conjugate
    trace, res = model.smc(
        SMCConfig(n_particles=2048, mutation_steps=3), seed=0)
    draws = trace.flat()[:, 0]
    assert abs(draws.mean() - post_mean) < 0.05
    assert abs(draws.var() - post_var) < 0.02
    assert abs(float(res.log_evidence) - log_z) < 0.5
    assert int(res.n_stages) >= 2
    assert np.all(np.isfinite(draws))


def test_smc_trace_integration(conjugate):
    model, post_mean, _, _ = conjugate
    trace, res = model.smc(SMCConfig(n_particles=1024), seed=4)
    # pseudo-chain diagnostics are defined and healthy (exchangeable draws)
    d = trace.diagnostics()
    assert d[0].r_hat < 1.05
    assert int(res.n_stages) <= 100


def test_run_smc_standalone_density():
    # sampler-layer independence: any logp callable works (the analogue
    # of the reference's hand-written NormalDensityFunction)
    def logp(q):
        return -0.5 * jnp.sum(q * q)

    res = run_smc(logp, 3, SMCConfig(n_particles=1024, mutation_steps=2),
                  seed=1)
    q = np.asarray(res.particles)
    assert abs(q.mean()) < 0.1
    assert abs(q.var() - 1.0) < 0.15
    # ∫exp(−½‖q‖²)dq = (2π)^{d/2} ⇒ log Z = (3/2)·log 2π
    assert abs(float(res.log_evidence) - 1.5 * np.log(2 * np.pi)) < 0.2


def test_smc_sharded_mesh(conjugate):
    require_devices(2)
    model, post_mean, post_var, log_z = conjugate
    mesh = make_mesh(n_chain_shards=8, n_data_shards=1)
    trace, res = smc(model, SMCConfig(n_particles=2048, mutation_steps=2),
                     seed=5, mesh=mesh)
    draws = trace.flat()[:, 0]
    assert abs(draws.mean() - post_mean) < 0.06
    assert abs(float(res.log_evidence) - log_z) < 0.6
