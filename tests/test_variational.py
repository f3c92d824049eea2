"""ADVI tests (new capability vs reference)."""

import numpy as np

import rainier_tpu as rt
from rainier_tpu.variational import advi


def test_advi_mean_field_recovers_posterior():
    rng = np.random.default_rng(3)
    data = rng.normal(2.0, 1.5, size=300)
    mu = rt.Normal(0, 10).latent()
    sigma = rt.Exponential(1.0).latent()
    m = rt.Model.observe(list(data), rt.Normal(mu, sigma))
    vp = advi(m, n_steps=1200, learning_rate=0.05, seed=0)
    assert abs(vp.mean(mu) - data.mean()) < 0.15
    assert abs(vp.mean(sigma) - data.std()) < 0.2
    assert vp.elbo_trace[-1] > vp.elbo_trace[0]


def test_advi_full_rank_captures_correlation():
    # y = a + b with weak data: a and b strongly anticorrelated
    rng = np.random.default_rng(1)
    data = rng.normal(1.0, 0.5, size=50)
    a = rt.Normal(0, 2).latent()
    b = rt.Normal(0, 2).latent()
    m = rt.Model.observe(list(data), rt.Normal(a + b, 0.5))
    vp = advi(m, n_steps=1500, full_rank=True, seed=0)
    draws = vp.sample(4000)
    corr = np.corrcoef(draws[:, 0], draws[:, 1])[0, 1]
    assert corr < -0.5, corr
    # sum still matches the data mean
    s = vp.evaluate(a + b, n_draws=2000)
    assert abs(np.mean(s) - 1.0) < 0.2
