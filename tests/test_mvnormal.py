"""MVNormal (reference roadmap item, implemented here)."""

import numpy as np
from scipy import stats

import rainier_tpu as rt
from rainier_tpu.compute import Evaluator
from rainier_tpu.core.mvnormal import MVNormal


COV = np.array([[2.0, 0.6], [0.6, 1.0]])


def test_density_matches_scipy():
    mv = MVNormal([0.5, -0.5], COV)
    x = np.array([[1.0, 0.3], [-0.2, 0.8], [3.0, -2.0]])
    got = Evaluator().to_double(mv.log_density(x))
    want = stats.multivariate_normal([0.5, -0.5], COV).logpdf(x).sum()
    assert abs(got - want) < 1e-5


def test_symbolic_density():
    mv = MVNormal([0.0, 0.0], COV)
    got = Evaluator().to_double(
        mv.log_density_at([rt.const(0.7), rt.const(-0.3)]))
    want = stats.multivariate_normal([0, 0], COV).logpdf([0.7, -0.3])
    assert abs(got - want) < 1e-6


def test_latent_vec_prior_is_mvn():
    """Prior-only model over the correlated latent block must produce the
    target MVN moments."""
    lat = MVNormal([1.0, 2.0], COV).latent_vec()
    m = rt.Model.track_(set(lat.to_list()))
    tr = m.sample(rt.SamplerConfig(400, 1500, sampler=rt.HMC(8)),
                  n_chains=2, seed=0)
    a = tr.evaluate(lat[0])
    b = tr.evaluate(lat[1])
    assert abs(a.mean() - 1.0) < 0.2
    assert abs(b.mean() - 2.0) < 0.2
    corr = np.corrcoef(a, b)[0, 1]
    want = COV[0, 1] / np.sqrt(COV[0, 0] * COV[1, 1])
    assert abs(corr - want) < 0.12


def test_generator_moments():
    import jax

    g = MVNormal([3.0, -1.0], COV).generator()
    draws = np.asarray(jax.vmap(lambda k: g.get(k))(
        jax.random.split(jax.random.PRNGKey(0), 5000)))
    assert np.all(np.abs(draws.mean(0) - [3.0, -1.0]) < 0.1)
    emp = np.cov(draws.T)
    assert np.all(np.abs(emp - COV) < 0.15)
