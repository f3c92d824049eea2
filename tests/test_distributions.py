"""Distribution densities vs scipy, bounds validation, latent transforms.

The scipy cross-checks play the role of the reference function `d` in the
four-way oracle (RealTest.scala:22-37 checks distribution log-densities for
Normal/Poisson/Gamma against hand-written forms; scipy is stronger)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import rainier_tpu as rt
from rainier_tpu.compute import Evaluator, real as R


EV = Evaluator()


def d(graph):
    return EV.to_double(graph)


CASES = [
    ("normal", rt.Normal(1.0, 2.0), 0.3, stats.norm.logpdf(0.3, 1, 2)),
    ("gamma", rt.Gamma(2.0, 3.0), 1.7, stats.gamma.logpdf(1.7, 2, scale=3)),
    ("beta", rt.Beta(2.0, 5.0), 0.3, stats.beta.logpdf(0.3, 2, 5)),
    ("exponential", rt.Exponential(2.0), 0.9,
     stats.expon.logpdf(0.9, scale=0.5)),
    ("lognormal", rt.LogNormal(0.5, 1.5), 2.0,
     stats.lognorm.logpdf(2.0, 1.5, scale=math.exp(0.5))),
    ("uniform", rt.Uniform(2.0, 5.0), 3.0, stats.uniform.logpdf(3.0, 2, 3)),
    ("cauchy", rt.Cauchy(1.0, 2.0), 0.3, stats.cauchy.logpdf(0.3, 1, 2)),
    ("laplace", rt.Laplace(1.0, 2.0), 0.3, stats.laplace.logpdf(0.3, 1, 2)),
    ("poisson", rt.Poisson(3.5), 4.0, stats.poisson.logpmf(4, 3.5)),
    ("binomial", rt.Binomial(0.3, 10.0), 4.0, stats.binom.logpmf(4, 10, 0.3)),
    ("geometric", rt.Geometric(0.3), 4.0, stats.geom.logpmf(5, 0.3)),
    ("negbinomial", rt.NegativeBinomial(0.3, 5.0), 4.0,
     stats.nbinom.logpmf(4, 5, 0.7)),
    ("betabinomial", rt.BetaBinomial(2.0, 3.0, 10.0), 4.0,
     stats.betabinom.logpmf(4, 10, 2, 3)),
    ("bernoulli", rt.Bernoulli(0.3), 1.0, math.log(0.3)),
]


@pytest.mark.parametrize("name,dist,x,want", CASES,
                         ids=[c[0] for c in CASES])
def test_log_density_matches_scipy(name, dist, x, want):
    got = d(dist.log_density_at(R.const(x)))
    assert abs(got - want) < 1e-6 * max(1.0, abs(want))


def test_mixture_density():
    mix = rt.Mixture({rt.Normal(0.0, 1.0): 0.3, rt.Normal(3.0, 2.0): 0.7})
    got = d(mix.log_density_at(R.const(1.0)))
    want = math.log(0.3 * stats.norm.pdf(1, 0, 1) +
                    0.7 * stats.norm.pdf(1, 3, 2))
    assert abs(got - want) < 1e-6


def test_discrete_mixture_zero_inflated():
    zi = rt.Poisson(2.0).zero_inflated(0.3)
    got0 = d(zi.log_density_at(R.const(0.0)))
    want0 = math.log(0.3 + 0.7 * stats.poisson.pmf(0, 2.0))
    assert abs(got0 - want0) < 1e-6
    got2 = d(zi.log_density_at(R.const(2.0)))
    want2 = math.log(0.7 * stats.poisson.pmf(2, 2.0))
    assert abs(got2 - want2) < 1e-6


def test_multinomial_density():
    m = rt.Multinomial({"a": 0.2, "b": 0.3, "c": 0.5}, 10.0)
    got = d(m.log_density_at({"a": 2.0, "b": 3.0, "c": 5.0}))
    want = stats.multinomial.logpmf([2, 3, 5], 10, [0.2, 0.3, 0.5])
    assert abs(got - want) < 1e-6


def test_bounds_check_raises():
    with pytest.raises(ValueError):
        rt.Normal(0.0, -1.0)
    with pytest.raises(ValueError):
        rt.Bernoulli(1.5)
    with pytest.raises(ValueError):
        rt.Poisson(-2.0)


def test_beta_parameterizations():
    b = rt.Beta.mean_and_precision(0.3, 10.0)
    assert abs(d(b.a) - 3.0) < 1e-9 and abs(d(b.b) - 7.0) < 1e-9
    b2 = rt.Beta.mean_and_variance(0.3, 0.01)
    mean = d(b2.a) / (d(b2.a) + d(b2.b))
    assert abs(mean - 0.3) < 1e-9


@pytest.mark.parametrize("dist,logpdf", [
    (rt.Normal(0.5, 2.0), lambda v: stats.norm.logpdf(v, 0.5, 2)),
    (rt.Exponential(1.5), lambda v: stats.expon.logpdf(v, scale=1 / 1.5)),
    (rt.Beta(2.0, 3.0), lambda v: stats.beta.logpdf(v, 2, 3)),
    (rt.Uniform(1.0, 4.0), lambda v: stats.uniform.logpdf(v, 1, 3)),
    (rt.LogNormal(0.2, 0.8),
     lambda v: stats.lognorm.logpdf(v, 0.8, scale=math.exp(0.2))),
    (rt.Gamma(2.0, 0.5), lambda v: stats.gamma.logpdf(v, 2, scale=0.5)),
], ids=["normal", "exponential", "beta", "uniform", "lognormal", "gamma"])
def test_latent_prior_is_change_of_variables(dist, logpdf):
    """Compiled prior-only logp(q) must equal
    logpdf(transform(q)) + log|d transform/dq| — the automatic
    unconstraining transform of core/Continuous.scala:27-34."""
    x = dist.latent()
    model = rt.Model.track_({x})
    cd = model.density()
    assert cd.n_vars == 1
    eps = 1e-4
    for q in [-1.3, -0.2, 0.0, 0.7, 1.9]:
        ev_hi = Evaluator({cd.parameters[0]: q + eps})
        ev_lo = Evaluator({cd.parameters[0]: q - eps})
        ev = Evaluator({cd.parameters[0]: q})
        t = ev.to_double(x)
        jac = (ev_hi.to_double(x) - ev_lo.to_double(x)) / (2 * eps)
        want = logpdf(t) + math.log(abs(jac))
        got = float(cd.logp(jnp.asarray([q])))
        assert abs(got - want) < 2e-3, (q, got, want)


@pytest.mark.parametrize("dist", [rt.Normal(0.0, 2.0), rt.Gamma(2.0, 1.5),
                                  rt.Beta(2.0, 3.0)],
                         ids=["normal", "gamma", "beta"])
def test_latent_vec_matches_scalar_latents(dist):
    """latent_vec(k) (one VectorParameter leaf) must produce the same
    unconstrained density as k scalar latents at the same point."""
    vec = dist.latent_vec(3)
    m = rt.Model.track_(set(vec.to_list()))
    cd = m.density()
    assert cd.n_vars == 3

    scalars = [dist.latent() for _ in range(3)]
    m2 = rt.Model.track_(set(scalars))
    cd2 = m2.density()
    assert cd2.n_vars == 3

    q = jnp.asarray([0.1, -0.5, 1.2])
    got = float(cd.logp(q))
    want = float(cd2.logp(q))
    assert abs(got - want) < 1e-4


def test_injection_scale_translate_exp_support():
    g = rt.Gamma.standard(2.0)
    scaled = g.scale(2.0)
    assert isinstance(scaled.support, rt.core.support.BoundedBelowSupport)
    e = rt.Normal(0.0, 1.0).exp()
    assert isinstance(e.support, rt.core.support.BoundedBelowSupport)


def test_generators_basic():
    import jax

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 4000)
    g = rt.Normal(2.0, 3.0).generator()
    draws = jax.vmap(lambda k: g.get(k))(keys)
    assert abs(float(jnp.mean(draws)) - 2.0) < 0.2
    assert abs(float(jnp.std(draws)) - 3.0) < 0.2

    gp = rt.Poisson(4.0).generator()
    draws = jax.vmap(lambda k: gp.get(k))(keys)
    assert abs(float(jnp.mean(draws.astype(jnp.float32))) - 4.0) < 0.2

    gg = rt.Gamma(2.0, 2.0).generator()
    draws = jax.vmap(lambda k: gg.get(k))(keys)
    assert abs(float(jnp.mean(draws)) - 4.0) < 0.3

    gm = rt.Mixture({rt.Normal(0.0, 0.5): 0.5,
                     rt.Normal(4.0, 0.5): 0.5}).generator()
    draws = jax.vmap(lambda k: gm.get(k))(keys)
    assert abs(float(jnp.mean(draws)) - 2.0) < 0.3


def test_model_sample_prior():
    """Model.sample_prior (core/Model.scala:52-60's exploratory
    convenience): joint prior draws respect supports and dependence."""
    import rainier_tpu as rt

    a = rt.Uniform(0, 1).latent()
    c = rt.Normal(a + 1, a).latent()
    da, dc = rt.Model.sample_prior([a, c], n=400, seed=0)
    assert da.shape == dc.shape and da.shape[0] >= 400
    assert np.all((da > 0) & (da < 1))
    # E[c | a] = a + 1 => corr(a, c) > 0 and overall mean near 1.5
    assert abs(float(np.mean(dc)) - 1.5) < 0.2
    assert float(np.corrcoef(da, dc)[0, 1]) > 0.1
    single = rt.Model.sample_prior(a, n=200, seed=1)
    assert single.ndim == 1
