"""VIP reparameterization (arXiv:1906.03028) — the reference's unbuilt
"Automatic Reparameterization" roadmap item, so these tests define the
behavior: lam=0 must coincide exactly with the default (non-centered)
latent, lam=1 with the centered density, posterior moments must be
parameterization-invariant, and auto_vip must pick the geometry ADVI
prefers."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

import rainier_tpu as rt
from rainier_tpu.compute import Evaluator, real as R
from rainier_tpu.core import auto_vip, vip_latent, vip_latent_vec
from rainier_tpu.sampler import HMC, SamplerConfig


def _logp_on_grid(model, n, pts):
    cd = model.density()
    assert cd.n_vars == n
    return [float(cd.logp(jnp.asarray(q, dtype=jnp.float32)))
            for q in pts]


def test_lam0_equals_default_latent():
    """vip_latent(mu, s, 0) and Normal(mu, s).latent() build the same
    density (non-centered: raw ~ N(0,1), value = mu + s*raw)."""
    pts = [np.array([0.3]), np.array([-1.2]), np.array([2.0])]

    x = vip_latent(1.5, 2.0, 0.0)
    m_vip = rt.Model.track_([x])
    y = rt.Normal(1.5, 2.0).latent()
    m_ref = rt.Model.track_([y])

    got = _logp_on_grid(m_vip, 1, pts)
    want = _logp_on_grid(m_ref, 1, pts)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # the returned value is the same push-forward
    for q in [-1.0, 0.0, 2.5]:
        vx = float(Evaluator({m_vip.parameters[0]: q}).value(x))
        vy = float(Evaluator({m_ref.parameters[0]: q}).value(y))
        assert abs(vx - vy) < 1e-12
        assert abs(vx - (1.5 + 2.0 * q)) < 1e-12


def test_lam1_is_centered():
    """At lam=1 the raw parameter IS the latent: prior = N(q; mu, s),
    value = q."""
    x = vip_latent(1.5, 2.0, 1.0)
    m = rt.Model.track_([x])

    for q in [-1.0, 0.4, 3.0]:
        lp = float(m.density().logp(jnp.asarray([q], dtype=jnp.float32)))
        want = (-0.5 * ((q - 1.5) / 2.0) ** 2 - math.log(2.0)
                - 0.5 * math.log(2 * math.pi))
        assert abs(lp - want) < 1e-5
        vx = float(Evaluator({m.parameters[0]: q}).value(x))
        assert abs(vx - q) < 1e-6


def test_posterior_invariant_across_lam():
    """A hierarchical mean with informative data: posterior of the latent
    must agree across lam in {0, 0.5, 1} within MC error."""
    rng = np.random.default_rng(1)
    data = rng.normal(2.0, 0.5, 40)
    means = {}
    for lam in (0.0, 0.5, 1.0):
        theta = vip_latent(0.0, 3.0, lam)
        model = rt.Model.observe(list(data), rt.Normal(theta, 0.5))
        tr = model.sample(SamplerConfig(500, 500, sampler=HMC(6)),
                          n_chains=2, seed=3)
        means[lam] = float(np.mean(tr.evaluate(theta)))
    ref = float(np.mean(data))  # posterior mean ~ MLE (tight likelihood)
    for lam, mhat in means.items():
        assert abs(mhat - ref) < 0.15, (lam, mhat, ref)


def test_vip_latent_vec_matches_scalars():
    """Vector VIP latent = k scalar VIP latents (same density)."""
    vec = vip_latent_vec(1.0, 2.0, 3, lam=0.5)
    m_vec = rt.Model.track_([vec[i] for i in range(3)])
    q = np.array([0.2, -0.7, 1.1])
    lp_vec = float(m_vec.density().logp(jnp.asarray(q, dtype=jnp.float32)))

    xs = [vip_latent(1.0, 2.0, 0.5) for _ in range(3)]
    m_sca = rt.Model.track_(xs)
    lp_sca = float(m_sca.density().logp(jnp.asarray(q, dtype=jnp.float32)))
    assert abs(lp_vec - lp_sca) < 1e-4

    env = {m_vec.parameters[0]: q}
    ev = Evaluator(env)
    vals_vec = [float(ev.value(vec[i])) for i in range(3)]
    want = 1.0 + 2.0 ** 0.5 * (q - 0.5 * 1.0)
    np.testing.assert_allclose(vals_vec, want, rtol=1e-10)


def test_auto_vip_prefers_noncentered_on_funnel():
    """Neal's-funnel geometry (hierarchy with no data): mean-field ADVI's
    ELBO is maximized by the non-centered form (arXiv:1906.03028 §5's
    canonical example), so auto_vip must not pick lam=1."""

    def build(lam):
        log_tau = rt.Normal(0.0, 3.0).latent()
        thetas = vip_latent_vec(0.0, log_tau.exp(), 4, lam=lam)
        return rt.Model.track_([log_tau] + [thetas[i] for i in range(4)])

    res = auto_vip(build, candidates=(0.0, 1.0), n_steps=400, seed=0)
    assert res.lam == 0.0, res
    assert all(np.isfinite(res.elbos))


def test_bad_lam_rejected():
    with pytest.raises(Exception):
        vip_latent(0.0, 1.0, 1.5)


@pytest.mark.parametrize("family", ["Cauchy", "Laplace"])
def test_vip_location_scale_families(family):
    """VIP generalizes to any location-scale family: lam=0 coincides with
    the family's default (non-centered) latent, lam=1 with its centered
    density."""
    fam = getattr(rt, family)
    pts = [np.array([0.3]), np.array([-1.2]), np.array([2.0])]

    x = vip_latent(1.5, 2.0, 0.0, family=fam)
    got = _logp_on_grid(rt.Model.track_([x]), 1, pts)
    y = fam(1.5, 2.0).latent()
    want = _logp_on_grid(rt.Model.track_([y]), 1, pts)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    z = vip_latent(1.5, 2.0, 1.0, family=fam)
    m = rt.Model.track_([z])
    for q in [-1.0, 0.4, 3.0]:
        lp = float(m.density().logp(jnp.asarray([q], dtype=jnp.float32)))
        want_lp = float(Evaluator().value(
            fam(1.5, 2.0).log_density_at(R.const(q))))
        assert abs(lp - want_lp) < 1e-4 * max(1.0, abs(want_lp))
        assert abs(float(Evaluator({m.parameters[0]: q}).value(z)) - q) < 1e-6


def test_vip_rejects_non_location_scale():
    with pytest.raises(TypeError):
        vip_latent(0.0, 1.0, 0.5, family=rt.Gamma(2.0, 2.0))
