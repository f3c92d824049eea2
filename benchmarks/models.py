"""Benchmark model zoo.

Replicates the reference's JMH suite (rainier-benchmark/.../bench/stan/*:
EightSchools, ARK, KidIQ, LowDimGaussMix, GLMMPoisson2 — themselves drawn
from stan-dev/stat_comp_benchmarks) plus the BASELINE.json configs
(funnel, README regression, 100k logistic regression, 10k-latent GLMM).

Eight-schools uses the canonical published dataset; the larger datasets
are synthesized with fixed seeds to the same shapes/distributions as the
reference's committed data (same computational character, no copied data
blobs).
"""

from __future__ import annotations

import numpy as np

import rainier_tpu as rt
from rainier_tpu.compute import real as R
from rainier_tpu.compute.vec import Vec


def funnel(dim: int = 10):
    """Neal's funnel (README.md:44 headline benchmark)."""
    y = rt.Normal(0.0, 3.0).latent()
    xv = rt.Normal(0.0, (y / 2).exp()).latent_vec(dim - 1)
    return rt.Model.track_({y} | set(xv.to_list()))


def readme_regression(n: int = 200, seed: int = 0):
    """README linear regression: Exponential sigma, Normal alpha + 3 betas."""
    rng = np.random.default_rng(seed)
    xs = [tuple(r) for r in rng.normal(size=(n, 3))]
    ys = [float(np.dot(x, [1.0, -2.0, 0.5]) + 0.7 + 0.3 * rng.normal())
          for x in xs]
    sigma = rt.Exponential(1).latent()
    alpha = rt.Normal(0, 1).latent()
    betas = rt.Normal(0, 1).latent_vec(3)
    model = rt.Model.observe(ys, Vec.from_(xs).map(
        lambda t: rt.Normal(alpha + Vec.of(*t).dot(betas), sigma)))
    return model


# canonical eight-schools data (Rubin 1981; stat_comp_benchmarks)
EIGHT_SCHOOLS_Y = [28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0]
EIGHT_SCHOOLS_SIGMA = [15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0]


def eight_schools():
    """Hierarchical normal (bench/stan/EightSchools.scala structure: mu ~
    N(0,5), tau = |Cauchy(0,5)|, theta_i ~ N(mu, tau), y_i ~ N(theta_i,
    sigma_i)).  Built non-centered via the latent scale/translate
    transforms, matching the reference's latentVec construction."""
    mu = rt.Normal(0, 5).latent()
    tau = rt.Cauchy(0, 5).latent().abs()
    thetas = rt.Normal(mu, tau).latent_vec(len(EIGHT_SCHOOLS_Y))
    model = rt.Model.empty()
    for i, (y, s) in enumerate(zip(EIGHT_SCHOOLS_Y, EIGHT_SCHOOLS_SIGMA)):
        model = model.merge(rt.Model.observe([y], rt.Normal(thetas[i], s)))
    return model


def ark(k: int = 5, n: int = 1000, seed: int = 1):
    """AR(K) time series (bench/stan/ARK.scala structure).  Sliding-window
    design matrix built as columns → the likelihood is one vectorized
    dot-product graph instead of the reference's 995 merged targets."""
    rng = np.random.default_rng(seed)
    ys = np.zeros(n)
    true_b = np.array([0.6, -0.2, 0.1, 0.05, -0.05])
    for t in range(k, n):
        ys[t] = 0.1 + ys[t - k:t][::-1] @ true_b + 0.3 * rng.normal()
    alpha = rt.Normal(0, 10).latent()
    sigma = rt.Cauchy(0, 2.5).latent().abs()
    betas = rt.Normal(0, 10).latent_vec(k)
    lags = [tuple(float(ys[t - j]) for j in range(1, k + 1))
            for t in range(k, n)]
    target = [float(ys[t]) for t in range(k, n)]
    model = rt.Model.observe(target, Vec.from_(lags).map(
        lambda t: rt.Normal(alpha + Vec.of(*t).dot(betas), sigma)))
    return model


def kid_iq(n: int = 400, seed: int = 2):
    """Linear regression, n≤400 (bench/stan/KidIQ.scala structure)."""
    rng = np.random.default_rng(seed)
    mom_iq = rng.normal(100, 15, size=n)
    mom_hs = (rng.uniform(size=n) < 0.8).astype(float)
    score = 26 + 0.6 * mom_iq + 6 * mom_hs + 18 * rng.normal(size=n)
    sigma = rt.Cauchy(0, 2.5).latent()
    betas = rt.Normal(0, 10).latent_vec(3)
    xs = list(zip(mom_iq.tolist(), mom_hs.tolist()))
    model = rt.Model.observe(score.tolist(), Vec.from_(xs).map(
        lambda t: rt.Normal(betas[0] + betas[1] * t[0] + betas[2] * t[1],
                            sigma)))
    return model


def low_dim_gauss_mix(n: int = 1000, seed: int = 3):
    """2-component normal mixture (bench/stan/LowDimGaussMix.scala)."""
    rng = np.random.default_rng(seed)
    z = rng.uniform(size=n) < 0.4
    ys = np.where(z, rng.normal(-2.0, 1.0, n), rng.normal(2.5, 0.8, n))
    mu1, s1 = rt.Normal(0, 2).latent(), rt.Normal(0, 2).latent().abs()
    mu2, s2 = rt.Normal(0, 2).latent(), rt.Normal(0, 2).latent().abs()
    theta = rt.Beta(5, 5).latent()
    mix = rt.Mixture({rt.Normal(mu1, s1): theta,
                      rt.Normal(mu2, s2): R.one - theta})
    return rt.Model.observe(ys.tolist(), mix)


def glmm_poisson(n_sites: int = 100, n_years: int = 40, seed: int = 4):
    """Hierarchical Poisson GLMM (bench/stan/GLMMPoisson2.scala structure):
    year polynomial + per-year eps + per-site alphas, observed counts
    indexed by (year, site) — gathers over latent vectors."""
    rng = np.random.default_rng(seed)
    years = np.linspace(-0.95, 0.95, n_years)
    mu = rt.Normal(0, 10).latent()
    sd_alpha = rt.Uniform(0, 2).latent()
    alphas = rt.Normal(mu, sd_alpha).latent_vec(n_sites)
    sd_year = rt.Uniform(0, 1).latent()
    betas = rt.Normal(0, 10).latent_vec(3)
    eps = rt.Normal(0.0, sd_year).latent_vec(n_years)

    year_col = R.Column(np.repeat(years, n_sites))
    year_idx = R.IntColumn(np.repeat(np.arange(n_years), n_sites))
    site_idx = R.IntColumn(np.tile(np.arange(n_sites), n_years))
    year_effect = (year_col * betas[0] + year_col * year_col * betas[1]
                   + year_col * year_col * year_col * betas[2]
                   + R.Gather(eps.element, year_idx))
    log_lam = year_effect + R.Gather(alphas.element, site_idx)
    # structured truth (site effects sd 0.4, year noise sd 0.2 around a
    # mild trend) rather than flat counts, for the same reason as
    # glmm_large: flat data degenerates both scale posteriors
    true_sites = rng.normal(np.log(20.0), 0.4, size=n_sites)
    true_eps = rng.normal(0.0, 0.2, size=n_years)
    true_log_lam = (np.repeat(true_eps - 0.1 * years, n_sites)
                    + np.tile(true_sites, n_years))
    counts = rng.poisson(np.exp(true_log_lam)).astype(float)
    n_obs = n_years * n_sites
    lh = R.RowSum(rt.Poisson(log_lam.exp()).log_density_at(
        R.Column(counts)), n_obs)
    return rt.Model.likelihood(lh)


def logistic_regression(n: int = 100_000, p: int = 10, seed: int = 5):
    """100k-observation logistic regression (BASELINE config 4 — the
    vectorized Vec log-prob path)."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, p)).astype(np.float64)
    true_b = rng.normal(size=p)
    logits = x @ true_b - 0.5
    ys = (rng.uniform(size=n) < 1 / (1 + np.exp(-logits))).astype(float)
    alpha = rt.Normal(0, 5).latent()
    betas = rt.Normal(0, 5).latent_vec(p)
    # design matrix as one MatColumn → X·β is an MXU matmul
    lin = alpha + R.MatVec(R.MatColumn(x), betas.element)
    lh = R.RowSum(rt.Bernoulli(lin.logistic()).log_density_at(
        R.Column(ys)), n)
    return rt.Model.likelihood(lh)


def glmm_large(n_groups: int = 10_000, obs_per_group: int = 5,
               seed: int = 6, lam: float = 1.0):
    """Hierarchical Poisson GLMM with 10k group-level latents (BASELINE
    config 5): one VectorParameter leaf + gather, so the graph is O(1) in
    group count.

    ``lam`` is the VIP interpolation weight for the group effects
    (core/reparam.py): the default 1.0 (centered) fits 5 obs/group of
    Poisson(~5) data — each group's likelihood pins its effect to ~0.2
    on the log scale, tighter than the 0.3 prior sd — while the
    non-centered form (lam=0) couples mu/sd to all 10k raw latents
    (measured r4: rank-r̂ 3.9-5.1 on mu/log-sd at 400+400 NUTS, plus
    catastrophic inits — sd*z explodes the Poisson rate for ordinary
    draws of log-sd).  Centered parameterization alone did NOT converge
    the r4 e2e config (rank-r̂ 3.27): overdispersed inits start
    hundreds of posterior SDs from the (mu, log sd) mode and depth-8
    NUTS at delta=0.9 could not cover the distance; depth-10 at the
    standard delta=0.8 does (r5: rank-r̂ ~1.01 at 128 chains, 0
    divergences).  See benchmarks/e2e.py glmm_10k_latents."""
    rng = np.random.default_rng(seed)
    n = n_groups * obs_per_group
    mu = rt.Normal(0, 1).latent()
    sd = rt.Exponential(1.0).latent()
    effects = rt.vip_latent_vec(mu, sd, n_groups, lam=lam)
    group_idx = R.IntColumn(np.repeat(np.arange(n_groups), obs_per_group))
    # data carries TRUE group variation (sd=0.3 around log 5) so the
    # scale posterior is identified.  Flat Poisson(5) data (r3 and
    # earlier) made the true sd zero: the posterior on log(sd) became a
    # boundary funnel with a soft e^s left tail to −∞, which no sampler
    # mixes across — r4 captures showed chains spread over s ∈ [−5.7,
    # −4.5] with rank-r̂ 1.9–2.2 regardless of budget.  The reference's
    # GLMM benchmark models real site×year variation
    # (bench/stan/GLMMPoisson2.scala:9-11), so a variation-bearing
    # synthetic instance is the faithful analogue.
    true_effects = rng.normal(np.log(5.0), 0.3, size=n_groups)
    counts = rng.poisson(
        np.exp(np.repeat(true_effects, obs_per_group))).astype(float)
    log_lam = R.Gather(effects.element, group_idx)
    lh = R.RowSum(rt.Poisson(log_lam.exp()).log_density_at(
        R.Column(counts)), n)
    return rt.Model.likelihood(lh)


ALL = {
    "funnel": funnel,
    "readme_regression": readme_regression,
    "eight_schools": eight_schools,
    "ark": ark,
    "kid_iq": kid_iq,
    "low_dim_gauss_mix": low_dim_gauss_mix,
    "glmm_poisson": glmm_poisson,
    "logistic_regression_100k": logistic_regression,
    "glmm_large_10k": glmm_large,
}
