"""End-to-end checks on the BASELINE.md model configs: posterior moments
must match the well-known reference values within Monte-Carlo error
(SURVEY.md §4: the acceptance criterion replacing exact goldsets)."""

import numpy as np
import pytest

import rainier_tpu as rt
from rainier_tpu.sampler import NUTS, SamplerConfig, HMC

from conftest import require_cpu, require_devices  # noqa: E402


def test_eight_schools_nuts():
    """Eight-schools hierarchical normal with NUTS + full adaptation
    (BASELINE config 3).  With the Stan stat_comp_benchmarks priors
    (mu ~ N(0,5), tau = |Cauchy(0,5)|) the posterior shrinks the
    flat-prior BDA value (~7.9) toward ~4-6."""
    from benchmarks.models import EIGHT_SCHOOLS_SIGMA, EIGHT_SCHOOLS_Y

    mu = rt.Normal(0, 5).latent()
    tau = rt.Cauchy(0, 5).latent().abs()
    thetas = rt.Normal(mu, tau).latent_vec(8)
    model = rt.Model.empty()
    for i, (y, s) in enumerate(zip(EIGHT_SCHOOLS_Y, EIGHT_SCHOOLS_SIGMA)):
        model = model.merge(rt.Model.observe([y], rt.Normal(thetas[i], s)))
    cfg = SamplerConfig(warmup_iterations=1000, iterations=1500,
                        sampler=NUTS(max_depth=8))
    tr = model.sample(cfg, n_chains=4, seed=0)
    d = tr.diagnostics()
    assert max(x.r_hat for x in d) < 1.1
    mu_draws = tr.evaluate(mu)
    tau_draws = tr.evaluate(tau)
    assert 2.5 < mu_draws.mean() < 7.5, mu_draws.mean()
    assert 1.5 < tau_draws.mean() < 9.0, tau_draws.mean()
    # posterior predictive for school 0 should shrink toward mu
    th0 = tr.evaluate(thetas[0])
    assert mu_draws.mean() < th0.mean() < 28.0


def test_funnel_hmc_reference_config():
    """Neal's funnel, HMC 5 leapfrog steps (BASELINE config 1):
    y-marginal must be N(0,3) within MC error."""
    y = rt.Normal(0.0, 3.0).latent()
    xv = rt.Normal(0.0, (y / 2).exp()).latent_vec(9)
    m = rt.Model.track_({y} | set(xv.to_list()))
    cfg = SamplerConfig(warmup_iterations=1000, iterations=2500,
                        sampler=HMC(5))
    tr = m.sample(cfg, n_chains=4, seed=0)
    ys = tr.evaluate(y)
    assert abs(ys.mean()) < 0.3
    assert abs(ys.std() - 3.0) < 0.35
    assert max(d.r_hat for d in tr.diagnostics()) < 1.1


def test_logistic_regression_sharded():
    """Logistic regression with data-sharded likelihood (BASELINE config
    4, scaled down for CI) — posterior must recover the coefficients."""
    require_devices(2)
    from rainier_tpu.compute import real as R
    from rainier_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    n, p = 4096, 4
    x = rng.normal(size=(n, p))
    true_b = np.array([1.0, -0.5, 0.25, 0.0])
    probs = 1 / (1 + np.exp(-(x @ true_b)))
    ys = (rng.uniform(size=n) < probs).astype(float)
    betas = rt.Normal(0, 5).latent_vec(p)
    lin = R.MatVec(R.MatColumn(x), betas.element)
    lh = R.RowSum(rt.Bernoulli(lin.logistic()).log_density_at(
        R.Column(ys)), n)
    model = rt.Model.likelihood(lh)
    mesh = make_mesh(n_chain_shards=4, n_data_shards=2)
    cfg = SamplerConfig(warmup_iterations=400, iterations=600,
                        sampler=HMC(8))
    tr = model.sample(cfg, n_chains=4, seed=0, mesh=mesh)
    est = np.asarray([tr.mean(betas[i]) for i in range(p)])
    assert np.all(np.abs(est - true_b) < 0.2), est


def test_glmm_gather_path():
    """Hierarchical GLMM with latent-vector gathers (BASELINE config 5,
    scaled down): group effects must be recovered."""
    from rainier_tpu.compute import real as R

    rng = np.random.default_rng(1)
    n_groups, per = 50, 20
    true_mu, true_sd = 1.0, 0.5
    effects_true = rng.normal(true_mu, true_sd, n_groups)
    gid = np.repeat(np.arange(n_groups), per)
    counts = rng.poisson(np.exp(effects_true)[gid]).astype(float)

    mu = rt.Normal(0, 1).latent()
    sd = rt.Exponential(1.0).latent()
    effects = rt.Normal(mu, sd).latent_vec(n_groups)
    log_lam = R.Gather(effects.element, R.IntColumn(gid))
    lh = R.RowSum(rt.Poisson(log_lam.exp()).log_density_at(
        R.Column(counts)), len(counts))
    model = rt.Model.likelihood(lh)
    cfg = SamplerConfig(warmup_iterations=500, iterations=800,
                        sampler=HMC(8))
    tr = model.sample(cfg, n_chains=2, seed=0)
    assert abs(tr.mean(mu) - true_mu) < 0.25
    assert abs(tr.mean(sd) - true_sd) < 0.25


def test_glmm_benchmark_model_converges():
    """The actual benchmark model (benchmarks.models.glmm_large, the
    10k-latent BASELINE config 5) at oracle scale: NUTS must converge
    and recover the synthesis truth (mu = log 5, sd = 0.3).  This is
    the CPU pin of the r5 TPU e2e record (e2e_tpu_r5.jsonl:
    rank-r̂ 1.0046 at 128 chains / 10k groups)."""
    from benchmarks.models import glmm_large
    from rainier_tpu.sampler import NUTS

    model = glmm_large(n_groups=200)
    cfg = SamplerConfig(warmup_iterations=500, iterations=500,
                        sampler=NUTS(max_depth=8))
    tr = model.sample(cfg, n_chains=4, seed=0, collect_idx=[0, 1])
    d = tr.diagnostics(rank_normalized=True)
    assert max(x.r_hat for x in d) < 1.05
    ch = np.asarray(tr.chains)
    assert abs(ch[:, :, 0].mean() - np.log(5.0)) < 0.1     # mu
    assert abs(np.exp(ch[:, :, 1].mean()) - 0.3) < 0.1     # sd


def test_diagnostics_golden():
    """r̂/ESS formulas against independently hand-computed values on a
    fixed synthetic trace (Stan manual §30.3/30.4 arithmetic)."""
    from rainier_tpu.core.trace import _diagnostics_all

    rng = np.random.default_rng(0)
    # two chains with different means → r̂ must exceed 1
    c1 = rng.normal(0.0, 1.0, size=500)
    c2 = rng.normal(1.5, 1.0, size=500)
    chains = np.stack([c1, c2])[:, :, None]
    r_hat, ess = _diagnostics_all(chains)
    # hand-compute rHat
    n, m = 500, 2
    means = chains[:, :, 0].mean(axis=1)
    b = n / (m - 1) * ((means - means.mean()) ** 2).sum()
    w = chains[:, :, 0].var(axis=1, ddof=1).mean()
    v = (n - 1) / n * w + b / n
    assert abs(r_hat[0] - np.sqrt(v / w)) < 1e-10
    assert r_hat[0] > 1.2
    # iid chains from the same dist: r̂≈1, ESS near n*m
    c3 = rng.normal(0, 1, size=(4, 500, 1))
    r2, e2 = _diagnostics_all(c3)
    assert abs(r2[0] - 1.0) < 0.02
    assert e2[0] > 1200


def test_variogram_matches_per_lag_loop():
    """The batched sliding-window-matmul variogram (trace._variogram)
    must reproduce the naive per-lag estimator it replaced exactly —
    autocorrelated chains, n not a power of two, f32 input."""
    from rainier_tpu.core.trace import _variogram

    rng = np.random.default_rng(7)
    m, n, k = 6, 333, 4
    x = np.zeros((m, n, k), np.float32)
    for t in range(1, n):
        x[:, t] = (0.8 * x[:, t - 1]
                   + rng.normal(size=(m, k)).astype(np.float32))
    max_lag = 100
    got = _variogram(x, max_lag)
    want = np.empty((max_lag, k))
    for lag in range(1, max_lag + 1):
        d = x[:, lag:, :] - x[:, :-lag, :]
        want[lag - 1] = (d ** 2).sum(axis=1).mean(axis=0) / (n - lag)
    np.testing.assert_allclose(got, want, rtol=5e-5)


def test_nuts_converges_on_concentrated_posterior():
    """Overdispersed q0 ~ N(0,1) starts ~100 posterior SDs from a sharp
    GLM posterior (n=10k); NUTS's doubling trajectories make the trek
    during warmup while 8-step HMC cannot (measured on the 100k BASELINE
    config: HMC(8) r-hat 1.1-14 vs NUTS 1.003 — benchmarks/e2e.py)."""
    from rainier_tpu.compute import real as R

    rng = np.random.default_rng(3)
    n, p = 10_000, 5
    x = rng.normal(size=(n, p))
    true_b = rng.normal(size=p)
    probs = 1 / (1 + np.exp(-(x @ true_b - 0.5)))
    ys = (rng.uniform(size=n) < probs).astype(float)
    alpha = rt.Normal(0, 5).latent()
    betas = rt.Normal(0, 5).latent_vec(p)
    lin = alpha + R.MatVec(R.MatColumn(x), betas.element)
    lh = R.RowSum(rt.Bernoulli(lin.logistic()).log_density_at(
        R.Column(ys)), n)
    model = rt.Model.likelihood(lh)
    cfg = SamplerConfig(300, 300, sampler=NUTS(max_depth=8))
    tr = model.sample(cfg, n_chains=4, seed=0)
    d = tr.diagnostics()
    max_rhat = max(float(s.r_hat) for s in d)
    assert max_rhat < 1.05, max_rhat
    est = np.asarray([tr.mean(betas[i]) for i in range(p)])
    assert np.all(np.abs(est - true_b) < 0.15), (est, true_b)


def test_rank_normalized_split_diagnostics():
    """Split r-hat catches within-chain drift the classic (reference)
    estimator misses; rank-normalization keeps ESS finite for
    infinite-variance draws (Vehtari et al. 2021)."""
    from rainier_tpu.core.trace import Trace

    rng = np.random.default_rng(0)

    def mk(chains):
        return Trace(chains.astype(np.float64)[..., None], None, None,
                     None)

    # well-mixed iid chains: all variants agree near 1
    good = mk(rng.normal(size=(4, 1000)))
    assert abs(good.diagnostics()[0].r_hat - 1) < 0.02
    assert abs(good.diagnostics(split=True)[0].r_hat - 1) < 0.02
    assert abs(good.diagnostics(rank_normalized=True)[0].r_hat - 1) < 0.02

    # identical linear drift in every chain: chain means agree, so the
    # classic r-hat sees nothing; split r-hat flags it
    drift = mk(np.linspace(-1, 1, 1000)[None, :]
               + 0.1 * rng.normal(size=(4, 1000)))
    assert drift.diagnostics()[0].r_hat < 1.02
    assert drift.diagnostics(split=True)[0].r_hat > 1.5

    # Cauchy draws: sample-moment ESS is erratic; rank-normalized ESS
    # stays close to the iid count
    cauchy = mk(rng.standard_t(df=1, size=(4, 1000)))
    rn = cauchy.diagnostics(rank_normalized=True)[0]
    assert rn.r_hat < 1.02
    assert rn.effective_sample_size > 2000


def test_device_diagnostics_match_host_oracle():
    """The device diagnostics pipeline (_diagnostics_device — one
    compiled XLA program: split, rank-normalize, r̂/ESS, variogram) must
    reproduce the float64 host oracle on every variant, including a
    concentrated posterior (|mean|/sd ≈ 1000 — the conditioning regime
    where the round-3 advisor measured 150% variogram error in f32)."""
    from rainier_tpu.core.trace import Trace

    rng = np.random.default_rng(42)
    m, n, k = 4, 800, 3
    x = np.zeros((m, n, k), np.float64)
    for t in range(1, n):
        x[:, t] = 0.7 * x[:, t - 1] + rng.normal(size=(m, k))
    # column 0: near-zero mean; column 1: mean/sd ~ 1000; column 2: skewed
    x[:, :, 1] = x[:, :, 1] + 2000.0
    x[:, :, 2] = np.exp(0.5 * x[:, :, 2])
    tr = Trace(x.astype(np.float32), None, None, None)

    for kwargs in ({}, {"split": True}, {"rank_normalized": True}):
        host = tr.diagnostics(device=False, **kwargs)
        dev = tr.diagnostics(device=True, **kwargs)
        for h, d in zip(host, dev):
            assert abs(d.r_hat - h.r_hat) < 2e-3 * h.r_hat, (kwargs, h, d)
            assert (abs(d.effective_sample_size - h.effective_sample_size)
                    < 0.02 * h.effective_sample_size), (kwargs, h, d)


def test_rank_cross_check_fallback_wiring(monkeypatch):
    """When the device rank formulations disagree (the XLA:TPU
    miscompile guard), diagnostics must warn and return the f64 host
    pipeline's values.  Simulated by forcing the ok flag False."""
    import warnings

    from rainier_tpu.core import trace as T

    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 300, 3))
    tr = T.Trace(x.astype(np.float32), None, None, None)
    want = tr.diagnostics(rank_normalized=True, device=False)

    real = T._diagnostics_device

    def fake(chains, max_lag, split, rank_normalized):
        r, e, _ = real(chains, max_lag, split, rank_normalized)
        # poison the device values too: the fallback must not use them
        return r * np.nan, e * np.nan, np.asarray(False)

    monkeypatch.setattr(T, "_diagnostics_device", fake)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = tr.diagnostics(rank_normalized=True)
    assert any("cross-check" in str(x.message) for x in w)
    for g, h in zip(got, want):
        assert g.r_hat == h.r_hat
        assert g.effective_sample_size == h.effective_sample_size


def test_rank_lanes_chunked_path_matches_host(monkeypatch):
    """The sequential lane-chunked rank path (big-trace HBM guard in
    _diagnostics_device) must produce the same diagnostics as the f64
    host oracle.  Shrinking the budget forces chunking on a small
    trace; a fresh shape forces a retrace under the patched constant."""
    from rainier_tpu.core import trace as T

    monkeypatch.setattr(T, "_RANK_LANES_BUDGET", 1.0)  # 1 lane per chunk
    rng = np.random.default_rng(11)
    m, n, k = 8, 322, 5   # deliberately unusual shape (fresh jit cache)
    x = rng.normal(size=(m, n, k))
    for t in range(1, n):
        x[:, t] = 0.5 * x[:, t - 1] + rng.normal(size=(m, k))
    tr = T.Trace(x.astype(np.float32), None, None, None)
    dev = tr.diagnostics(rank_normalized=True)
    host = tr.diagnostics(rank_normalized=True, device=False)
    for d, h in zip(dev, host):
        assert abs(d.r_hat - h.r_hat) < 2e-3 * h.r_hat
        assert (abs(d.effective_sample_size - h.effective_sample_size)
                < 0.02 * h.effective_sample_size)


def test_device_summary_matches_host():
    """Trace.summary (device mean/sd/quantiles — the summary_only
    consumption path that kills the trace-transfer wall) must match the
    numpy host computation, including a concentrated column."""
    from rainier_tpu.core.trace import Trace

    rng = np.random.default_rng(7)
    m, n, k = 4, 2000, 3
    x = rng.normal(size=(m, n, k))
    x[:, :, 1] += 500.0
    x[:, :, 2] = np.exp(0.4 * x[:, :, 2])
    tr = Trace(x.astype(np.float32), None, None, None)
    s = tr.summary()
    flat = x.reshape(-1, k)
    assert s.n_draws == m * n
    np.testing.assert_allclose(s.mean, flat.mean(axis=0),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(s.sd, flat.std(axis=0, ddof=1), rtol=2e-3)
    want_q = np.quantile(flat, s.probs, axis=0)
    np.testing.assert_allclose(s.quantiles, want_q, rtol=2e-3,
                               atol=2e-3 * np.abs(want_q).max())


def test_variogram_conditioning_concentrated_posterior():
    """Host variogram on f32 chains with |mean|/sd ~ 1000 must match the
    naive per-lag estimator on the float64 originals — the round-3
    advisor measured 150% error before per-parameter centering."""
    from rainier_tpu.core.trace import _variogram

    rng = np.random.default_rng(5)
    m, n, k = 4, 500, 2
    x64 = rng.normal(size=(m, n, k))
    for t in range(1, n):
        x64[:, t] = 0.6 * x64[:, t - 1] + rng.normal(size=(m, k))
    x64[:, :, 1] += 1000.0
    x32 = x64.astype(np.float32)
    max_lag = 50
    got = _variogram(x32, max_lag)
    want = np.empty((max_lag, k))
    for lag in range(1, max_lag + 1):
        d = x64[:, lag:, :] - x64[:, :-lag, :]
        want[lag - 1] = (d ** 2).sum(axis=1).mean(axis=0) / (n - lag)
    # f32 input quantization bounds accuracy at ~1e-4 relative; the old
    # uncentered estimator was off by ~1.5x here
    np.testing.assert_allclose(got, want, rtol=2e-3)
