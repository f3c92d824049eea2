"""Sampler-layer tests.

Moment tests mirror rainier-test/.../sampler/LeapFrogTest.scala:15-79
(hand-written analytic density, 1000 iterations, loose tolerances, identity
and diagonal mass) plus funnel geometry, dense-mass, NUTS, EHMC, pooled
adaptation, thinning and posterior-predictive paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rainier_tpu as rt
from rainier_tpu.sampler import (EHMC, HMC, NUTS, DenseMassMatrixTuner,
                                 IdentityMassMatrix, SamplerConfig,
                                 StaticMassMatrix, StaticStepSize,
                                 build_chain_fn)


def standard_normal_density(n):
    """Hand-written DensityFunction analogue (LeapFrogTest.scala:5-13):
    bypasses the model layer entirely, proving the sampler is independently
    usable (docs/modules.md:10-11)."""

    def lpg(q):
        return -0.5 * jnp.sum(q * q), -q

    return lpg


def run_raw(lpg, n_vars, cfg, n_chains=2, seed=0):
    fn = build_chain_fn(lpg, n_vars, cfg, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_chains)
    return jax.jit(jax.vmap(fn, axis_name="chains"))(keys)


@pytest.mark.parametrize("mass_cfg", [
    IdentityMassMatrix(),
    StaticMassMatrix(diag=[1.0, 1.0, 1.0]),
], ids=["identity", "static-diag"])
def test_leapfrog_moments_analytic_density(mass_cfg):
    cfg = SamplerConfig(warmup_iterations=500, iterations=1000,
                        sampler=HMC(8), mass_matrix=mass_cfg)
    res = run_raw(standard_normal_density(3), 3, cfg)
    qs = np.asarray(res.samples).reshape(-1, 3)
    assert np.all(np.abs(qs.mean(axis=0)) < 0.2)
    assert np.all(np.abs(qs.std(axis=0) - 1.0) < 0.3)


def test_static_step_size():
    cfg = SamplerConfig(warmup_iterations=100, iterations=500,
                        sampler=HMC(8), step_size=StaticStepSize(0.5),
                        mass_matrix=IdentityMassMatrix())
    res = run_raw(standard_normal_density(2), 2, cfg)
    assert float(res.step_size[0]) == pytest.approx(0.5)
    qs = np.asarray(res.samples).reshape(-1, 2)
    assert np.all(np.abs(qs.std(axis=0) - 1.0) < 0.35)


def test_diag_mass_adapts_to_scales():
    # correlated-free but wildly different scales: diag mass should adapt
    scales = jnp.asarray([0.1, 1.0, 10.0])

    def lpg(q):
        z = q / scales
        return -0.5 * jnp.sum(z * z), -q / (scales * scales)

    cfg = SamplerConfig(warmup_iterations=800, iterations=1000,
                        sampler=HMC(8))
    res = run_raw(lpg, 3, cfg)
    variances = np.asarray(res.mass.diag)  # (chains, 3)
    # adapted variance should be within ~3x of the true marginal variances
    true = np.asarray(scales) ** 2
    ratio = variances / true
    assert np.all(ratio > 0.2) and np.all(ratio < 5.0), variances
    qs = np.asarray(res.samples).reshape(-1, 3)
    assert np.all(np.abs(qs.std(axis=0) / np.asarray(scales) - 1) < 0.35)


def test_dense_mass_on_correlated_gaussian():
    rho = 0.9
    cov = np.array([[1.0, rho], [rho, 1.0]])
    prec = np.linalg.inv(cov)
    pj = jnp.asarray(prec, jnp.float32)

    def lpg(q):
        g = -pj @ q
        return -0.5 * jnp.dot(q, pj @ q), g

    cfg = SamplerConfig(warmup_iterations=800, iterations=1500,
                        sampler=HMC(8),
                        mass_matrix=DenseMassMatrixTuner())
    res = run_raw(lpg, 2, cfg)
    qs = np.asarray(res.samples).reshape(-1, 2)
    # moment assertions in the style of LeapFrogTest.scala:15-79 — and
    # explicitly finite/unit-scale, so a chain explosion (huge-variance
    # samples that happen to correlate) fails loudly rather than
    # squeaking past a correlation-only check
    assert np.all(np.isfinite(qs))
    assert np.all(np.abs(qs.mean(axis=0)) < 0.3)
    assert np.all(np.abs(qs.var(axis=0) - 1.0) < 0.5), qs.var(axis=0)
    emp = np.cov(qs.T)
    assert abs(emp[0, 1] / np.sqrt(emp[0, 0] * emp[1, 1]) - rho) < 0.1
    # adapted dense covariance should capture the correlation
    ch_cov = np.asarray(res.mass.cov)[0]
    assert abs(ch_cov[0, 1] / np.sqrt(ch_cov[0, 0] * ch_cov[1, 1]) - rho) \
        < 0.25


@pytest.mark.parametrize("sampler", [HMC(5), EHMC(max_steps=128),
                                     NUTS(max_depth=7)],
                         ids=["hmc", "ehmc", "nuts"])
def test_funnel_moments(sampler):
    y = rt.Normal(0.0, 3.0).latent()
    xv = rt.Normal(0.0, (y / 2).exp()).latent_vec(9)
    m = rt.Model.track_({y} | set(xv.to_list()))
    cfg = SamplerConfig(warmup_iterations=700, iterations=1500,
                        sampler=sampler)
    tr = m.sample(cfg, n_chains=4, seed=3)
    ys = tr.evaluate(y)
    assert abs(ys.mean()) < 0.35
    assert abs(ys.std() - 3.0) < 0.45
    assert max(d.r_hat for d in tr.diagnostics()) < 1.1


def test_pooled_adaptation():
    cfg = SamplerConfig(warmup_iterations=500, iterations=500,
                        sampler=HMC(8), pooled_adaptation=True)
    res = run_raw(standard_normal_density(2), 2, cfg, n_chains=4)
    # pooled mode → every chain ends with the same mass matrix & step size
    d = np.asarray(res.mass.diag)
    assert np.allclose(d, d[0], rtol=1e-5)
    qs = np.asarray(res.samples).reshape(-1, 2)
    assert np.all(np.abs(qs.std(axis=0) - 1.0) < 0.3)


def test_thin_and_collect():
    x = rt.Normal(1.0, 2.0).latent()
    m = rt.Model.track_({x})
    cfg = SamplerConfig(warmup_iterations=500, iterations=900,
                        sampler=HMC(6), thin=3)
    tr = m.sample(cfg, n_chains=4, seed=0)
    assert tr.chains.shape[1] == 300
    xs = tr.evaluate(x)
    assert abs(xs.mean() - 1.0) < 0.4


def test_posterior_regression_end_to_end():
    rng = np.random.default_rng(5)
    xs = rng.normal(size=(80, 2))
    true_b = np.array([1.5, -0.5])
    ys = xs @ true_b + 0.3 * rng.normal(size=80)
    betas = rt.Normal(0, 5).latent_vec(2)
    sigma = rt.Exponential(1.0).latent()
    model = rt.Model.observe(
        list(ys),
        rt.Vec.from_([tuple(r) for r in xs]).map(
            lambda t: rt.Normal(rt.Vec.of(*t).dot(betas), sigma)))
    cfg = SamplerConfig(warmup_iterations=500, iterations=800,
                        sampler=HMC(10))
    tr = model.sample(cfg, n_chains=2, seed=2)
    b0 = tr.evaluate(betas[0])
    b1 = tr.evaluate(betas[1])
    s = tr.evaluate(sigma)
    assert abs(b0.mean() - 1.5) < 0.15
    assert abs(b1.mean() + 0.5) < 0.15
    assert abs(s.mean() - 0.3) < 0.1


def test_predict_posterior_predictive():
    # observe normal data, predict new observations
    rng = np.random.default_rng(11)
    data = rng.normal(2.0, 1.0, size=200)
    mu = rt.Normal(0, 10).latent()
    model = rt.Model.observe(list(data), rt.Normal(mu, 1.0))
    cfg = SamplerConfig(warmup_iterations=300, iterations=400,
                        sampler=HMC(8))
    tr = model.sample(cfg, n_chains=2, seed=0)
    preds = tr.predict(rt.Normal(mu, 1.0))
    preds = np.asarray(preds)
    assert preds.shape[0] == 800
    assert abs(preds.mean() - 2.0) < 0.2
    assert abs(preds.std() - 1.0) < 0.25


def test_optimize_map():
    rng = np.random.default_rng(5)
    data = rng.normal(3.0, 1.0, size=500)
    mu = rt.Normal(0, 100).latent()
    model = rt.Model.observe(list(data), rt.Normal(mu, 1.0))
    mu_hat = model.optimize(mu)
    assert abs(float(mu_hat) - data.mean()) < 0.05


def bimodal_density():
    """0.5·N(0, 0.5²) + 0.5·N(12, 0.5²): modes 24 sd apart — HMC cannot
    cross the barrier, so convergence can only be *detected* if chains
    start overdispersed enough to land in both basins."""
    def logp(q):
        x = q[0]
        a = -0.5 * (x / 0.5) ** 2
        b = -0.5 * ((x - 12.0) / 0.5) ** 2
        return jax.scipy.special.logsumexp(jnp.stack([a, b])) + jnp.log(0.5)

    return jax.value_and_grad(logp)


def _bimodal_rhat(init_scale, seed=7):
    cfg = SamplerConfig(warmup_iterations=400, iterations=400,
                        sampler=HMC(8), init_scale=init_scale)
    res = run_raw(bimodal_density(), 1, cfg, n_chains=8, seed=seed)
    from rainier_tpu.core.trace import _diagnostics_all

    r_hat, _ = _diagnostics_all(np.asarray(res.samples))  # (m, n, 1)
    return float(r_hat[0])


def test_bimodal_rhat_detects_nonconvergence():
    """The round-1 bug: every chain started at q=0, so chains could not
    disagree about which mode they found and r̂ was anti-conservative
    (the reference draws q0 ~ N(0,1) per chain, LeapFrog.scala:102-110).
    Overdispersed inits must flag the bimodal posterior; origin starts
    (init_scale=0, the old behavior) silently 'converge' in one mode."""
    assert _bimodal_rhat(init_scale=12.0) > 1.1
    assert _bimodal_rhat(init_scale=0.0) < 1.05


def test_divergence_counting():
    # an impossible geometry at huge step size must register divergences
    def lpg(q):
        return -0.5 * jnp.sum(q * q) * 1e6, -q * 1e6

    cfg = SamplerConfig(warmup_iterations=10, iterations=50,
                        sampler=HMC(5), step_size=StaticStepSize(10.0),
                        mass_matrix=IdentityMassMatrix())
    res = run_raw(lpg, 2, cfg)
    assert int(np.sum(np.asarray(res.stats.divergences))) > 0


def test_ehmc_synchronized_lengths():
    """EHMC(synchronized=True), the TPU default: every iteration shares
    ONE empirical trajectory-length draw (lane 0's) across the vmapped
    chain batch, and counted lengths are pooled into every lane's ring
    buffer — the batch pays E[L] wall-clock per iteration instead of
    E[max over lanes] while L stays independent of every chain's state
    (still a valid MH kernel).  Moments must match the reference's
    per-chain replay mode; in the synchronized run every lane must have
    integrated the identical step count (the shared draw)."""
    rng = np.random.default_rng(3)
    data = rng.normal(1.5, 2.0, size=128)
    mu = rt.Normal(0, 10).latent()
    sigma = rt.Exponential(0.5).latent()
    model = rt.Model.observe(list(data), rt.Normal(mu, sigma))
    res = {}
    for sync in (True, False):
        cfg = SamplerConfig(300, 400,
                            sampler=EHMC(max_steps=64, synchronized=sync))
        tr = model.sample(cfg, n_chains=8, seed=0)
        res[sync] = (tr.mean(mu), tr.mean(sigma),
                     np.asarray(tr.stats.grad_evals))
        assert max(d.r_hat for d in tr.diagnostics()) < 1.05
    assert abs(res[True][0] - res[False][0]) < 0.15
    assert abs(res[True][1] - res[False][1]) < 0.2
    # shared draw ⇒ every lane ran the same number of gradient steps
    sync_evals = res[True][2]
    assert np.all(sync_evals == sync_evals[0])
    # per-chain replay draws independently ⇒ lanes differ (w.h.p.)
    assert len(set(res[False][2].tolist())) > 1


def test_ring_add_many():
    """Masked bulk ring append (pooled EHMC length sharing): valid
    entries land in order at the write cursor, invalid ones are skipped,
    wrap-around and the count cap behave like repeated ring_add."""
    from rainier_tpu.sampler.samplers import (RingBuffer, ring_add,
                                              ring_add_many, ring_init)

    rb = ring_init(4, jnp.float32)
    vals = jnp.asarray([10.0, 20.0, 30.0, 40.0, 50.0, 60.0])
    valid = jnp.asarray([True, False, True, True, False, True])
    got = ring_add_many(rb, vals, valid)
    # reference: sequential ring_add of the valid values
    want = rb
    for v, ok in zip(vals, valid):
        if ok:
            want = ring_add(want, v)
    np.testing.assert_array_equal(np.asarray(got.buf),
                                  np.asarray(want.buf))
    assert int(got.idx) == int(want.idx)
    assert int(got.count) == int(want.count)
    # second bulk append wraps the cursor
    got2 = ring_add_many(got, jnp.asarray([70.0, 80.0]),
                         jnp.asarray([True, True]))
    want2 = ring_add(ring_add(want, 70.0), 80.0)
    np.testing.assert_array_equal(np.asarray(got2.buf),
                                  np.asarray(want2.buf))
    assert int(got2.idx) == int(want2.idx)
    assert int(got2.count) == int(want2.count)
    # appending MORE values than the buffer holds (the 256-lane batch
    # filling a 100-slot buffer): ring_add_many must leave exactly what
    # sequential ring_add of all values would — the last `size` entries
    big = jnp.arange(1.0, 12.0)  # 11 values into a 4-slot ring
    got3 = ring_add_many(ring_init(4, jnp.float32), big,
                         jnp.ones((11,), bool))
    want3 = ring_init(4, jnp.float32)
    for v in big:
        want3 = ring_add(want3, v)
    np.testing.assert_array_equal(np.asarray(got3.buf),
                                  np.asarray(want3.buf))
    assert int(got3.idx) == int(want3.idx)
    assert int(got3.count) == int(want3.count)


def test_chunked_execution_matches_fused():
    """chunk_iters bounds device-program length (warmup and sampling run
    as segment programs with host syncs — the remote TPU runtime kills
    workers on very long single programs, docs/internals.md).  The
    chunked run must deliver the same posterior (moments within MC
    error; bitwise equality is not expected across different XLA program
    partitionings) and the full draw count, including a non-dividing
    chunk size (remainder segment)."""
    rng = np.random.default_rng(3)
    data = rng.normal(1.5, 2.0, size=128)
    mu = rt.Normal(0, 10).latent()
    sigma = rt.Exponential(0.5).latent()
    model = rt.Model.observe(list(data), rt.Normal(mu, sigma))
    cfg = SamplerConfig(warmup_iterations=300, iterations=400,
                        sampler=HMC(5))
    t0 = model.sample(cfg, n_chains=8, seed=0)
    t1 = model.sample(cfg, n_chains=8, seed=0, chunk_iters=130)
    assert t1.chains.shape == t0.chains.shape
    for expr in (mu, sigma):
        assert abs(t0.mean(expr) - t1.mean(expr)) < 0.15
    assert max(d.r_hat for d in t1.diagnostics()) < 1.1


def test_progress_console_and_html():
    """Chunked driver path with Progress attached (HTMLProgress.scala's
    stat surface: per-chain accept / E-BFMI / step / divergences)."""
    import io

    from rainier_tpu.sampler import ConsoleProgress, HTMLProgress

    mu = rt.Normal(0, 1).latent()
    model = rt.Model.observe([0.5, 1.0, 0.2], rt.Normal(mu, 1))
    cfg = SamplerConfig(warmup_iterations=50, iterations=50,
                        sampler=HMC(5))

    buf = io.StringIO()
    cp = ConsoleProgress(out=buf)
    cp.output_every_seconds = 0.0
    model.sample(cfg, n_chains=4, seed=0, progress=cp)
    out = buf.getvalue()
    assert "accept" in out and "E-BFMI" in out

    hp = HTMLProgress()
    hp.output_every_seconds = 0.0
    trace = model.sample(cfg, n_chains=4, seed=0, progress=hp)
    html = hp._render("sampling", 50, 50, trace.stats, trace.step_size)
    assert "<table>" in html and "divergences" in html
    # the chunked path refreshes >1×, so the recent-window telemetry
    # (Stats.scala:3-16 statsWindow semantics) must appear
    assert "[window:" in out


def test_windowed_rates_reflect_only_the_recent_interval():
    """WindowedRates differences cumulative stats between refreshes: the
    windowed accept rate must track the *recent* window, not the
    cumulative mean (VERDICT r2 item 10)."""
    import jax.numpy as jnp

    from rainier_tpu.sampler.progress import WindowedRates
    from rainier_tpu.sampler.stats import StatsState

    def st(iters, acc_sum, grads):
        z = jnp.zeros(())
        return StatsState(iterations=jnp.asarray(iters),
                          divergences=jnp.asarray(0),
                          accept_sum=jnp.asarray(acc_sum),
                          grad_evals=jnp.asarray(grads),
                          prev_energy=z, energy_trans2=z,
                          e_count=z, e_mean=z, e_raw=z)

    w = WindowedRates()
    assert w.update(st(100, 90.0, 1000)) == (None, None)  # first refresh
    # next 100 iterations accepted at only 0.10 — cumulative mean is
    # 0.50 but the window must report the recent 0.10
    win_acc, win_rate = w.update(st(200, 100.0, 2000))
    assert abs(win_acc - 0.10) < 1e-6
    assert win_rate is not None and win_rate > 0
    # a further all-accept window reports 1.0
    win_acc, _ = w.update(st(300, 200.0, 3000))
    assert abs(win_acc - 1.0) < 1e-6


def test_dual_avg_survives_total_rejection():
    """A chain that rejects every proposal must not drive the tuner's
    state to -inf/NaN: log_step floors at MIN_LOG_STEP, so exp() stays
    a positive (subnormal-free) f32 and a window-close reset stays
    finite.  Before the floor, ~30 all-reject iterations underflowed the
    step size to exactly 0 and the reset's log(0) = -inf poisoned every
    later update (observed as a chain reporting a divergence on every
    sampling iteration of the 10k-latent GLMM benchmark)."""
    import jax.numpy as jnp

    from rainier_tpu.sampler.dualavg import (
        MIN_LOG_STEP, dual_avg_init, dual_avg_reset, dual_avg_update,
        final_step_size)

    s = dual_avg_init(jnp.float32(1.0))
    for _ in range(200):
        s = dual_avg_update(s, jnp.float32(-jnp.inf), delta=0.9)
    assert np.isfinite(float(s.log_step))
    assert float(s.log_step) >= MIN_LOG_STEP
    assert float(final_step_size(s)) > 0.0
    # a window-close reset from the floored state must stay finite too
    s = dual_avg_reset(s)
    for _ in range(50):
        s = dual_avg_update(s, jnp.float32(-jnp.inf), delta=0.9)
    assert np.isfinite(float(s.log_step))
    assert np.isfinite(float(s.log_step_bar))
    # and the tuner still climbs once proposals accept again (recovery
    # is anchored by the shrinkage target, so assert direction and
    # finiteness rather than an absolute level)
    low = float(s.log_step)
    for _ in range(500):
        s = dual_avg_update(s, jnp.float32(0.0), delta=0.9)
    assert float(s.log_step) > low + 2.0
    assert float(final_step_size(s)) > 0.0
