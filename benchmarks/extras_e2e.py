#!/usr/bin/env python
"""TPU evidence records for the beyond-reference inference engines
(VERDICT r3 #9): one JSONL record each for SMC and ADVI, so both move
from "implemented + unit-tested" to "evidenced on hardware".

* smc_mixture — tempered SMC with systematic resampling on the
  2-component LowDimGaussMix model (bench/stan/LowDimGaussMix.scala:7-8
  is the reference's hardest published small bench: 649 µs/grad — the
  label-switching multimodality that hurts single-chain HMC is exactly
  SMC's case).  The record carries the evidence estimate, stage count,
  and recovered component means.
* advi_eight_schools — mean-field ADVI vs NUTS on eight-schools
  (bench/stan/EightSchools.scala): posterior mu/tau moment deltas
  between the two engines plus both wall clocks.

Usage: python benchmarks/extras_e2e.py [smc_mixture|advi_eight_schools]
       [--cpu]
One JSON line per config.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402


def smc_mixture():
    import rainier_tpu as rt
    from rainier_tpu.compute import real as R
    from rainier_tpu.sampler.smc import SMCConfig

    # the LowDimGaussMix generative setup (models.low_dim_gauss_mix,
    # bench/stan/LowDimGaussMix.scala) rebuilt inline so the component
    # means are evaluable expressions rather than raw parameter slots
    rng = np.random.default_rng(3)
    n = 1000
    z = rng.uniform(size=n) < 0.4
    ys = np.where(z, rng.normal(-2.0, 1.0, n), rng.normal(2.5, 0.8, n))
    mu1, s1 = rt.Normal(0, 2).latent(), rt.Normal(0, 2).latent().abs()
    mu2, s2 = rt.Normal(0, 2).latent(), rt.Normal(0, 2).latent().abs()
    theta = rt.Beta(5, 5).latent()
    mix = rt.Mixture({rt.Normal(mu1, s1): theta,
                      rt.Normal(mu2, s2): R.one - theta})
    model = rt.Model.observe(ys.tolist(), mix)

    cfg = SMCConfig(n_particles=4096, mutation_steps=10)
    model.smc(cfg, seed=0)   # compile + warm
    t0 = time.perf_counter()
    trace, res = model.smc(cfg, seed=1)
    wall = time.perf_counter() - t0
    m1, m2 = trace.evaluate([mu1, mu2])
    # label switching: order the components per draw before averaging
    mu_lo = float(np.minimum(m1, m2).mean())
    mu_hi = float(np.maximum(m1, m2).mean())
    return {
        "config": "smc_mixture",
        "n_vars": model.n_vars,
        "n_particles": cfg.n_particles,
        "mutation_steps": cfg.mutation_steps,
        "wall_s": round(wall, 2),
        "n_stages": int(res.n_stages),
        "log_evidence": round(float(res.log_evidence), 2),
        "particle_updates_per_s": round(
            cfg.n_particles * int(res.n_stages) * cfg.mutation_steps
            / wall),
        # truth: components at -2.0 and +2.5 (seed-3 synthetic data)
        "mu_lo_mean": round(mu_lo, 3),
        "mu_hi_mean": round(mu_hi, 3),
        "mu_lo_true": -2.0,
        "mu_hi_true": 2.5,
    }


def advi_eight_schools():
    import rainier_tpu as rt
    from rainier_tpu.sampler import NUTS, SamplerConfig
    from rainier_tpu.variational import advi
    from benchmarks.models import EIGHT_SCHOOLS_SIGMA, EIGHT_SCHOOLS_Y

    # eight-schools rebuilt inline so mu/tau are evaluable expressions
    mu = rt.Normal(0, 5).latent()
    tau = rt.Cauchy(0, 5).latent().abs()
    thetas = rt.Normal(mu, tau).latent_vec(len(EIGHT_SCHOOLS_Y))
    model = rt.Model.empty()
    for i, (y, s) in enumerate(zip(EIGHT_SCHOOLS_Y,
                                   EIGHT_SCHOOLS_SIGMA)):
        model = model.merge(rt.Model.observe([y],
                                             rt.Normal(thetas[i], s)))

    t0 = time.perf_counter()
    vp = advi(model, n_steps=3000, n_samples=16, learning_rate=0.05,
              seed=0)
    advi_s = time.perf_counter() - t0
    # NUTS reference moments (same fitted model)
    cfg = SamplerConfig(1000, 1000, sampler=NUTS(max_depth=8))
    t0 = time.perf_counter()
    tr = model.sample(cfg, n_chains=64, seed=0)
    nuts_s = time.perf_counter() - t0
    mu_a = float(np.mean(vp.evaluate(mu, n_draws=20_000, seed=1)))
    tau_a = float(np.mean(vp.evaluate(tau, n_draws=20_000, seed=1)))
    mu_n = float(np.mean(tr.evaluate(mu)))
    tau_n = float(np.mean(tr.evaluate(tau)))
    d = tr.diagnostics(rank_normalized=True)
    return {
        "config": "advi_eight_schools",
        "n_vars": model.n_vars,
        "advi_steps": 3000,
        "advi_s": round(advi_s, 2),
        "nuts_s": round(nuts_s, 2),
        "elbo_final": round(float(vp.elbo_trace[-1]), 2),
        "mu_advi": round(mu_a, 3),
        "mu_nuts": round(mu_n, 3),
        "tau_advi": round(tau_a, 3),
        "tau_nuts": round(tau_n, 3),
        "mu_abs_delta": round(abs(mu_a - mu_n), 3),
        "tau_abs_delta": round(abs(tau_a - tau_n), 3),
        "nuts_max_rhat_rank": round(max(x.r_hat for x in d), 4),
    }


RUNNERS = {"smc_mixture": smc_mixture,
           "advi_eight_schools": advi_eight_schools}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=[])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    failed = []
    for name in (args.configs or list(RUNNERS)):
        try:
            rec = RUNNERS[name]()
        except Exception as e:
            failed.append(name)
            rec = {"config": name, "error": str(e)[:200]}
        rec["device"] = str(jax.devices()[0])
        print(json.dumps(rec), flush=True)
    if failed:
        print(f"FAILED: {', '.join(failed)}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
