#!/usr/bin/env python
"""End-to-end sampling benchmarks on the BASELINE.md configs: full
adaptive warmup + sampling, reporting walltime, samples/s and ESS/s.

Usage: python benchmarks/e2e.py [config ...] [--cpu] [--chains N]
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


def run_config(name, n_chains_default):
    import rainier_tpu as rt
    from rainier_tpu.sampler import HMC, NUTS, SamplerConfig
    from benchmarks import models as M

    if name == "funnel_hmc":
        model = M.funnel()
        cfg = SamplerConfig(1000, 10_000, sampler=HMC(5))
        chains, collect = n_chains_default, None
    elif name == "readme_regression_nuts":
        model = M.readme_regression()
        cfg = SamplerConfig(1000, 1000, sampler=NUTS(max_depth=8))
        chains, collect = n_chains_default, None
    elif name == "eight_schools_nuts":
        model = M.eight_schools()
        cfg = SamplerConfig(1000, 1000, sampler=NUTS(max_depth=8))
        chains, collect = n_chains_default, None
    elif name == "logistic_100k":
        # NUTS, not fixed-length HMC: overdispersed inits start ~600
        # posterior SDs from this extremely concentrated posterior
        # (n=100k), and 8-step trajectories can't make the trek during
        # warmup (measured: HMC(8) r-hat 1.1-14, NUTS r-hat 1.003).
        model = M.logistic_regression()
        cfg = SamplerConfig(500, 500, sampler=NUTS(max_depth=8))
        chains, collect = min(n_chains_default, 256), None
    elif name == "glmm_10k_latents":
        # NUTS + full 500/500 budget: fixed 8-step trajectories leave the
        # hierarchy's global scale poorly mixed (measured r-hat 1.39 for
        # HMC(8) 300+300 vs 1.05 for NUTS 500+500; the latent_vec
        # parameterization is already non-centered, which beats centered
        # r-hat 4.0 here).
        model = M.glmm_large()
        cfg = SamplerConfig(500, 500, sampler=NUTS(max_depth=8))
        chains = min(n_chains_default, 128)
        collect = list(range(8))  # track a subset; 10k×chains×iters is TBs
    else:
        raise KeyError(name)

    t0 = time.perf_counter()
    tr = model.sample(cfg, n_chains=chains, seed=0, collect_idx=collect)
    wall = time.perf_counter() - t0
    draws = chains * tr.n_iterations
    try:
        d = tr.diagnostics()
        min_ess = float(min(x.effective_sample_size for x in d))
        max_rhat = float(max(x.r_hat for x in d))
    except Exception:
        min_ess, max_rhat = float("nan"), float("nan")
    return {
        "config": name,
        "n_vars": model.n_vars,
        "chains": chains,
        "iterations": tr.n_iterations,
        "wall_s": round(wall, 2),
        "sample_wall_s": round(tr.walltime, 2),
        "samples_per_s": round(draws / tr.walltime),
        "min_ess": round(min_ess, 1),
        "ess_per_s": round(min_ess / tr.walltime, 1),
        "max_rhat": round(max_rhat, 4),
        "divergences": tr.divergences(),
        "grad_evals_per_s": round(float(np.sum(np.asarray(
            tr.stats.grad_evals))) / tr.walltime),
    }


ALL = ["funnel_hmc", "readme_regression_nuts", "eight_schools_nuts",
       "logistic_100k", "glmm_10k_latents"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=[])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chains", type=int, default=1024)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    for name in (args.configs or ALL):
        rec = run_config(name, args.chains)
        rec["device"] = str(jax.devices()[0])
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
