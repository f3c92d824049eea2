#!/usr/bin/env python
"""Equal-footing EHMC vs HMC on Neal's funnel (VERDICT r2 #4 / r3 #5).

Both samplers run the same chain count, warmup and iteration budget; the
record reports grad evals, sample-phase time and per-grad-eval cost so
the EHMC overhead (vmapped variable-length trajectories serialize to the
batch max; samplers.py synchronized lengths mitigate) is measured on
equal footing rather than inferred from differently-shaped e2e records.
Reference anchor: EHMC trajectory-length replay
(rainier-sampler/.../sampler/EHMC.scala:52-63); the reference's
DefaultConfig samples with EHMC(1024) (sampler/Sampler.scala:16-27).

Usage: python benchmarks/ehmc_fair.py [--cpu] [--chains N] [--iters N]
One JSON line per sampler.
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


def run(smp, label, chains, iters):
    from rainier_tpu.sampler import SamplerConfig
    from benchmarks import models as M

    model = M.funnel()
    cfg = SamplerConfig(iters, iters, sampler=smp)
    model.sample(cfg, n_chains=chains, seed=0)   # compile + warm
    t0 = time.perf_counter()
    tr = model.sample(cfg, n_chains=chains, seed=1)
    wall = time.perf_counter() - t0
    grads = float(np.sum(np.asarray(tr.stats.grad_evals)))
    wgrads = float(np.sum(np.asarray(tr.warmup_stats.grad_evals)))
    sample_s = tr.timings.get("sample_s")
    d = tr.diagnostics(rank_normalized=True)
    return {
        "sampler": label,
        "chains": chains,
        "iterations": iters,
        "wall_s": round(wall, 2),
        "warmup_s": tr.timings.get("warmup_s"),
        "sample_s": round(sample_s, 2),
        "grad_evals": grads,
        "warmup_grad_evals": wgrads,
        "grad_evals_per_s": round(grads / sample_s),
        "us_per_transition": round(sample_s / (chains * iters) * 1e6, 2),
        "min_ess_bulk": round(min(x.effective_sample_size for x in d), 1),
        "max_rhat_rank": round(max(x.r_hat for x in d), 4),
        "divergences": tr.divergences(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=1000)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rainier_tpu.sampler import EHMC, HMC

    for smp, label in ((HMC(5), "hmc5"), (EHMC(max_steps=1024),
                                          "ehmc1024")):
        rec = run(smp, label, args.chains, args.iters)
        rec["device"] = str(jax.devices()[0])
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
