#!/usr/bin/env python
"""Data-at-scale kernel comparison: XLA scan vs fused Pallas kernel on
the logistic-regression likelihood as the dataset grows.

Answers SURVEY §7 M4's second half at realistic scale (does keeping the
per-observation data VMEM-resident beat the XLA program once n is large?)
with full driver-path adaptation — the reference's corresponding machinery
is the DataFunction row loop (ir/DataFunction.scala:48-84).  Above
ROW_TILE_MIN_ROWS the pallas run exercises the row-tiled accumulation
(ops/hmc_pallas.py row_tile), so the sweep covers untiled (4096), tiled
(16384) and tiled-at-scale (100000) in one artifact.

Both kernels run the same scan-path warmup; the compared number is the
sampling-phase throughput (grad evals/s) at equal grad-eval budgets.

Usage: python benchmarks/data_scale.py [--cpu] [--chains N]
       [--sizes 4096,16384,100000] [--iters N]
One JSON line per (n, kernel).
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


def run_point(n, kernel, n_chains, iters):
    import rainier_tpu as rt
    from rainier_tpu.sampler import HMC, SamplerConfig
    from benchmarks import models as M

    model = M.logistic_regression(n=n)
    cfg = SamplerConfig(iters, iters, sampler=HMC(8))
    # scan runs as one warmup program + one sampling program
    # (chunk_iters=iters) so its sample_s covers the SAME phase as the
    # pallas kernel's (which always reports warmup separately)
    kw = {} if kernel.startswith("pallas") else {"chunk_iters": iters}
    # warm run first: compiles (and any cold persistent-cache misses)
    # land here, so the measured run is steady-state throughput
    model.sample(cfg, n_chains=n_chains, seed=0, kernel=kernel, **kw)
    t0 = time.perf_counter()
    tr = model.sample(cfg, n_chains=n_chains, seed=1, kernel=kernel, **kw)
    wall = time.perf_counter() - t0
    timings = tr.timings or {}
    sample_s = timings.get("sample_s", tr.walltime)
    grad_evals = float(np.sum(np.asarray(tr.stats.grad_evals)))
    dr = tr.diagnostics(rank_normalized=True)
    return {
        "n": n,
        "kernel": kernel,
        "chains": n_chains,
        "iterations": tr.n_iterations,
        "wall_s": round(wall, 2),
        "warmup_s": timings.get("warmup_s"),
        "compile_s": timings.get("compile_s"),
        "sample_s": round(sample_s, 3),
        "grad_evals_per_s": round(grad_evals / sample_s),
        "accept": round(float(np.mean(np.asarray(tr.accept_rate()))), 3),
        "max_rhat_rank": round(float(max(x.r_hat for x in dr)), 4),
        "divergences": tr.divergences(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--sizes", default="4096,16384,100000")
    ap.add_argument("--iters", type=int, default=300)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmarks.e2e import calibrate

    failed = []
    for n in (int(s) for s in args.sizes.split(",")):
        base = None
        cal = round(calibrate())  # device-health control per size group
        for kernel in ("scan", "pallas!"):
            try:
                rec = run_point(n, kernel, args.chains, args.iters)
                rec["calibration_evals_per_s"] = cal
            except Exception as e:
                failed.append(f"{n}/{kernel}")
                rec = {"n": n, "kernel": kernel, "error": str(e)[:200]}
            if kernel == "scan":
                base = rec.get("grad_evals_per_s")
            elif base and rec.get("grad_evals_per_s"):
                rec["speedup_vs_scan"] = round(
                    rec["grad_evals_per_s"] / base, 2)
            rec["device"] = str(jax.devices()[0])
            print(json.dumps(rec), flush=True)
    if failed:
        print(f"FAILED: {', '.join(failed)}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
