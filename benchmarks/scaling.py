#!/usr/bin/env python
"""Chain-parallel scaling harness (BASELINE target: >= 80% samples/s
scaling efficiency from 1 host to N hosts).

Weak scaling: chains grow proportionally with device count, so perfect
scaling is flat time / linear samples-per-second.  Runs on whatever
devices are attached — N virtual CPU devices (--cpu N, the CI
configuration), a real TPU slice, or a multi-host world when launched
under jax.distributed (one process per host; results printed by process
0).  One JSON line per device count plus a summary line with the
measured efficiency.

Usage: python benchmarks/scaling.py [--cpu N] [--chains-per-device C]
       [--iters I]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="force CPU backend with N virtual devices")
    ap.add_argument("--chains-per-device", type=int, default=256)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host mode: jax.distributed.initialize() "
                    "from TPU pod env vars (or COORDINATOR_ADDRESS/"
                    "NUM_PROCESSES/PROCESS_ID); run one process per "
                    "host — THE one-command 1->N-host scaling capture")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.cpu}"
        ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import rainier_tpu as rt
    from rainier_tpu.parallel import make_mesh
    from rainier_tpu.sampler import HMC, SamplerConfig

    if args.distributed:
        from rainier_tpu.parallel.distributed import initialize

        initialize()  # env-driven; no-op when single-process

    def emit(obj):
        # multi-host: every process computes, process 0 reports
        if jax.process_index() == 0:
            print(json.dumps(obj), flush=True)

    n_dev = jax.device_count()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_dev]
    if counts[-1] != n_dev:
        counts.append(n_dev)
    if jax.process_count() > 1:
        # multi-host: a mesh over a device subset would exclude some
        # process's local devices (XLA requires every process's devices
        # to participate), so each launch measures its full world; the
        # 1-host baseline comes from a separate single-host launch and
        # the operator divides the two per-device rates
        counts = [n_dev]

    rng = np.random.default_rng(0)
    data = rng.normal(1.0, 2.0, size=256)

    cfg = SamplerConfig(warmup_iterations=args.warmup,
                        iterations=args.iters, sampler=HMC(5),
                        pooled_adaptation=True)
    rates = {}
    for nd in counts:
        mu = rt.Normal(0, 10).latent()
        sigma = rt.Exponential(0.5).latent()
        model = rt.Model.observe(list(data), rt.Normal(mu, sigma))
        mesh = make_mesh(n_chain_shards=nd,
                         devices=jax.devices()[:nd])
        chains = args.chains_per_device * nd
        # one throwaway run to compile, one timed
        model.sample(cfg, n_chains=chains, seed=0, mesh=mesh)
        t0 = time.perf_counter()
        tr = model.sample(cfg, n_chains=chains, seed=1, mesh=mesh)
        dt = time.perf_counter() - t0
        rate = chains * args.iters / dt
        rates[nd] = rate
        emit({
            "devices": nd, "chains": chains, "wall_s": round(dt, 3),
            "samples_per_s": round(rate),
            "per_device": round(rate / nd),
            "mu": round(float(tr.mean(mu)), 3),
        })

    if len(counts) == 1:
        return  # multi-host single-point launch: no in-run baseline
    base = rates[counts[0]] / counts[0]
    eff = (rates[counts[-1]] / counts[-1]) / base
    rec = {
        "metric": "weak-scaling efficiency "
                  f"{counts[0]}->{counts[-1]} devices",
        "value": round(eff, 3),
        "unit": "fraction",
        "target": 0.8,
        "pass": bool(eff >= 0.8),
        "device": str(jax.devices()[0]),
    }
    if jax.devices()[0].platform == "cpu":
        rec["note"] = ("virtual CPU devices share host cores: this run "
                       "validates harness mechanics, not hardware "
                       "scaling (the 80% target applies to real chips)")
    emit(rec)


if __name__ == "__main__":
    main()
