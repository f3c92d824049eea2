#!/usr/bin/env python
"""Benchmark runner mirroring the reference's JMH protocol
(rainier-benchmark/.../ModelBenchmark.scala:16-52):

* build  — model graph construction + compile time (their `build()`);
* run    — one density+gradient evaluation (their `run()` =
  `df.update(params)`), reported as single-eval latency AND as batched
  throughput (the TPU-native operating point: a vmapped chain batch).

Usage: python benchmarks/run.py [model ...] [--chains N] [--cpu]
Outputs one JSON line per model.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench_model(name: str, build_fn, n_chains: int):
    t0 = time.perf_counter()
    model = build_fn()
    cd = model.density()
    cols = cd.column_values()
    lpg = cd.logp_and_grad_fn()

    def f(q):
        return lpg(q, cols)

    single = jax.jit(f)
    q = jnp.zeros((cd.n_vars,), jnp.float32)
    out = single(q)
    jax.block_until_ready(out)
    build_s = time.perf_counter() - t0

    # single-eval latency (JMH run() analogue)
    reps = 100
    t0 = time.perf_counter()
    for _ in range(reps):
        out = single(q)
    jax.block_until_ready(out)
    single_us = (time.perf_counter() - t0) / reps * 1e6

    # batched throughput: vmapped over a chain batch
    batched = jax.jit(jax.vmap(f))
    qs = jnp.zeros((n_chains, cd.n_vars), jnp.float32)
    out = batched(qs)
    jax.block_until_ready(out)
    inner = 10
    t0 = time.perf_counter()
    for _ in range(inner):
        out = batched(qs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    evals_per_s = n_chains * inner / dt

    return {
        "model": name,
        "n_vars": cd.n_vars,
        "build_s": round(build_s, 3),
        "single_eval_us": round(single_us, 2),
        "batched_evals_per_s": round(evals_per_s),
        "batch": n_chains,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", default=[])
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from benchmarks import models as M

    names = args.models or list(M.ALL)
    for name in names:
        try:
            rec = bench_model(name, M.ALL[name], args.chains)
            rec["device"] = str(jax.devices()[0])
            print(json.dumps(rec), flush=True)
        except Exception as e:  # keep the sweep going
            print(json.dumps({"model": name, "error": str(e)[:200]}),
                  flush=True)
            raise


if __name__ == "__main__":
    main()
