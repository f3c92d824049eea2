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


def _sync(x):
    """Force completion: block_until_ready acks enqueue, not completion,
    over the remote device tunnel (docs/internals.md) — a one-element
    readback is dependency-ordered and cannot return early."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


def _timed(fn, *args):
    t0 = time.perf_counter()
    _sync(fn(*args))
    return time.perf_counter() - t0


def _eval_loop(f, iters):
    """Chain `iters` sequential evals inside one jit (data dependence via
    an infinitesimal gradient nudge) — measures sustained device latency/
    throughput without per-call dispatch overhead."""

    def loop(q):
        def step(c, _):
            lp, g = f(c)
            return c + 1e-20 * g, lp

        return jax.lax.scan(step, q, None, length=iters)

    from rainier_tpu import config as _cfg
    return _cfg.jit(loop)


def bench_model(name: str, build_fn, n_chains: int):
    t0 = time.perf_counter()
    model = build_fn()
    cd = model.density()
    cols = cd.column_values()
    lpg = cd.logp_and_grad_fn()

    def f(q):
        return lpg(q, cols)

    q = jnp.zeros((cd.n_vars,), jnp.float32)
    from rainier_tpu import config as _cfg
    _sync(_cfg.jit(f)(q))
    build_s = time.perf_counter() - t0

    # sequential-eval latency (JMH run() analogue).  One timed program
    # carries a fixed ~35 ms dispatch+sync round trip over the remote
    # device tunnel — at 1000 evals that pollutes the per-eval number by
    # ~35 µs, dwarfing the actual eval.  Difference two program lengths
    # instead: (t_long − t_short)/(n_long − n_short) cancels every fixed
    # cost exactly and measures the marginal dependent-eval latency.
    n_short, n_long = 1000, 21_000
    seq_s = _eval_loop(f, n_short)
    seq_l = _eval_loop(f, n_long)
    _sync(seq_s(q))
    _sync(seq_l(q))
    t_s = min(_timed(seq_s, q), _timed(seq_s, q))
    t_l = min(_timed(seq_l, q), _timed(seq_l, q))
    single_us = max(t_l - t_s, 0.0) / (n_long - n_short) * 1e6

    # batched throughput: chain batch of sequential evals
    bat_iters = 50
    bat = _eval_loop(jax.vmap(f), bat_iters)
    qs = jnp.zeros((n_chains, cd.n_vars), jnp.float32)
    _sync(bat(qs))
    t0 = time.perf_counter()
    _sync(bat(qs))
    dt = time.perf_counter() - t0
    evals_per_s = n_chains * bat_iters / dt

    rec = {
        "model": name,
        "n_vars": cd.n_vars,
        "build_s": round(build_s, 3),
        "single_eval_us": round(single_us, 2),
        "batched_evals_per_s": round(evals_per_s),
        "batch": n_chains,
    }
    # compile-time regression guard (round-1 pathology: 169s build for
    # readme_regression from XLA dot strength reduction; docs/internals.md)
    if build_s > 30:
        rec["build_slow"] = True
        print(f"WARNING: {name} build_s={build_s:.1f}s exceeds the 30s "
              "compile-time guard", file=sys.stderr)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*", default=[])
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fresh", action="store_true",
                    help="run each model in its own subprocess; avoids "
                    "the remote-compile-service slowdown correlated with "
                    "prior in-process device activity (docs/internals.md)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from benchmarks import models as M

    names = args.models or list(M.ALL)

    if args.fresh:
        import subprocess
        failed = []
        for name in names:
            cmd = [sys.executable, os.path.abspath(__file__), name,
                   "--chains", str(args.chains)]
            if args.cpu:
                cmd.append("--cpu")
            rc = subprocess.run(cmd, check=False).returncode
            if rc != 0:
                failed.append(name)
                print(json.dumps({"model": name, "error":
                                  f"subprocess exited {rc}"}), flush=True)
        if failed:
            print(f"FAILED: {', '.join(failed)}", file=sys.stderr)
            sys.exit(1)
        return

    # device-health control measured once per process (docs/internals.md
    # "Throughput variance"); fresh mode gives one per record
    from benchmarks.e2e import calibrate
    cal = round(calibrate())

    for name in names:
        try:
            rec = bench_model(name, M.ALL[name], args.chains)
            rec["calibration_evals_per_s"] = cal
            rec["device"] = str(jax.devices()[0])
            print(json.dumps(rec), flush=True)
        except Exception as e:  # keep the sweep going
            print(json.dumps({"model": name, "error": str(e)[:200]}),
                  flush=True)
            raise


if __name__ == "__main__":
    main()
