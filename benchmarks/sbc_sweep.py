#!/usr/bin/env python
"""SBC per-distribution benchmark sweep over synthetic dataset size.

Counterpart of the reference's SBCBenchmark, which JMH-parameterizes each
SBC model over n ∈ {100, 1k, 10k, 100k} synthetic observations
(rainier-benchmark/.../bench/sbc/SBCBenchmark.scala:22-23) and measures
one density+gradient evaluation.  Here each (family, n) point reports
build/compile time and the TPU-native operating point — batched
density+gradient throughput over a vmapped chain batch — so the committed
JSONL is the scaling curve of evals/s vs n.

Usage: python benchmarks/sbc_sweep.py [family ...] [--cpu] [--chains N]
       [--sizes 100,1000,10000,100000] [--fresh]
One JSON line per (family, n).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

DEFAULT_SIZES = [100, 1_000, 10_000, 100_000]


def _sync(x):
    """Force completion: block_until_ready acks enqueue, not completion,
    over the remote device tunnel (docs/internals.md)."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


def families():
    from tests.goldset_zoo import zoo

    return dict(zoo())


def bench_point(name, sbc, n, n_chains):
    from rainier_tpu import config as _cfg

    t0 = time.perf_counter()
    data, _ = sbc.synthesize(n, jax.random.PRNGKey(0))
    model, _ = sbc.fit(data)
    cd = model.density()
    cols = cd.column_values()
    lpg = cd.logp_and_grad_fn()

    def f(q):
        return lpg(q, cols)

    qs = jnp.zeros((n_chains, cd.n_vars), jnp.float32)

    def loop(qs):
        def step(c, _):
            lp, g = jax.vmap(f)(c)
            return c + 1e-20 * g, lp

        return jax.lax.scan(step, qs, None, length=20)

    run = _cfg.jit(loop)
    _sync(run(qs))
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    _sync(run(qs))
    dt = time.perf_counter() - t0
    rec = {
        "family": name,
        "n": n,
        "n_vars": cd.n_vars,
        "build_s": round(build_s, 3),
        "batched_evals_per_s": round(n_chains * 20 / dt),
        "batch": n_chains,
    }
    if build_s > 30:
        rec["build_slow"] = True
        print(f"WARNING: {name} n={n} build_s={build_s:.1f}s exceeds the "
              "30s compile-time guard", file=sys.stderr)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="*", default=[])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--sizes", default=",".join(map(str, DEFAULT_SIZES)))
    ap.add_argument("--fresh", action="store_true",
                    help="one subprocess per family (compile-service "
                    "isolation; docs/internals.md)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    names = args.families or list(families())

    if args.fresh:
        import subprocess
        failed = []
        for name in names:
            cmd = [sys.executable, os.path.abspath(__file__), name,
                   "--chains", str(args.chains), "--sizes", args.sizes]
            if args.cpu:
                cmd.append("--cpu")
            rc = subprocess.run(cmd, check=False).returncode
            if rc != 0:
                failed.append(name)
                print(json.dumps({"family": name, "error":
                                  f"subprocess exited {rc}"}), flush=True)
        if failed:
            print(f"FAILED: {', '.join(failed)}", file=sys.stderr)
            sys.exit(1)
        return

    fam = families()
    sizes = [int(s) for s in args.sizes.split(",")]
    # Warm the backend OUTSIDE any timed window: the process's first
    # device computation pays backend/tunnel session setup — measured
    # 230-460 s on the remote TPU platform *regardless of program*
    # (reproduced with the same trivial program first at n=100 and at
    # n=1000; the non-first points build in <3 s).  The r4 sweep's
    # "build_slow" n=100 rows were exactly this warmup mis-attributed
    # to the first (family, n) point of each --fresh subprocess.
    _sync(jnp.ones(()) + 1)
    for name in names:
        for n in sizes:
            try:
                rec = bench_point(name, fam[name], n, args.chains)
                rec["device"] = str(jax.devices()[0])
                print(json.dumps(rec), flush=True)
            except Exception as e:
                print(json.dumps({"family": name, "n": n,
                                  "error": str(e)[:200]}), flush=True)
                raise


if __name__ == "__main__":
    main()
