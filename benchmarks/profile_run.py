#!/usr/bin/env python
"""Device-profile capture + summary for the e2e configs.

Runs `rainier_tpu.inspect.trace` (jax.profiler) on a short adaptive
sampling run and summarizes the captured trace events — per-op device
time, top ops, and total traced device time — so docs/performance.md can
cite a real profile instead of wall-clock subtraction (VERDICT r2 #8).
The reference's corresponding telemetry is the nanosecond gradient
bracketing in sampler/LeapFrog.scala:194-200.

Usage: python benchmarks/profile_run.py [funnel|logistic ...] [--cpu]
Prints one JSON line per config with the top-op breakdown.
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402


def summarize_trace(log_dir, top: int = 12):
    """Aggregate duration by event name from the profiler's
    trace.json.gz (Chrome trace format: 'X' complete events with
    microsecond durations); device lanes are PIDs whose process_name
    metadata is not the python host."""
    paths = glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if any(s in n.lower() for s in ("tpu", "device",
                                                   "xla", "/device"))}
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        by_name[e.get("name", "?")] += e["dur"]
        total += e["dur"]
    ops = sorted(by_name.items(), key=lambda kv: -kv[1])[:top]
    return {
        "trace_file": os.path.basename(path),
        "device_total_ms": round(total / 1e3, 2),
        "top_ops_ms": {k[:80]: round(v / 1e3, 2) for k, v in ops},
    }


def run(name):
    import rainier_tpu as rt
    from rainier_tpu.sampler import HMC, NUTS, SamplerConfig
    from benchmarks import models as M

    if name == "funnel":
        model = M.funnel()
        cfg = SamplerConfig(200, 1000, sampler=HMC(5))
        chains = 1024
    elif name == "logistic":
        model = M.logistic_regression()
        cfg = SamplerConfig(100, 100, sampler=NUTS(max_depth=8))
        chains = 256
    else:
        raise KeyError(name)
    log_dir = f"/tmp/rainier_trace_{name}"
    rt.inspect.trace(model, cfg, log_dir=log_dir, n_chains=chains, seed=0)
    rec = {"config": name, "chains": chains,
           "device": str(jax.devices()[0])}
    summary = summarize_trace(log_dir)
    if summary:
        rec.update(summary)
    else:
        rec["error"] = "no trace files captured"
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=[])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    for name in (args.configs or ["funnel", "logistic"]):
        try:
            rec = run(name)
        except Exception as e:
            rec = {"config": name, "error": str(e)[:300]}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
