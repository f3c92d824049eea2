#!/usr/bin/env python
"""End-to-end sampling benchmarks on the BASELINE.md configs: full
adaptive warmup + sampling, reporting a complete wall-clock breakdown
(build / compile / sample / transfer / diagnostics — the phases sum to
wall_s) plus throughput and *robust* convergence diagnostics.

Two diagnostic variants are reported (docs/performance.md "ESS
estimators"):
  * min_ess / max_rhat — the classic Stan-manual estimators the
    reference implements (Trace.scala:49-120).  The autocorrelation sum
    clips at 0, capping ESS at chains×iterations; `ess_capped` flags
    records where the cap binds (common on fast-mixing posteriors with
    many chains — the number is then a lower-bound artifact, not
    evidence of n·m independent draws).
  * min_ess_bulk / max_rhat_rank — rank-normalized split-chain bulk
    diagnostics (Vehtari et al. 2021), robust to heavy tails; ess_per_s
    uses THIS estimator against the honest sample-phase denominator.

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


def calibrate():
    """Device-health control: sustained grad-eval rate of a fixed funnel
    hot loop (~0.2 s), measured immediately before each config.  The
    shared remote TPU's effective throughput has been observed to degrade
    ~100x for stretches of minutes (docs/internals.md); a record whose
    calibration is far below ~1.3e9/s on v5e was captured in such a
    window and should be re-run, not compared."""
    import jax.numpy as jnp
    from rainier_tpu.sampler import identity_mass
    from rainier_tpu.sampler.leapfrog import ChainState, hmc_transition

    C, IT = 32768, 500

    def lpg(q):
        def f(qq):
            return (-0.5 * (qq[0] / 3.0) ** 2 - 0.5 * jnp.sum(
                qq[1:] * qq[1:] * jnp.exp(-qq[0])) - 4.5 * qq[0])
        return f(q), jax.grad(f)(q)

    def chain_run(key, q0):
        lp, g = lpg(q0)
        state = ChainState(q=q0, potential=-lp, grad=g)

        def step(carry, _):
            key, state = carry
            key, k = jax.random.split(key)
            res = hmc_transition(k, state, jnp.float32(0.18), 5,
                                 identity_mass(), lpg)
            return (key, res.state), None

        (_, state), _ = jax.lax.scan(step, (key, state), None, length=IT)
        return state.q

    run = jax.jit(lambda keys, q0: jnp.sum(jax.vmap(chain_run)(keys, q0)))
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    q0 = jnp.zeros((C, 10), jnp.float32)
    float(run(keys, q0))  # compile + warm
    t0 = time.perf_counter()
    float(run(keys, q0))
    return C * IT * 5 / (time.perf_counter() - t0)


def run_config(name, n_chains_default):
    import rainier_tpu as rt
    from rainier_tpu.sampler import EHMC, HMC, NUTS, SamplerConfig
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
    elif name == "ehmc_default":
        # the reference's DefaultConfig: 1000/1000, EHMC(1024)
        # (sampler/Sampler.scala:16-27) — the variable-trajectory path
        # whose vmapped while_loop is the known TPU risk (SURVEY §7
        # hard part 1); benchmarked on the funnel for comparability
        # with funnel_hmc at equal iteration counts
        model = M.funnel()
        cfg = SamplerConfig(1000, 1000, sampler=EHMC(max_steps=1024))
        chains, collect = min(n_chains_default, 256), None
    elif name == "logistic_100k":
        # NUTS, not fixed-length HMC: overdispersed inits start ~600
        # posterior SDs from this extremely concentrated posterior
        # (n=100k), and 8-step trajectories can't make the trek during
        # warmup (measured: HMC(8) r-hat 1.1-14, NUTS r-hat 1.003).
        model = M.logistic_regression()
        cfg = SamplerConfig(500, 500, sampler=NUTS(max_depth=8))
        # 1024 chains fit comfortably (per-chain state is 11 params;
        # the 100k x 10 design matrix is shared); NUTS batch-sync loss
        # grows slowly with chains on this concentrated posterior
        chains, collect = min(n_chains_default, 1024), None
    elif name == "glmm_10k_latents":
        # NUTS(max_depth=10, delta=0.8) + the model's VIP-centered group
        # effects (lam=1.0, models.glmm_large).  The r3/r4 failures were
        # the *sampler config*, not the geometry: overdispersed chains
        # start up to ~400 posterior SDs from the mode in (mu, log sd),
        # and depth-8 trajectories at delta=0.9's small steps could not
        # make the trek — chains crawled toward the mode for the whole
        # run (r4: classic r̂ 121 with a stuck divergent chain; after
        # the non-finite-energy accept fix, r̂ 7 with chains spread
        # along the approach path).  Depth-10 trajectories at the
        # standard 0.8 target converge cleanly at 128 chains
        # (measured r5: rank-r̂ 1.011, 0 divergences, ESS/s ~227 —
        # 75x the r4 record); 2000 sampling iterations push the
        # rank-r̂ sampling-noise floor below the 1.01 acceptance bar.
        # tuning probes rejected (r5, measured at 128 chains): pooled
        # adaptation triples wall (warmup 549 s vs 112 s — per-iteration
        # cross-chain collectives + a shared step size that tracks the
        # slowest chain) and larger chunks don't help (chunk 250:
        # sample_s 90 s vs 88 s).
        model = M.glmm_large()
        cfg = SamplerConfig(1000, 2000, sampler=NUTS(max_depth=10))
        # 128-chain cap: both 256- and 512-chain x 10002-param NUTS
        # reproducibly crash the remote TPU worker ("TPU worker process
        # crashed or restarted", 3x on a healthy device, r5) — the
        # shared worker does not survive that program's footprint even
        # though the arithmetic HBM budget (~1 GB of carry state) fits
        chains = min(n_chains_default, 128)
        collect = list(range(8))  # track a subset; 10k×chains×iters is TBs
    else:
        raise KeyError(name)

    # this config's single fused program runs for minutes on-device; the
    # remote TPU runtime kills workers on very long single programs, so
    # run warmup/sampling as ~100-iteration chunk programs
    # (docs/internals.md "Synchronization over the remote TPU service")
    chunk = 100 if name == "glmm_10k_latents" else None

    t0 = time.perf_counter()
    # sync_compile: a throwaway execution of each program keeps deferred
    # backend compiles (the remote compile helper acks before finishing)
    # out of warmup_s/sample_s — phases then measure device work
    tr = model.sample(cfg, n_chains=chains, seed=0, collect_idx=collect,
                      chunk_iters=chunk, sync_compile=True)
    t1 = time.perf_counter()
    draws = chains * tr.n_iterations

    # diagnostics run device-side on the device-resident samples — no
    # host transfer needed for a sample→diagnose workflow.  Separate
    # failure domains (a rank-pipeline failure must not NaN the classic
    # estimators), and separate compile from execution: the first pass
    # pays the two diag programs' compiles (tens of seconds over a
    # remote compile service), the second pass measures the pipeline.
    def _try(fn):
        try:
            return fn()
        except Exception:
            return None

    def _run_diags():
        d = _try(lambda: tr.diagnostics())
        dr = _try(lambda: tr.diagnostics(rank_normalized=True))
        return d, dr

    import warnings as _w

    with _w.catch_warnings(record=True) as _wlist:
        _w.simplefilter("always")
        d, dr = _run_diags()
    diag_compile_s = time.perf_counter() - t1
    t1 = time.perf_counter()
    if any("cross-check" in str(x.message) for x in _wlist):
        # the rank pipeline fell back to the f64 host oracle (device
        # miscompile at this trace shape); the host pass has no compile
        # to amortize, so do NOT pay it twice — keep the first pass's
        # results and attribute its full cost to diag_s
        diag_s_override = diag_compile_s
        diag_compile_s = 0.0
    else:
        diag_s_override = None
        d, dr = _run_diags()
    if d is not None:
        min_ess = float(min(x.effective_sample_size for x in d))
        max_rhat = float(max(x.r_hat for x in d))
    else:
        min_ess = max_rhat = float("nan")
    if dr is not None:
        min_ess_bulk = float(min(x.effective_sample_size for x in dr))
        max_rhat_rank = float(max(x.r_hat for x in dr))
    else:
        min_ess_bulk = max_rhat_rank = float("nan")
    if diag_s_override is not None:
        diag_s = diag_s_override
    else:
        diag_s = time.perf_counter() - t1
        diag_compile_s -= diag_s
    # device-side posterior summary (mean/sd/quantiles) instead of
    # materializing the full trace on the host: the r4 funnel_hmc@8192
    # record spent 192 of 208 s (92% of wall) pulling 3.3 GB of draws
    # over the remote-device tunnel that no benchmark consumer read.
    # A consumer that DOES need host draws still pays tr.chains
    # explicitly; `summary_s` is the summarize-phase cost.
    t_sum = time.perf_counter()
    summ = tr.summary()
    summary_s = time.perf_counter() - t_sum
    wall = time.perf_counter() - t0
    timings = dict(tr.timings or {})
    timings["transfer_s"] = round(
        (timings.get("transfer_s") or 0.0) + (tr.transfer_s or 0.0), 3)
    sample_s = timings.get("sample_s", tr.walltime)
    # the ESS estimators clip autocorrelation at 0, capping ESS at
    # chains×iterations; when the cap binds the capped value is a lower
    # bound, NOT evidence of n·m independent draws — so the rate built
    # from it is reported only as a lower bound (round-3 verdict #4)
    ess_capped = bool(min_ess >= 0.99 * draws)
    # the rank pipeline diagnoses a thinned subsample above 2^24 pooled
    # draws, so its ESS caps at the thinned draw count — shared helper
    # so this arithmetic cannot drift from trace.py / the artifact guard
    from rainier_tpu.core.trace import rank_diag_cap

    rank_cap = rank_diag_cap(chains, tr.n_iterations)
    bulk_capped = bool(min_ess_bulk >= 0.99 * rank_cap)
    rec = {
        "config": name,
        "n_vars": model.n_vars,
        "chains": chains,
        "iterations": tr.n_iterations,
        "wall_s": round(wall, 2),
        # phase breakdown (sums to wall_s up to rounding); every path
        # now times warmup as its own phase (the fused path splits into
        # warmup + sampling programs with one sync at the boundary)
        "build_s": timings.get("build_s"),
        "compile_s": timings.get("compile_s"),
        # throwaway execution that flushes deferred backend compiles
        # (compile remainder + one program run; own key so compile_s
        # stays a pure AOT-compile measurement)
        "compile_sync_s": timings.get("compile_sync_s"),
        "warmup_s": timings.get("warmup_s"),
        "sample_s": round(sample_s, 2),
        "transfer_s": timings.get("transfer_s"),
        "summary_s": round(summary_s, 2),
        # posterior location of the first tracked parameter, so the
        # record carries statistical evidence, not just rates
        "param0_mean": round(float(summ.mean[0]), 4),
        "param0_sd": round(float(summ.sd[0]), 4),
        "diag_s": round(diag_s, 2),
        "diag_compile_s": round(diag_compile_s, 2),
        # throughput: device rate (sampling phase only — warmup is its
        # own phase) and honest end-to-end rate
        "samples_per_s": round(draws / sample_s),
        "samples_per_s_e2e": round(draws / wall),
        # classic (reference-parity) estimators; ESS is capped at n·m
        "min_ess": round(min_ess, 1),
        "max_rhat": round(max_rhat, 4),
        "ess_capped": ess_capped,
        # robust rank-normalized split-chain estimators (honest rates)
        "min_ess_bulk": round(min_ess_bulk, 1),
        "max_rhat_rank": round(max_rhat_rank, 4),
        "ess_per_s": (None if bulk_capped
                      else round(min_ess_bulk / sample_s, 1)),
        "ess_per_s_lower_bound": (round(min_ess_bulk / sample_s, 1)
                                  if bulk_capped else None),
        "divergences": tr.divergences(),
        "grad_evals_per_s": round(float(np.sum(np.asarray(
            tr.stats.grad_evals))) / sample_s),
    }
    return rec


ALL = ["funnel_hmc", "readme_regression_nuts", "eight_schools_nuts",
       "ehmc_default", "logistic_100k", "glmm_10k_latents"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=[])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--fresh", action="store_true",
                    help="one subprocess per config (compile-service "
                    "isolation; docs/internals.md)")
    ap.add_argument("--no-cache", action="store_true",
                    help="disable the persistent XLA compilation cache "
                    "(measures cold compiles)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.no_cache:
        # persistent compilation cache: a warm second run deserializes
        # executables instead of recompiling (compile_s 13-67 s -> <2 s
        # for the NUTS configs); records carry compile_s either way
        from rainier_tpu import config as _gc

        _gc.enable_compilation_cache()
    if args.fresh:
        import subprocess
        failed = []
        for name in (args.configs or ALL):
            cmd = [sys.executable, os.path.abspath(__file__), name,
                   "--chains", str(args.chains)]
            if args.cpu:
                cmd.append("--cpu")
            if args.no_cache:
                cmd.append("--no-cache")
            rc = subprocess.run(cmd, check=False).returncode
            if rc != 0:
                failed.append(name)
                print(json.dumps({"config": name, "error":
                                  f"subprocess exited {rc}"}), flush=True)
        if failed:
            print(f"FAILED: {', '.join(failed)}", file=sys.stderr)
            sys.exit(1)
        return
    failed = []
    for name in (args.configs or ALL):
        try:
            cal = calibrate()
            rec = run_config(name, args.chains)
            rec["calibration_evals_per_s"] = round(cal)
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
