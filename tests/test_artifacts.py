"""Committed-evidence staleness guard (round-3 verdict #1).

Round 2 and round 3 both shipped benchmark JSONLs that predated the
config or kernel fix that invalidated them ("the guard fired and the red
number shipped anyway").  This test makes that failure mode a CI failure:
every committed current-round artifact (see ROUND below) must

* exist, parse, and contain a record for every config/model its harness
  currently defines (no silently-partial sweeps),
* carry no ``error`` records,
* match the *current* harness configuration on the fields that define
  the measurement (chains, iterations, model size) — so changing a
  config in ``benchmarks/e2e.py`` without re-capturing the JSONL fails
  the suite instead of misleading the judge.

The artifacts are plain committed files; no device is needed.
"""

import json
import os

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks")

ROUND = "r5"


def _load(name):
    path = os.path.join(BENCH, name)
    if not os.path.exists(path):
        pytest.fail(f"{name} missing — the evidence sweep "
                    f"(benchmarks/sweep_{ROUND}.sh) was not captured")
    with open(path) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    assert recs, f"{name} is empty"
    bad = [r for r in recs if "error" in r]
    assert not bad, f"{name} contains error records: {bad}"
    return recs


def test_e2e_artifact_current():
    from benchmarks import e2e

    recs = _load(f"e2e_tpu_{ROUND}.jsonl")
    by_config = {}
    for r in recs:
        by_config.setdefault(r["config"], []).append(r)
    missing = [c for c in e2e.ALL if c not in by_config]
    assert not missing, f"e2e configs never captured: {missing}"
    # measurement-defining fields must match the harness as committed
    expected_iters = {"funnel_hmc": 10_000, "readme_regression_nuts": 1000,
                      "eight_schools_nuts": 1000, "ehmc_default": 1000,
                      "logistic_100k": 500, "glmm_10k_latents": 2000}
    for cfg, iters in expected_iters.items():
        for r in by_config[cfg]:
            assert r["iterations"] == iters, (
                f"{cfg} record captured at iterations={r['iterations']} "
                f"but the harness now runs {iters} — re-run the sweep")
    # phase breakdown must be attributable on every record
    for r in recs:
        assert r.get("warmup_s") is not None, f"{r['config']}: warmup_s null"
        # a capped ESS estimator must never be presented as a rate; the
        # cap arithmetic is shared with trace.py/e2e.py so it cannot
        # silently drift from the pipeline's actual thinning
        from rainier_tpu.core.trace import rank_diag_cap

        rank_cap = rank_diag_cap(r["chains"], r["iterations"])
        if r.get("min_ess_bulk", 0) >= 0.99 * rank_cap:
            assert r.get("ess_per_s") is None, (
                f"{r['config']}: capped ESS printed as a rate")


def test_zoo_artifact_complete():
    from benchmarks import models as M

    recs = _load(f"results_tpu_{ROUND}.jsonl")
    names = {r["model"] for r in recs}
    missing = sorted(set(M.ALL) - names)
    assert not missing, f"zoo models never captured: {missing}"


def test_sbc_sweep_artifact_complete():
    recs = _load(f"sbc_sweep_tpu_{ROUND}.jsonl")
    sizes = {100, 1_000, 10_000, 100_000}
    by_family = {}
    for r in recs:
        by_family.setdefault(r["family"], set()).add(r["n"])
    short = {f: sorted(sizes - ns) for f, ns in by_family.items()
             if sizes - ns}
    assert not short, f"sbc sweep missing sizes: {short}"
    assert len(by_family) >= 12, (
        f"sbc sweep covers {len(by_family)} families; the goldset zoo "
        "has 12")


def test_ehmc_fair_artifact():
    recs = _load(f"ehmc_fair_tpu_{ROUND}.jsonl")
    samplers = {r["sampler"] for r in recs}
    assert {"hmc5", "ehmc1024"} <= samplers
    chains = {r["chains"] for r in recs}
    assert len(chains) == 1, (
        f"EHMC-vs-HMC records at unequal chain counts {chains} — the "
        "point of the harness is equal footing")


def test_extras_artifact():
    recs = _load(f"extras_tpu_{ROUND}.jsonl")
    configs = {r["config"] for r in recs}
    assert {"smc_mixture", "advi_eight_schools"} <= configs


def test_profile_artifact():
    recs = _load(f"profile_tpu_{ROUND}.jsonl")
    configs = {r["config"] for r in recs}
    assert {"funnel", "logistic"} <= configs
    for r in recs:
        assert r.get("device_total_ms", 0) > 0
