#!/usr/bin/env python
"""Headline benchmark: leapfrog gradient evaluations / second / chip on
Neal's funnel (10-dim) — the BASELINE.json metric (reference: <1µs per
density+gradient eval on a laptop core ⇒ ~10^6 evals/s; README.md:44).

Runs the pure sampling hot loop (fixed step size + identity mass, HMC with
5 leapfrog steps — the reference's benchmark configuration) over a large
vmapped chain batch inside one jitted scan, so the measured number is the
sustained device throughput of the compiled leapfrog.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "grad_evals_per_s", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# 524288 chains: the fused kernel's throughput keeps rising with batch
# width as per-iteration overheads amortize (r5 sweep on v5e: 1.81B
# evals/s at 32k chains, 2.55B at 64k, 3.08B at 128k, 3.45B at 256k,
# 3.69B at 512k, 3.81B at 1M — 512k is the knee).  State is 10 f32s per
# chain, so even 1M chains is only ~40 MB of VMEM-resident state.
N_CHAINS = int(os.environ.get("BENCH_CHAINS", 524288))
N_ITERS = int(os.environ.get("BENCH_ITERS", 500))
N_STEPS = int(os.environ.get("BENCH_LEAPFROG", 5))
BASELINE_GRAD_EVALS_PER_S = 1e6  # reference: ~1µs/eval on one CPU core


def funnel_lpg():
    """Neal's funnel, 10-dim, in its natural (centered) parameterization:
    y ~ N(0,3); x_i ~ N(0, exp(y/2)), i=1..9.  Hand-fused closed form for
    the benchmark (the model-built form lowers to the same XLA)."""

    def lpg(q):
        y = q[0]
        x = q[1:]
        lp = -0.5 * (y / 3.0) ** 2 - 0.5 * jnp.sum(
            x * x * jnp.exp(-y)) - 4.5 * y
        return lp, jax.grad(
            lambda qq: -0.5 * (qq[0] / 3.0) ** 2 - 0.5 * jnp.sum(
                qq[1:] * qq[1:] * jnp.exp(-qq[0])) - 4.5 * qq[0])(q)

    return lpg


def _time_runs(fn, args_list):
    """fn returns a scalar; float() forces a real device sync (the remote
    platform's block_until_ready is unreliable for timing)."""
    float(fn(*args_list[0]))
    times = []
    for args in args_list[1:]:
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_xla_scan():
    from rainier_tpu.sampler import identity_mass
    from rainier_tpu.sampler.leapfrog import ChainState, hmc_transition

    lpg = funnel_lpg()
    mass = identity_mass()
    eps = jnp.asarray(0.18, jnp.float32)

    def chain_run(key, q0):
        lp, g = lpg(q0)
        state = ChainState(q=q0, potential=-lp, grad=g)

        def step(carry, _):
            key, state = carry
            key, k = jax.random.split(key)
            res = hmc_transition(k, state, eps, N_STEPS, mass, lpg)
            return (key, res.state), res.log_accept

        (_, state), las = jax.lax.scan(step, (key, state), None,
                                       length=N_ITERS)
        return state.q, jnp.mean(jnp.exp(las))

    run = jax.jit(lambda keys, q0: (
        lambda o: jnp.sum(o[0]) + jnp.sum(o[1]))(
            jax.vmap(chain_run)(keys, q0)))
    keys = jax.random.split(jax.random.PRNGKey(0), N_CHAINS)
    args = [(jax.random.split(jax.random.PRNGKey(i), N_CHAINS),
             jnp.zeros((N_CHAINS, 10), jnp.float32)) for i in range(4)]
    return _time_runs(run, args)


def bench_pallas_fused():
    from rainier_tpu.ops import fused_hmc

    def lp2(q):  # (10, C) layout
        y = q[0:1]
        x = q[1:10]
        return (-0.5 * (y / 3.0) ** 2 - 0.5 * jnp.sum(
            x * x * jnp.exp(-y), axis=0, keepdims=True) - 4.5 * y)[0]

    run = jax.jit(lambda q0: jnp.sum(fused_hmc(
        lp2, q0, step_size=0.18, n_steps=N_STEPS, n_iterations=N_ITERS,
        seed=0, collect_every=0, block_chains=512)[0]))
    args = [(jnp.zeros((10, N_CHAINS), jnp.float32) + 0.01 * i,)
            for i in range(4)]
    return _time_runs(run, args)


DATA_N, DATA_P = 4096, 8
DATA_CHAINS = int(os.environ.get("BENCH_DATA_CHAINS", 4096))


def _logistic_data():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(DATA_N, DATA_P)).astype(np.float32)
    b = rng.normal(size=DATA_P).astype(np.float32)
    y = (rng.uniform(size=DATA_N) <
         1 / (1 + np.exp(-(x @ b)))).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def bench_data_xla():
    """Data-conditioned hot loop on the XLA scan path (the program the
    reference's DataFunction row loop corresponds to)."""
    from rainier_tpu.sampler import identity_mass
    from rainier_tpu.sampler.leapfrog import ChainState, hmc_transition

    X, Y = _logistic_data()
    mass = identity_mass()
    eps = jnp.asarray(0.02, jnp.float32)

    def lp1(q):
        lin = X @ q
        return jnp.sum(Y * lin - jax.nn.softplus(lin)) \
            - 0.5 * jnp.dot(q, q) / 25.0

    lpg = jax.value_and_grad(lp1)

    def chain_run(key, q0):
        lp, g = lpg(q0)
        state = ChainState(q=q0, potential=-lp, grad=g)

        def step(carry, _):
            key, state = carry
            key, k = jax.random.split(key)
            res = hmc_transition(k, state, eps, N_STEPS, mass, lpg)
            return (key, res.state), res.log_accept

        (_, state), _ = jax.lax.scan(step, (key, state), None,
                                     length=N_ITERS)
        return state.q

    run = jax.jit(lambda keys, q0: jnp.sum(jax.vmap(chain_run)(keys, q0)))
    args = [(jax.random.split(jax.random.PRNGKey(i), DATA_CHAINS),
             jnp.zeros((DATA_CHAINS, DATA_P), jnp.float32))
            for i in range(3)]
    return _time_runs(run, args)


def bench_data_pallas():
    """Same likelihood with the design matrix VMEM-resident inside the
    fused kernel (SURVEY §7 M4 second half)."""
    from rainier_tpu.ops import fused_hmc

    X, Y = _logistic_data()

    def lp2(q, Xc, yc):  # (p, C) block
        lin = Xc @ q
        ll = yc[:, None] * lin - jax.nn.softplus(lin)
        return jnp.sum(ll, axis=0) - 0.5 * jnp.sum(q * q, axis=0) / 25.0

    run = jax.jit(lambda q0: jnp.sum(fused_hmc(
        lp2, q0, step_size=0.02, n_steps=N_STEPS, n_iterations=N_ITERS,
        seed=0, collect_every=0, block_chains=512, columns=(X, Y))[0]))
    args = [(jnp.zeros((DATA_P, DATA_CHAINS), jnp.float32) + 0.01 * i,)
            for i in range(3)]
    return _time_runs(run, args)


# peak numbers for the roofline fields (TPU v5e / "v5 lite", public
# specs: 197 TFLOP/s bf16 MXU, 819 GB/s HBM).  The funnel kernel is
# elementwise (VPU) work, so %-of-MXU-peak is an upper-bound roofline,
# not an efficiency target — docs/performance.md §Roofline interprets
# the numbers.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES_S = 819e9


def _flops_per_eval():
    """XLA cost-analysis FLOP estimate of ONE density+gradient eval of
    the 10-dim funnel (the unit the headline rate counts)."""
    lpg = funnel_lpg()
    try:
        c = jax.jit(lpg).lower(jnp.zeros((10,), jnp.float32)) \
            .compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0)) or None
    except Exception:
        return None


def main():
    grad_evals = N_CHAINS * N_ITERS * N_STEPS
    dt_xla = bench_xla_scan()
    try:
        dt_pallas = bench_pallas_fused()
    except Exception as e:
        print(f"# pallas path failed ({e}); using XLA scan",
              file=sys.stderr)
        dt_pallas = float("inf")
    dt = min(dt_xla, dt_pallas)
    kernel = "pallas-fused" if dt_pallas < dt_xla else "xla-scan"
    rate = grad_evals / dt
    rec = {
        "metric": "leapfrog grad evals/s/chip (Neal's funnel 10-dim, "
                  f"HMC {N_STEPS} steps, {N_CHAINS} chains)",
        "value": round(rate),
        "unit": "grad_evals_per_s",
        "vs_baseline": round(rate / BASELINE_GRAD_EVALS_PER_S, 2),
    }
    # roofline fields (round-4 verdict #7): achieved FLOP/s = rate x
    # XLA-estimated FLOPs per eval; % of the chip's bf16 MXU peak.
    # The funnel is VPU (elementwise) work, so the MXU fraction is an
    # upper-bound statement — see docs/performance.md §Roofline.
    fpe = _flops_per_eval()
    if fpe:
        rec["flops_per_eval"] = round(fpe)
        rec["achieved_gflops"] = round(rate * fpe / 1e9, 1)
        rec["pct_bf16_peak"] = round(100 * rate * fpe
                                     / PEAK_BF16_FLOPS, 3)
    print(json.dumps(rec))
    print(f"# kernel {kernel}: xla {grad_evals/dt_xla/1e9:.2f}B/s, "
          f"pallas {grad_evals/dt_pallas/1e9:.2f}B/s; "
          f"device {jax.devices()[0]}", file=sys.stderr)
    # data-conditioned secondary benchmark (logistic n=4096 p=8): the
    # fused kernel with VMEM-resident columns vs the XLA scan
    if os.environ.get("BENCH_SKIP_DATA") != "1":
        dge = DATA_CHAINS * N_ITERS * N_STEPS
        try:
            ddt_xla = bench_data_xla()
            ddt_pal = bench_data_pallas()
            print(f"# data-model (logistic {DATA_N}x{DATA_P}, "
                  f"{DATA_CHAINS} chains): "
                  f"xla {dge/ddt_xla/1e6:.0f}M grad-evals/s, "
                  f"pallas {dge/ddt_pal/1e6:.0f}M grad-evals/s "
                  f"({ddt_xla/ddt_pal:.2f}x)", file=sys.stderr)
        except Exception as e:
            print(f"# data-model bench failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
