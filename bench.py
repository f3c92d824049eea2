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

N_CHAINS = int(os.environ.get("BENCH_CHAINS", 32768))
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


def main():
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
        return state.q, las

    run = jax.jit(jax.vmap(chain_run))
    keys = jax.random.split(jax.random.PRNGKey(0), N_CHAINS)
    q0 = jnp.zeros((N_CHAINS, 10), jnp.float32)

    # compile + warm up
    out = run(keys, q0)
    jax.block_until_ready(out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(keys, q0)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    grad_evals = N_CHAINS * N_ITERS * N_STEPS
    rate = grad_evals / dt

    accept = float(jnp.mean(jnp.exp(out[1])))
    print(json.dumps({
        "metric": "leapfrog grad evals/s/chip (Neal's funnel 10-dim, "
                  f"HMC {N_STEPS} steps, {N_CHAINS} chains)",
        "value": round(rate),
        "unit": "grad_evals_per_s",
        "vs_baseline": round(rate / BASELINE_GRAD_EVALS_PER_S, 2),
    }))
    print(f"# walltime {dt:.3f}s for {grad_evals} evals; "
          f"mean accept {accept:.2f}; device {jax.devices()[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
