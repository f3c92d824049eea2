"""Carried sampler telemetry (counterpart of sampler/Stats.scala).

The reference's mutable Stats + RingBuffers of wall-clock timings become a
pure carried pytree: inside jit there is no per-iteration wall clock, so we
keep the *semantic* statistics (iterations, divergences, acceptance,
gradient evaluations, energy variance and E-BFMI — Stats.scala:3-16) and
let the driver report wall-clock throughput from outside the program.
BFMI = Σ(E_t − E_{t−1})² / Σ(E_t − Ē)², exactly Stats.bfmi's
energyTransitions2 / energyVariance.raw.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class StatsState(NamedTuple):
    iterations: jax.Array
    divergences: jax.Array
    accept_sum: jax.Array       # Σ exp(log_accept) → mean acceptance rate
    grad_evals: jax.Array
    prev_energy: jax.Array
    energy_trans2: jax.Array    # Σ (E_t − E_{t−1})²
    e_count: jax.Array          # Welford over retained energies
    e_mean: jax.Array
    e_raw: jax.Array


def stats_init(dtype, initial_energy) -> StatsState:
    z = jnp.zeros((), dtype=dtype)
    return StatsState(
        iterations=jnp.zeros((), jnp.int32),
        divergences=jnp.zeros((), jnp.int32),
        accept_sum=z, grad_evals=jnp.zeros((), jnp.int32),
        prev_energy=jnp.asarray(initial_energy, dtype=dtype),
        energy_trans2=z, e_count=z, e_mean=z, e_raw=z)


def stats_update(st: StatsState, log_accept, divergent, energy,
                 n_grad_evals) -> StatsState:
    e_count = st.e_count + 1
    old = energy - st.e_mean
    e_mean = st.e_mean + old / e_count
    e_raw = st.e_raw + old * (energy - e_mean)
    return StatsState(
        iterations=st.iterations + 1,
        divergences=st.divergences + divergent.astype(jnp.int32),
        accept_sum=st.accept_sum + jnp.exp(log_accept),
        grad_evals=st.grad_evals + jnp.asarray(n_grad_evals, jnp.int32),
        prev_energy=energy,
        energy_trans2=st.energy_trans2 + (energy - st.prev_energy) ** 2,
        e_count=e_count, e_mean=e_mean, e_raw=e_raw)


def bfmi(st: StatsState):
    return st.energy_trans2 / jnp.maximum(st.e_raw, 1e-20)


def accept_rate(st: StatsState):
    return st.accept_sum / jnp.maximum(st.iterations, 1)
