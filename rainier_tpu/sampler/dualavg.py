"""Nesterov dual-averaging step-size adaptation.

Counterpart of sampler/DualAvg.scala:44-90 (Hoffman & Gelman's NUTS paper
scheme, target accept δ=0.8) and the bracketing search
`findReasonableStepSize` (DualAvg.scala:27-41), both as pure functions of
carried state so they compose into the warmup `lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

STEP_SIZE_UPDATE_DENOM = 0.05
ACCEPT_PROB_UPDATE_DENOM = 10.0
DECAY_RATE = 0.75

#: lower bound on the adapted log step size.  A chain that rejects every
#: proposal (e.g. one initialized deep in a saturated likelihood tail)
#: drives avg_error -> delta and log_step to ~ -delta*sqrt(it)/0.05 —
#: hundreds of nats negative within tens of iterations — so exp()
#: underflows f32 to exactly 0; a window-close reset then takes
#: log(0) = -inf and poisons every later update (NaN step sizes, chains
#: that report a divergence on every sampling iteration).  Flooring at
#: e^-46 ~ 1e-20 keeps the tuner's state finite while being far below
#: any step size that could ever integrate anything.
MIN_LOG_STEP = -46.0


class DualAvgState(NamedTuple):
    log_step: jax.Array
    log_step_bar: jax.Array
    avg_error: jax.Array
    iteration: jax.Array
    shrinkage_target: jax.Array


def dual_avg_init(step_size) -> DualAvgState:
    step_size = jnp.asarray(step_size)
    z = jnp.zeros_like(step_size)
    log_step = jnp.maximum(jnp.log(step_size), MIN_LOG_STEP)
    return DualAvgState(
        log_step=log_step,
        log_step_bar=z,
        avg_error=z,
        iteration=z,
        shrinkage_target=log_step + jnp.log(10.0))


def dual_avg_update(s: DualAvgState, log_accept_prob, delta: float
                    ) -> DualAvgState:
    accept = jnp.exp(log_accept_prob)
    it = s.iteration + 1
    avg_mult = 1.0 / (it + ACCEPT_PROB_UPDATE_DENOM)
    step_mult = it ** (-DECAY_RATE)
    avg_error = (1.0 - avg_mult) * s.avg_error + avg_mult * (delta - accept)
    log_step = jnp.maximum(
        s.shrinkage_target
        - avg_error * jnp.sqrt(it) / STEP_SIZE_UPDATE_DENOM,
        MIN_LOG_STEP)
    log_step_bar = step_mult * log_step + (1.0 - step_mult) * s.log_step_bar
    return DualAvgState(log_step, log_step_bar, avg_error, it,
                        s.shrinkage_target)


def dual_avg_reset(s: DualAvgState) -> DualAvgState:
    """On mass-matrix window close the tuner restarts from the current
    averaged step size (DualAvgTuner.reset)."""
    return dual_avg_init(jnp.exp(s.log_step_bar))


def current_step_size(s: DualAvgState):
    return jnp.exp(s.log_step)


def final_step_size(s: DualAvgState):
    return jnp.exp(s.log_step_bar)


def find_reasonable_step_size(try_step_fn, max_doublings: int = 60):
    """Double/halve until the one-step log-accept-prob crosses log(1/2)
    (DualAvgTuner.findReasonableStepSize).  `try_step_fn(step) ->
    log_accept_prob` must be pure (it re-integrates from the same state).
    Bounded iteration count keeps the while_loop safe under vmap."""
    log2 = jnp.log(2.0)
    la0 = try_step_fn(jnp.asarray(1.0))
    exponent = jnp.where(la0 > -log2, 1.0, -1.0)
    factor = jnp.exp2(exponent)

    def cond(c):
        step, la, i = c
        return jnp.logical_and(
            jnp.logical_and(step != 0.0, i < max_doublings),
            exponent * la > -exponent * log2)

    def body(c):
        step, _, i = c
        step = step * factor
        return step, try_step_fn(step), i + 1

    step, _, _ = jax.lax.while_loop(cond, body,
                                    (jnp.asarray(1.0), la0,
                                     jnp.asarray(0)))
    return step
