"""Symplectic leapfrog integrator + Metropolis step as pure functions.

Counterpart of sampler/LeapFrog.scala — the reference's hot loop.  The
mutable packed-array state machine ([p | q | potential],
LeapFrog.scala:118-126) becomes an immutable `ChainState` pytree carrying
the *cached gradient* alongside q, so each leapfrog step costs exactly one
density+gradient evaluation (the fused `initialHalfThenFullStep` /
`twoFullSteps` / `finalHalfStep` structure at LeapFrog.scala:158-188
achieves the same; here XLA fuses the arithmetic around the gradient call).

Conventions: `potential` = −logp; `grad` = ∇logp (so dp/dt = +grad).
NaN energies ⇒ log-accept = −∞ (LeapFrog.logAcceptanceProb:138-142) and
count as divergences.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .mass import MassState, kinetic, sample_momentum, velocity


class ChainState(NamedTuple):
    q: jax.Array          # (n,) position
    potential: jax.Array  # scalar, −logp(q)
    grad: jax.Array       # (n,), ∇logp(q)


def chain_state(q, logp_and_grad) -> ChainState:
    lp, g = logp_and_grad(q)
    return ChainState(q=q, potential=-lp, grad=g)


def leapfrog(state: ChainState, p, step_size, n_steps, mass: MassState,
             logp_and_grad: Callable):
    """Integrate n_steps of Hamiltonian dynamics; returns (state', p').

    n_steps may be a traced scalar (EHMC samples it); the loop is a
    fori_loop over `n_steps - 1` full steps bracketed by half steps.
    """
    q, grad = state.q, state.grad
    # initial half step for p, full step for q
    p = p + 0.5 * step_size * grad
    q = q + step_size * velocity(mass, p)
    lp, grad = logp_and_grad(q)

    def body(_, c):
        q, p, lp, grad = c
        p = p + step_size * grad
        q = q + step_size * velocity(mass, p)
        lp, grad = logp_and_grad(q)
        return (q, p, lp, grad)

    q, p, lp, grad = jax.lax.fori_loop(0, n_steps - 1, body,
                                       (q, p, lp, grad))
    p = p + 0.5 * step_size * grad
    return ChainState(q=q, potential=-lp, grad=grad), p


def log_accept_prob(h0, h1):
    """min(0, −ΔH) with non-finite energy ⇒ −∞.

    The reference only maps NaN ⇒ −∞ (LeapFrog.logAcceptanceProb:138-142),
    which catches inf−inf but NOT h0=+inf with finite h1: there
    −ΔH = +∞ ⇒ accept-prob 1, so a kinetic-energy overflow (f32 momentum
    draw against a near-singular adapted Σ̂) would *certainly accept* an
    arbitrarily bad proposal — the dense-mass chain-explosion failure.
    In f64 on the JVM this is unreachable in practice; in f32 on TPU it
    is not, so any non-finite energy on either side is a divergence."""
    delta = h1 - h0
    la = jnp.minimum(-delta, 0.0)
    bad = ~jnp.isfinite(h0) | ~jnp.isfinite(h1)
    return jnp.where(bad, -jnp.inf, la)


class TransitionResult(NamedTuple):
    state: ChainState
    log_accept: jax.Array
    accepted: jax.Array
    divergent: jax.Array
    energy: jax.Array     # H of the retained state (for E-BFMI)


def hmc_transition(key, state: ChainState, step_size, n_steps,
                   mass: MassState, logp_and_grad: Callable
                   ) -> TransitionResult:
    """One momentum refresh + trajectory + Metropolis accept
    (HMCSampler.warmup/run → LeapFrog start/takeSteps/finishIteration)."""
    k_mom, k_acc = jax.random.split(key)
    n = state.q.shape[0]
    p0 = sample_momentum(mass, k_mom, n, state.q.dtype)
    h0 = state.potential + kinetic(mass, p0)
    new_state, p1 = leapfrog(state, p0, step_size, n_steps, mass,
                             logp_and_grad)
    h1 = new_state.potential + kinetic(mass, p1)
    la = log_accept_prob(h0, h1)
    u = jax.random.uniform(k_acc, dtype=state.q.dtype)
    accept = jnp.log(u) < la
    out = jax.tree.map(
        lambda a, b: jnp.where(accept, a, b), new_state, state)
    divergent = jnp.isinf(la) | jnp.isnan(la)
    energy = jnp.where(accept, h1, h0)
    return TransitionResult(out, la, accept, divergent, energy)


def try_stepping(state: ChainState, p, step_size, mass: MassState,
                 logp_and_grad: Callable):
    """Log-accept-prob of a single step from (state, p) — used by the
    initial step-size bracketing (LeapFrog.tryStepping)."""
    h0 = state.potential + kinetic(mass, p)
    s1, p1 = leapfrog(state, p, step_size, 1, mass, logp_and_grad)
    h1 = s1.potential + kinetic(mass, p1)
    return log_accept_prob(h0, h1)


def is_uturn(q_start, q_new, p_new):
    """(q′−q)·p < 0, NaN ⇒ True (LeapFrog.isUTurn:35-47)."""
    d = jnp.dot(q_new - q_start, p_new)
    return jnp.where(jnp.isnan(d), True, d < 0)
