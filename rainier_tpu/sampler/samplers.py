"""Transition kernels for each sampler kind, behind one functional
interface used by the scan driver:

    init_extra(cfg, n_vars, dtype)            -> extra state pytree
    step(cfg, key, chain, eps, mass, extra,
         lpg, warmup)                          -> (TransitionResult, extra,
                                                   n_grad_evals)

HMC: sampler/HMC.scala.  EHMC: sampler/EHMC.scala (U-turn step counting
into an empirical length distribution).  NUTS: see nuts.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import config as C
from .leapfrog import (ChainState, TransitionResult, hmc_transition,
                       is_uturn, log_accept_prob)
from .mass import MassState, kinetic, sample_momentum, velocity


# ---------------------------------------------------------------------------
# ring buffer of empirical trajectory lengths (sampler/Stats.scala RingBuffer)
# ---------------------------------------------------------------------------


class RingBuffer(NamedTuple):
    buf: jax.Array    # (size,) float
    idx: jax.Array    # next write position
    count: jax.Array  # filled slots (≤ size)


def ring_init(size: int, dtype) -> RingBuffer:
    return RingBuffer(buf=jnp.ones((size,), dtype=dtype),
                      idx=jnp.zeros((), jnp.int32),
                      count=jnp.zeros((), jnp.int32))


def ring_add(rb: RingBuffer, value) -> RingBuffer:
    size = rb.buf.shape[0]
    buf = rb.buf.at[rb.idx].set(value)
    return RingBuffer(buf=buf, idx=(rb.idx + 1) % size,
                      count=jnp.minimum(rb.count + 1, size))


def ring_sample(rb: RingBuffer, key):
    i = jax.random.randint(key, (), 0, jnp.maximum(rb.count, 1))
    return rb.buf[i]


# ---------------------------------------------------------------------------
# single fused leapfrog step (KDK); chaining these is exactly an L-step
# leapfrog because adjacent half-kicks merge, at one grad eval per step
# ---------------------------------------------------------------------------


def _one_step(q, p, lp, grad, eps, mass, lpg):
    p = p + 0.5 * eps * grad
    q = q + eps * velocity(mass, p)
    lp, grad = lpg(q)
    p = p + 0.5 * eps * grad
    return q, p, lp, grad


# ---------------------------------------------------------------------------
# HMC
# ---------------------------------------------------------------------------


def _hmc_step(cfg: C.HMC, key, chain, eps, mass, extra, lpg, warmup):
    res = hmc_transition(key, chain, eps, cfg.n_steps, mass, lpg)
    return res, extra, cfg.n_steps


# ---------------------------------------------------------------------------
# EHMC
# ---------------------------------------------------------------------------


def _ehmc_trajectory(chain: ChainState, p0, eps, mass, lpg, counting,
                     n_target, cfg: C.EHMC):
    """Unified trajectory: in counting mode run until U-turn (≤ max_steps),
    proposing the state snapshotted at min_steps (EHMC.countSteps,
    EHMC.scala:32-50); otherwise run exactly n_target steps.  One loop so
    vmapped chains in different modes share the same program."""
    q0 = chain.q

    def cond(c):
        q, p, lp, grad, l, snap = c
        more_count = (l < cfg.max_steps) & ~is_uturn(q0, q, p)
        more_replay = l < n_target
        return jnp.where(counting, more_count, more_replay)

    def body(c):
        q, p, lp, grad, l, snap = c
        q, p, lp, grad = _one_step(q, p, lp, grad, eps, mass, lpg)
        l = l + 1
        snap = jax.tree.map(
            lambda s, cur: jnp.where(l == cfg.min_steps, cur, s),
            snap, (q, p, lp, grad))
        return (q, p, lp, grad, l, snap)

    init_snap = (chain.q, p0, -chain.potential, chain.grad)
    c0 = (chain.q, p0, -chain.potential, chain.grad,
          jnp.zeros((), jnp.int32), init_snap)
    q, p, lp, grad, l, snap = jax.lax.while_loop(cond, body, c0)
    l_counted = l

    # if the U-turn came before min_steps, top up to min_steps and use the
    # current state (EHMC.scala:43-48)
    def cond2(c):
        q, p, lp, grad, l = c
        return counting & (l < cfg.min_steps)

    def body2(c):
        q, p, lp, grad, l = c
        q, p, lp, grad = _one_step(q, p, lp, grad, eps, mass, lpg)
        return (q, p, lp, grad, l + 1)

    q, p, lp, grad, l2 = jax.lax.while_loop(cond2, body2, (q, p, lp, grad, l))

    use_snap = counting & (l_counted >= cfg.min_steps)
    sq, sp, slp, sgrad = snap
    q = jnp.where(use_snap, sq, q)
    p = jnp.where(use_snap, sp, p)
    lp = jnp.where(use_snap, slp, lp)
    grad = jnp.where(use_snap, sgrad, grad)
    n_grads = jnp.where(counting, l2, l)
    return ChainState(q=q, potential=-lp, grad=grad), p, l_counted, n_grads


def _ehmc_step(cfg: C.EHMC, key, chain, eps, mass, extra, lpg, warmup):
    rb: RingBuffer = extra
    kc, km, kt, ka = jax.random.split(key, 4)
    n = chain.q.shape[0]
    p0 = sample_momentum(mass, km, n, chain.q.dtype)
    h0 = chain.potential + kinetic(mass, p0)
    if warmup:
        counting = (rb.count < rb.buf.shape[0]) | (
            jax.random.uniform(kc, dtype=chain.q.dtype) < cfg.p_count)
    else:
        counting = jnp.asarray(False)
    n_target = jnp.maximum(ring_sample(rb, kt), 1).astype(jnp.int32)
    if cfg.synchronized:
        # a vmapped batch runs max(L) steps regardless (shorter lanes
        # idle masked); share that max so every chain integrates it —
        # free in wall-clock, still state-independent ⇒ valid MH
        try:
            n_target = jax.lax.pmax(n_target, "chains")
        except NameError:  # not under the driver's vmap (single chain)
            pass
    prop, p1, l_counted, n_grads = _ehmc_trajectory(
        chain, p0, eps, mass, lpg, counting, n_target, cfg)
    h1 = prop.potential + kinetic(mass, p1)
    la = log_accept_prob(h0, h1)
    u = jax.random.uniform(ka, dtype=chain.q.dtype)
    accept = jnp.log(u) < la
    out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), prop, chain)
    divergent = jnp.isinf(la) | jnp.isnan(la)
    energy = jnp.where(accept, h1, h0)
    if warmup:
        rb = jax.tree.map(
            lambda new, old: jnp.where(counting, new, old),
            ring_add(rb, l_counted.astype(rb.buf.dtype)), rb)
    res = TransitionResult(out, la, accept, divergent, energy)
    return res, rb, n_grads


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def init_extra(cfg, n_vars: int, dtype):
    if isinstance(cfg, C.HMC):
        return ()
    if isinstance(cfg, C.EHMC):
        return ring_init(cfg.buf_size, dtype)
    if isinstance(cfg, C.NUTS):
        return ()
    raise TypeError(cfg)


def step(cfg, key, chain, eps, mass, extra, lpg, warmup: bool):
    if isinstance(cfg, C.HMC):
        return _hmc_step(cfg, key, chain, eps, mass, extra, lpg, warmup)
    if isinstance(cfg, C.EHMC):
        return _ehmc_step(cfg, key, chain, eps, mass, extra, lpg, warmup)
    if isinstance(cfg, C.NUTS):
        from .nuts import nuts_step

        return nuts_step(cfg, key, chain, eps, mass, extra, lpg)
    raise TypeError(cfg)
