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


def ring_add_many(rb: RingBuffer, values, valid) -> RingBuffer:
    """Append ``values[i]`` where ``valid[i]`` (a masked bulk ring_add —
    used to share counted trajectory lengths across the chain axis).
    Order preserved for the valid entries; invalid slots are skipped via
    a prefix-sum of write offsets."""
    size = rb.buf.shape[0]
    valid = valid.astype(jnp.int32)
    offs = jnp.cumsum(valid) - valid          # 0-based slot per valid row
    n_new = jnp.sum(valid)
    # when more than `size` values arrive at once (e.g. a 256-lane batch
    # filling a 100-slot buffer) the ring wraps and positions collide;
    # scatter order for duplicate indices is unspecified, so keep only
    # the LAST `size` valid entries — exactly what sequential ring_add
    # would leave behind
    keep = (valid == 1) & (offs >= n_new - size)
    pos = (rb.idx + offs) % size
    # dropped rows scatter to an out-of-range index (mode="drop")
    pos = jnp.where(keep, pos, size)
    buf = rb.buf.at[pos].set(values.astype(rb.buf.dtype), mode="drop")
    return RingBuffer(buf=buf, idx=(rb.idx + n_new) % size,
                      count=jnp.minimum(rb.count + n_new, size))


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
        pooled_p = None
        if cfg.synchronized:
            # pooled-length mode (see the ring_add_many below): each
            # counting lane's length lands in EVERY lane's buffer, so a
            # batch of n lanes at the reference's per-lane rate 0.1
            # would refresh each buffer n× too fast — and pay n× the
            # counting trajectories.  Scale so the whole batch
            # contributes p_count·buf_size lengths per iteration (the
            # same *fractional* buffer refresh rate as the reference's
            # per-chain scheme), floored at the per-lane rate for small
            # batches.
            try:
                n_lanes = jax.lax.psum(1, "chains")
                pooled_p = jnp.minimum(
                    cfg.p_count,
                    cfg.p_count * cfg.buf_size / n_lanes)
            except NameError:
                pass
        u = jax.random.uniform(kc, dtype=chain.q.dtype)
        if pooled_p is not None:
            # pooled mode also drops the reference's fill-before-replay
            # requirement (!steps.full ⇒ count, EHMC.scala:29-30):
            # forcing every lane to count at iteration 0 costs each
            # lane a full-length U-turn search at the unadapted step
            # size (~max_steps grad evals — the largest warmup cost
            # left after pooling).  An empty buffer replays
            # min_steps-length trajectories instead, and the pooled
            # counting events fill every lane's buffer with real
            # lengths within ~buf_size/(p_count·n_lanes) iterations.
            counting = u < pooled_p
        else:
            counting = (rb.count < rb.buf.shape[0]) | (u < cfg.p_count)
    else:
        counting = jnp.asarray(False)
    n_target = jnp.maximum(ring_sample(rb, kt), 1).astype(jnp.int32)
    if cfg.synchronized:
        # share ONE empirical draw (lane 0's) across the whole batch:
        # every chain integrates the same L ~ ring distribution, so the
        # vmapped while_loop's trip count is that single draw — E[L]
        # wall-clock per iteration instead of E[max over n_chains
        # draws] ≈ the buffer's longest length (the r4 scheme pmax'd
        # n independent draws, which saturated at the max and made
        # every iteration pay the tail).  L remains independent of
        # every chain's state ⇒ still a valid MH transition.
        try:
            n_target = jax.lax.all_gather(n_target, "chains")[0]
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
        shared = False
        if cfg.synchronized:
            # pool counted lengths across the chain axis: every lane's
            # buffer receives every counting lane's length.  The
            # buffer-fill phase collapses from buf_size all-count
            # iterations (each up to max_steps grad evals per lane with
            # an unadapted step size — 85% of all EHMC warmup evals in
            # the r4 ehmc_fair capture) to ~ceil(buf_size/n_chains)
            # iterations, after which only the p_count refresh rate
            # pays counting trajectories.  Same extension rationale as
            # synchronized replay: the vmapped batch is one sampler,
            # and L stays independent of any chain's state.
            try:
                all_l = jax.lax.all_gather(l_counted, "chains")
                all_c = jax.lax.all_gather(counting, "chains")
                rb = ring_add_many(rb, all_l, all_c)
                shared = True
            except NameError:  # not under the driver's vmap
                pass
        if not shared:
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
