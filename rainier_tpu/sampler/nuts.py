"""Iterative No-U-Turn sampler (multinomial variant).

No reference counterpart (stripe/rainier ships HMC/EHMC only; its docs cite
Stan's "more sophisticated dynamic HMC" as the gap, README.md:48) — new
capability required by BASELINE.md's eight-schools config.

Design: Hoffman & Gelman's recursive tree is rebuilt as a *bounded
iterative* doubling loop suitable for `lax.while_loop` + `vmap`:

* each doubling builds its subtree leaf-by-leaf (one fused KDK leapfrog
  step = one gradient eval per leaf);
* sub-U-turn checks use an O(max_depth) checkpoint stack: leaf i of a
  2^d-leaf subtree is the level-l block start when i ≡ 0 (mod 2^l) and the
  block end when i ≡ 2^l−1 (mod 2^l); starts are stored with a masked
  vector write, ends checked with vectorized dot products — so every leaf
  costs O(max_depth · n) vector work, no recursion;
* within-subtree proposals: multinomial (logsumexp-weighted reservoir);
  across doublings: biased progressive sampling toward the new subtree
  (Betancourt 2017, as in Stan);
* U-turn criteria use velocities (M⁻¹p) so the mass metric is respected;
* divergence = ΔH > 1000 or non-finite H (Stan's max_delta_energy);
* dual averaging consumes log of the mean leaf acceptance statistic
  (Stan's accept_stat).

All loops are bounded (max_depth doublings, 2^depth leaves each) so a
vmapped batch of chains runs in lockstep with masking.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import config as C
from .leapfrog import ChainState, TransitionResult
from .mass import MassState, kinetic, sample_momentum, velocity

MAX_DELTA_ENERGY = 1000.0


class _Point(NamedTuple):
    q: jax.Array
    p: jax.Array
    lp: jax.Array
    grad: jax.Array


def _one_step(pt: _Point, eps, mass, lpg) -> _Point:
    p = pt.p + 0.5 * eps * pt.grad
    q = pt.q + eps * velocity(mass, p)
    lp, grad = lpg(q)
    p = p + 0.5 * eps * grad
    return _Point(q, p, lp, grad)


def _vel_rows(mass: MassState, P):
    """velocity() for a (L, n) batch of momenta."""
    if mass.diag is not None:
        return P * mass.diag
    if mass.cov is not None:
        return P @ mass.cov.T
    return P


def _turning(mass, q_minus, p_minus, q_plus, p_plus):
    dq = q_plus - q_minus
    return (jnp.dot(dq, velocity(mass, p_minus)) < 0) | \
           (jnp.dot(dq, velocity(mass, p_plus)) < 0)


class _SubtreeResult(NamedTuple):
    z_end: _Point
    prop: _Point
    log_w: jax.Array
    turning: jax.Array
    divergent: jax.Array
    sum_alpha: jax.Array
    leaves: jax.Array


def _build_subtree(key, z0: _Point, depth, eps_signed, mass, lpg, h0,
                   max_depth: int) -> _SubtreeResult:
    n = z0.q.shape[0]
    dtype = z0.q.dtype
    n_leaves = jnp.asarray(2, jnp.int32) ** depth
    levels = jnp.arange(max_depth + 1)
    block = jnp.asarray(2, jnp.int32) ** levels

    neg_inf = jnp.asarray(-jnp.inf, dtype)

    def cond(c):
        i = c[0]
        turning, div = c[4], c[5]
        return (i < n_leaves) & ~turning & ~div

    def body(c):
        (i, z, prop, log_w, turning, div, ckq, ckp, s_alpha, k) = c
        k, k_mn = jax.random.split(k)
        z = _one_step(z, eps_signed, mass, lpg)
        h = -z.lp + kinetic(mass, z.p)
        delta = h - h0
        div = ~jnp.isfinite(h) | (delta > MAX_DELTA_ENERGY)
        w = jnp.where(div, neg_inf, -delta)
        s_alpha = s_alpha + jnp.where(
            div, 0.0, jnp.minimum(jnp.exp(-delta), 1.0))
        new_log_w = jnp.logaddexp(log_w, w)
        take = jnp.log(jax.random.uniform(k_mn, dtype=dtype)) < \
            (w - new_log_w)
        prop = jax.tree.map(lambda a, b: jnp.where(take, a, b), z, prop)
        log_w = new_log_w

        active = (levels >= 1) & (levels <= depth)
        start_mask = ((i % block) == 0) & active
        end_mask = ((i % block) == (block - 1)) & active
        ckq = jnp.where(start_mask[:, None], z.q[None, :], ckq)
        ckp = jnp.where(start_mask[:, None], z.p[None, :], ckp)
        dq = z.q[None, :] - ckq                       # (L, n)
        t_levels = (jnp.sum(dq * _vel_rows(mass, ckp), axis=-1) < 0) | \
            (dq @ velocity(mass, z.p) < 0)
        turning = jnp.any(t_levels & end_mask)
        return (i + 1, z, prop, log_w, turning, div, ckq, ckp, s_alpha, k)

    ckq0 = jnp.zeros((max_depth + 1, n), dtype)
    ckp0 = jnp.zeros((max_depth + 1, n), dtype)
    c0 = (jnp.zeros((), jnp.int32), z0, z0, neg_inf,
          jnp.asarray(False), jnp.asarray(False), ckq0, ckp0,
          jnp.zeros((), dtype), key)
    (i, z, prop, log_w, turning, div, _, _, s_alpha, _) = \
        jax.lax.while_loop(cond, body, c0)
    return _SubtreeResult(z_end=z, prop=prop, log_w=log_w, turning=turning,
                          divergent=div, sum_alpha=s_alpha, leaves=i)


def nuts_step(cfg: C.NUTS, key, chain: ChainState, eps, mass: MassState,
              extra, lpg):
    n = chain.q.shape[0]
    dtype = chain.q.dtype
    k_mom, key = jax.random.split(key)
    p0 = sample_momentum(mass, k_mom, n, dtype)
    h0 = chain.potential + kinetic(mass, p0)
    z0 = _Point(chain.q, p0, -chain.potential, chain.grad)

    def cond(c):
        depth, stop = c[0], c[1]
        return (depth < cfg.max_depth) & ~stop

    def body(c):
        (depth, stop, z_left, z_right, prop, log_w, div, s_alpha,
         n_alpha, n_grads, k) = c
        k, k_dir, k_sub, k_take = jax.random.split(k, 4)
        go_right = jax.random.bernoulli(k_dir)
        start = jax.tree.map(
            lambda r, l: jnp.where(go_right, r, l), z_right, z_left)
        eps_signed = jnp.where(go_right, eps, -eps)
        sub = _build_subtree(k_sub, start, depth, eps_signed, mass, lpg,
                             h0, cfg.max_depth)
        n_grads = n_grads + sub.leaves
        s_alpha = s_alpha + sub.sum_alpha
        n_alpha = n_alpha + sub.leaves
        valid = ~sub.turning & ~sub.divergent
        # biased progressive sampling toward the new subtree
        take = valid & (jnp.log(jax.random.uniform(k_take, dtype=dtype))
                        < (sub.log_w - log_w))
        prop = jax.tree.map(lambda a, b: jnp.where(take, a, b),
                            sub.prop, prop)
        log_w = jnp.where(valid, jnp.logaddexp(log_w, sub.log_w), log_w)
        z_right = jax.tree.map(
            lambda e, r: jnp.where(go_right & valid, e, r),
            sub.z_end, z_right)
        z_left = jax.tree.map(
            lambda e, l: jnp.where((~go_right) & valid, e, l),
            sub.z_end, z_left)
        whole_turn = _turning(mass, z_left.q, z_left.p, z_right.q,
                              z_right.p)
        stop = ~valid | whole_turn
        div = div | sub.divergent
        return (depth + 1, stop, z_left, z_right, prop, log_w, div,
                s_alpha, n_alpha, n_grads, k)

    c0 = (jnp.zeros((), jnp.int32), jnp.asarray(False), z0, z0, z0,
          jnp.zeros((), dtype), jnp.asarray(False),
          jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
          jnp.zeros((), jnp.int32), key)
    (depth, stop, z_left, z_right, prop, log_w, div, s_alpha, n_alpha,
     n_grads) = jax.lax.while_loop(cond, body, c0)[:10]

    new_chain = ChainState(q=prop.q, potential=-prop.lp, grad=prop.grad)
    accepted = jnp.any(prop.q != chain.q)
    mean_alpha = s_alpha / jnp.maximum(n_alpha, 1)
    log_accept = jnp.log(jnp.maximum(mean_alpha, 1e-30))
    energy = -prop.lp + kinetic(mass, prop.p)
    res = TransitionResult(new_chain, log_accept, accepted, div, energy)
    return res, extra, n_grads
