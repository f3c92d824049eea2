"""Tempered Sequential Monte Carlo with systematic resampling.

No reference counterpart — stripe/rainier is HMC-only (SURVEY.md §2.3);
this is the scale-out sampler family from the build plan (SURVEY.md §7
M3: "SMC resampling path").  The population-of-particles shape is the
natural fit for a TPU: every stage is a vmapped batch of density
evaluations / HMC mutations over the particle axis, and the only
cross-particle communication — the weight normalization, the ESS
bisection, and the resampling gather — lowers to XLA collectives
(psum / all-gather) when particles are sharded over a mesh 'chains'
axis, riding ICI.

Algorithm (Del Moral, Doucet & Jasra 2006; adaptive tempering à la
Jasra et al. 2011):

* geometric path  log π_β(q) = (1−β)·log r(q) + β·log p(q)  from a
  sampleable reference r = N(0, s²·I) on the unconstrained space to the
  posterior log p = prior + likelihood (both per-parameter unconstraining
  transforms and their jacobians are already inside log p, so r does not
  need to know the model's support);
* each stage picks Δβ by bisection so the incremental-weight effective
  sample size stays at `ess_target`·N;
* systematic resampling (one uniform, stratified comb, searchsorted on
  the weight cumsum);
* mutation by `mutation_steps` HMC transitions targeting π_β, with a
  diagonal mass matrix estimated from the *weighted* particle cloud and a
  step size adapted across stages by Robbins–Monro toward 0.65 accept;
* the incremental normalizing constants accumulate into an unbiased
  log-evidence estimate — a capability the reference lacks entirely.

The whole run is ONE jitted `lax.while_loop` (stages) of `lax.scan`s
(mutation steps): no host round-trips between stages.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import config as global_config
from .leapfrog import ChainState, hmc_transition
from .mass import MassState


class SMCConfig(NamedTuple):
    n_particles: int = 4096
    mutation_steps: int = 3      # HMC transitions per tempering stage
    leapfrog_steps: int = 10     # leapfrog steps per HMC transition
    ess_target: float = 0.5      # keep ESS ≥ ess_target · N each stage
    initial_step_size: float = 0.25
    target_accept: float = 0.65  # Robbins–Monro step-size target
    max_stages: int = 100        # static bound on tempering stages
    init_scale: float = 1.0      # std-dev of the N(0, s²I) reference
    bisect_iters: int = 30


class SMCResult(NamedTuple):
    particles: jax.Array      # (N, d) equally-weighted posterior draws
    log_evidence: jax.Array   # scalar log Ẑ = log ∫ prior·like dq
    n_stages: jax.Array       # scalar int, tempering stages used
    betas: jax.Array          # (max_stages,) β after each stage (0-padded)
    ess: jax.Array            # (max_stages,) pre-resampling ESS per stage
    accept_rates: jax.Array   # (max_stages,) mean mutation accept rate
    step_sizes: jax.Array     # (max_stages,) mutation step size used


def _log_ess(log_w):
    """log ESS of unnormalized log-weights: 2·lse(w) − lse(2w)."""
    return (2.0 * jax.scipy.special.logsumexp(log_w)
            - jax.scipy.special.logsumexp(2.0 * log_w))


def systematic_resample(key, log_w, n):
    """Systematic (stratified-comb) resampling: indices into the particle
    axis.  O(N log N) on device; the cumsum/searchsorted pair is the only
    cross-particle dependency, which XLA lowers to collective scans when
    the axis is sharded."""
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, dtype=w.dtype)
    comb = (jnp.arange(n, dtype=w.dtype) + u0) / n
    idx = jnp.searchsorted(cum, comb)
    return jnp.clip(idx, 0, n - 1)


def _choose_delta(log_ratio, beta, ess_target, n, iters):
    """Largest Δβ ∈ (0, 1−β] with ESS(exp(Δβ·log_ratio)) ≥ ess_target·N,
    by bisection (fixed trip count — jit-friendly).  log_ratio is
    log p(q) − log r(q) per particle."""
    target = jnp.log(ess_target * n)
    hi = 1.0 - beta

    def ess_ok(delta):
        return _log_ess(delta * log_ratio) >= target

    def body(_, lohi):
        lo, hi_ = lohi
        mid = 0.5 * (lo + hi_)
        ok = ess_ok(mid)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi_, mid)

    lo, _ = jax.lax.fori_loop(0, iters, body,
                              (jnp.zeros_like(hi), hi))
    # if even the full remaining jump keeps ESS healthy, finish the path
    delta = jnp.where(ess_ok(hi), hi, lo)
    # never stall: bisection can return 0 when ESS is already below target
    return jnp.maximum(delta, 1e-4 * (1.0 - beta) + 1e-7)


class _Carry(NamedTuple):
    key: jax.Array
    q: jax.Array            # (N, d)
    logp: jax.Array         # (N,) full posterior log-density at q
    logr: jax.Array         # (N,) reference log-density at q
    beta: jax.Array
    log_z: jax.Array
    step_size: jax.Array
    stage: jax.Array
    betas: jax.Array
    ess: jax.Array
    accepts: jax.Array
    steps: jax.Array


def run_smc(logp_fn, n_vars: int, cfg: SMCConfig = SMCConfig(),
            seed: int = 0, dtype=None, sharding=None) -> SMCResult:
    """Run adaptive tempered SMC against `logp_fn: (d,) -> scalar`
    (the full unconstrained posterior log-density).

    `sharding`: optional NamedSharding for the particle axis — particles
    are placed on it and every stage's collectives ride the mesh.
    """
    dtype = dtype or global_config.dtype()
    n, d = cfg.n_particles, n_vars
    s2 = cfg.init_scale ** 2

    def logr_fn(q):
        return (-0.5 * jnp.sum(q * q) / s2
                - 0.5 * d * jnp.log(2 * jnp.pi * s2))

    vlogp = jax.vmap(logp_fn)
    vlogr = jax.vmap(logr_fn)
    grad_tempered = jax.vmap(
        jax.value_and_grad(
            lambda q, b: (1.0 - b) * logr_fn(q) + b * logp_fn(q)),
        in_axes=(0, None))

    def mutation_lpg(beta):
        def lpg(q):
            lp, g = jax.value_and_grad(
                lambda qq: (1.0 - beta) * logr_fn(qq)
                + beta * logp_fn(qq))(q)
            return lp, g
        return lpg

    def stage(c: _Carry) -> _Carry:
        key, k_delta, k_res, k_mut = jax.random.split(c.key, 4)

        # -- reweight: pick Δβ adaptively, accumulate evidence ----------
        log_ratio = c.logp - c.logr
        delta = _choose_delta(log_ratio, c.beta, cfg.ess_target, n,
                              cfg.bisect_iters)
        log_w = delta * log_ratio
        log_z = c.log_z + (jax.scipy.special.logsumexp(log_w)
                           - jnp.log(float(n)))
        beta = c.beta + delta
        ess_now = jnp.exp(_log_ess(log_w))

        # -- resample ----------------------------------------------------
        idx = systematic_resample(k_res, log_w, n)
        q = jnp.take(c.q, idx, axis=0)

        # -- mutate: HMC targeting π_β with cloud-estimated diag mass ----
        var = jnp.maximum(jnp.var(q, axis=0), 1e-10)
        mass = MassState(diag=var)
        lp_t, g_t = grad_tempered(q, beta)
        states = ChainState(q=q, potential=-lp_t, grad=g_t)
        lpg = mutation_lpg(beta)

        def mut_step(carry, k):
            states, acc_sum = carry
            ks = jax.random.split(k, n)
            res = jax.vmap(
                lambda kk, st: hmc_transition(
                    kk, st, c.step_size, cfg.leapfrog_steps, mass, lpg)
            )(ks, states)
            return (res.state,
                    acc_sum + jnp.mean(jnp.exp(res.log_accept))), None

        mut_keys = jax.random.split(k_mut, cfg.mutation_steps)
        (states, acc_sum), _ = jax.lax.scan(
            mut_step, (states, jnp.zeros((), dtype)), mut_keys)
        accept = acc_sum / cfg.mutation_steps

        # -- Robbins–Monro step-size update toward target accept ---------
        lr = 1.0 / jnp.sqrt(1.0 + c.stage.astype(dtype))
        step_size = c.step_size * jnp.exp(
            lr * (accept - cfg.target_accept))

        q = states.q
        logp = vlogp(q)
        logr = vlogr(q)

        i = c.stage
        return _Carry(
            key=key, q=q, logp=logp, logr=logr, beta=beta, log_z=log_z,
            step_size=step_size, stage=i + 1,
            betas=c.betas.at[i].set(beta),
            ess=c.ess.at[i].set(ess_now),
            accepts=c.accepts.at[i].set(accept),
            steps=c.steps.at[i].set(c.step_size))

    def cond(c: _Carry):
        return (c.beta < 1.0) & (c.stage < cfg.max_stages)

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    q0 = cfg.init_scale * jax.random.normal(k_init, (n, d), dtype)
    if sharding is not None:
        q0 = jax.device_put(q0, sharding)
    zeros = jnp.zeros((cfg.max_stages,), dtype)
    init = _Carry(
        key=key, q=q0, logp=vlogp(q0), logr=vlogr(q0),
        beta=jnp.zeros((), dtype), log_z=jnp.zeros((), dtype),
        step_size=jnp.asarray(cfg.initial_step_size, dtype),
        stage=jnp.zeros((), jnp.int32),
        betas=zeros, ess=zeros, accepts=zeros, steps=zeros)

    final = jax.lax.while_loop(cond, stage, init)
    return SMCResult(
        particles=final.q, log_evidence=final.log_z,
        n_stages=final.stage, betas=final.betas, ess=final.ess,
        accept_rates=final.accepts, step_sizes=final.steps)


def smc(model, cfg: Optional[SMCConfig] = None, seed: int = 0,
        dtype=None, mesh=None):
    """Model-level entry point: returns (Trace, SMCResult).

    The Trace holds the N equally-weighted posterior particles reshaped
    into pseudo-chains (particles are exchangeable, so r̂/ESS diagnostics
    and `predict` work unchanged); `SMCResult.log_evidence` is the model
    evidence estimate.
    """
    from ..core.trace import Trace

    cfg = cfg or SMCConfig()
    dtype = dtype or global_config.dtype()
    cd = model.density()
    cols = cd.column_values(dtype)
    if mesh is not None and "data" in mesh.axis_names:
        from ..parallel.data import shard_columns

        cols = shard_columns(cols, mesh)
    lp_raw = cd.logp_fn()

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("chains"))

    def run(cols_arg):
        def logp(q):
            return lp_raw(q, cols_arg)

        return run_smc(logp, cd.n_vars, cfg, seed=seed, dtype=dtype,
                       sharding=sharding)

    result: SMCResult = global_config.jit(run)(cols)
    from .driver import _device_sync
    _device_sync(result.particles)

    # 4 pseudo-chains so cross-chain diagnostics are defined
    n_pseudo = 4 if cfg.n_particles % 4 == 0 else 1
    chains = np.asarray(result.particles).reshape(
        n_pseudo, cfg.n_particles // n_pseudo, cd.n_vars)
    trace = Trace(chains=chains, model=model, compiled=cd, config=cfg)
    return trace, result
