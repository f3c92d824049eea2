"""ADVI: automatic differentiation variational inference.

No reference counterpart — BASELINE.json names ADVI as the VI path the
reference lacks on accelerator.  Both mean-field and full-rank Gaussian
families over the *unconstrained* parameterization (the same latent
transforms HMC uses, so any model that samples can be fit variationally).

ELBO with the reparameterization trick, optimized by Adam (optax), with
the Monte-Carlo ELBO gradient batched via vmap — one jitted training
step, TPU-resident throughout.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import config as global_config


class VariationalPosterior(NamedTuple):
    """Fitted q(z): mu (n,), either log_sigma (n,) [mean-field] or
    chol (n,n) lower [full-rank]."""

    mu: jax.Array
    log_sigma: Optional[jax.Array]
    chol: Optional[jax.Array]
    elbo_trace: np.ndarray
    model: object
    compiled: object

    def sample(self, n_draws: int, seed: int = 0) -> np.ndarray:
        key = jax.random.PRNGKey(seed)
        eps = jax.random.normal(key, (n_draws, self.mu.shape[0]),
                                dtype=self.mu.dtype)
        if self.chol is not None:
            draws = self.mu + eps @ self.chol.T
        else:
            draws = self.mu + eps * jnp.exp(self.log_sigma)
        return np.asarray(draws)

    def evaluate(self, exprs, n_draws: int = 1000, seed: int = 0):
        """Posterior expectation draws of Real expression(s)."""
        from .compute.compiler import compile_outputs
        from .compute import real as R

        single = isinstance(exprs, R.Real)
        outs = [exprs] if single else list(exprs)
        fn = compile_outputs(self.compiled.parameters, outs)
        draws = jnp.asarray(self.sample(n_draws, seed))
        vals = fn.vmapped(draws)
        vals = [np.asarray(v) for v in vals]
        return vals[0] if single else vals

    def mean(self, expr, n_draws: int = 1000, seed: int = 0) -> float:
        return float(np.mean(self.evaluate(expr, n_draws, seed)))


def advi(model, n_steps: int = 2000, n_samples: int = 8,
         learning_rate: float = 0.05, full_rank: bool = False,
         seed: int = 0, dtype=None) -> VariationalPosterior:
    """Fit q to the model's posterior; returns a VariationalPosterior."""
    dtype = dtype or global_config.dtype()
    cd = model.density()
    cols = cd.column_values(dtype)
    lpg = cd.logp_fn()
    n = cd.n_vars

    def logp(q):
        return lpg(q, cols)

    if full_rank:
        params0 = {
            "mu": jnp.zeros((n,), dtype),
            # parameterize L = tril(strict) + diag(exp(d)) for positivity
            "l_off": jnp.zeros((n, n), dtype),
            "l_diag": jnp.full((n,), -1.0, dtype),
        }

        def draw_and_entropy(p, eps):
            L = jnp.tril(p["l_off"], -1) + jnp.diag(jnp.exp(p["l_diag"]))
            z = p["mu"] + L @ eps
            ent = jnp.sum(p["l_diag"])
            return z, ent
    else:
        params0 = {"mu": jnp.zeros((n,), dtype),
                   "log_sigma": jnp.full((n,), -1.0, dtype)}

        def draw_and_entropy(p, eps):
            z = p["mu"] + jnp.exp(p["log_sigma"]) * eps
            return z, jnp.sum(p["log_sigma"])

    def neg_elbo(p, key):
        eps = jax.random.normal(key, (n_samples, n), dtype=dtype)

        def one(e):
            z, ent = draw_and_entropy(p, e)
            return logp(z) + ent

        return -jnp.mean(jax.vmap(one)(eps))

    opt = optax.adam(learning_rate)

    @jax.jit
    def step(p, opt_state, key):
        loss, g = jax.value_and_grad(neg_elbo)(p, key)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss

    p = params0
    opt_state = opt.init(p)
    key = jax.random.PRNGKey(seed)
    losses = []
    for i in range(n_steps):
        key, k = jax.random.split(key)
        p, opt_state, loss = step(p, opt_state, k)
        if i % 50 == 0 or i == n_steps - 1:
            losses.append(float(loss))
    if full_rank:
        L = jnp.tril(p["l_off"], -1) + jnp.diag(jnp.exp(p["l_diag"]))
        return VariationalPosterior(mu=p["mu"], log_sigma=None, chol=L,
                                    elbo_trace=-np.asarray(losses),
                                    model=model, compiled=cd)
    return VariationalPosterior(mu=p["mu"], log_sigma=p["log_sigma"],
                                chol=None, elbo_trace=-np.asarray(losses),
                                model=model, compiled=cd)
