"""Discrete distribution families (counterpart of core/Discrete.scala).

Densities mirror the reference formulas (with the same eq-guards for the
0·log(0) corners); generators use jax.random's native samplers instead of
the reference's scalar rejection loops (Knuth small-λ / PTRS large-λ
Poisson at core/Discrete.scala:141-186, geometric-sum / normal-approx
NegativeBinomial at :87-110, Poisson/normal-switchover Binomial at
:194-234).  jax.random implements the same regime switches internally,
vectorized and branch-free — the TPU-idiomatic form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config
from ..compute import bounds
from ..compute import real as R
from . import combinatorics
from .continuous import Beta, Normal
from .distribution import Distribution
from .generator import Generator


class Discrete(Distribution):
    def zero_inflated(self, psi) -> "DiscreteMixture":
        return self.constant_inflated(0.0, psi)

    def constant_inflated(self, constant, psi) -> "DiscreteMixture":
        psi = R.to_real(psi)
        return DiscreteMixture({
            DiscreteConstant(constant): psi,
            self: R.one - psi
        })


class DiscreteConstant(Discrete):
    """Point mass (core/Discrete.scala:22-33)."""

    def __init__(self, constant):
        self.constant = R.to_real(constant)

    def log_density_at(self, v):
        return R.eq(R.to_real(v), self.constant, R.zero, R.neg_infinity)

    def generator(self):
        c = self.constant
        # int32 so mixture lax.switch branches share a dtype with the
        # other discrete samplers
        return Generator(
            lambda key, env: jnp.round(env(c)).astype(jnp.int32),
            frozenset([c]))


class Bernoulli(Discrete):
    def __init__(self, p):
        self.p = R.to_real(p)
        bounds.check(self.p, "0 <= p <= 1", lambda v: 0.0 <= v <= 1.0)

    def log_density_at(self, v):
        # Bernoulli(logistic(x)) lowers to the logit parameterization:
        # logP(1) = −softplus(−x), logP(0) = −softplus(x).  Saturation-
        # proof where log(p)/log(1−p) overflow to −inf (with NaN grads)
        # in f32 — the GLM hot path (BASELINE 100k logistic regression).
        if isinstance(self.p, R.Unary) and self.p.op == "logistic":
            x = self.p.child
            return R.eq(R.to_real(v), R.zero,
                        R.to_real(x).softplus() * -1,
                        R.to_real(x * -1).softplus() * -1)
        return R.eq(R.to_real(v), R.zero, (1 - self.p).log(), self.p.log())

    def generator(self):
        p = self.p
        return Generator(
            lambda key, env: jax.random.bernoulli(
                key, jnp.asarray(env(p), dtype=config.dtype())
            ).astype(jnp.int32),
            frozenset([p]))


class Geometric(Discrete):
    """Failures before first success, support {0,1,...}
    (core/Discrete.scala:56-74)."""

    def __init__(self, p):
        self.p = R.to_real(p)
        bounds.check(self.p, "0 <= p <= 1", lambda v: 0.0 <= v <= 1.0)

    def log_density_at(self, v):
        v = R.to_real(v)
        return self.p.log() + v * (1 - self.p).log()

    def generator(self):
        p = self.p

        def fn(key, env):
            u = jax.random.uniform(key, dtype=config.dtype())
            q = jnp.asarray(env(p), dtype=config.dtype())
            return jnp.floor(jnp.log(u) / jnp.log1p(-q)).astype(jnp.int32)

        return Generator(fn, frozenset([p]))


class NegativeBinomial(Discrete):
    """NB(p, n): number of successes before the n-th failure
    (core/Discrete.scala:82-118)."""

    def __init__(self, p, n):
        self.p = R.to_real(p)
        self.n = R.to_real(n)
        bounds.check(self.p, "0 <= p <= 1", lambda v: 0.0 <= v <= 1.0)
        bounds.check(self.n, "n >= 0", lambda v: v >= 0.0)

    def log_density_at(self, v):
        v = R.to_real(v)
        return (combinatorics.factorial(self.n + v - 1)
                - combinatorics.factorial(v)
                - combinatorics.factorial(self.n - 1)
                + self.n * (1 - self.p).log() + v * self.p.log())

    def generator(self):
        p, n = self.p, self.n

        def fn(key, env):
            # gamma–Poisson mixture: λ ~ Gamma(n, p/(1−p)); v ~ Poisson(λ).
            # Replaces the reference's geometric-sum / normal-approx split.
            k1, k2 = jax.random.split(key)
            pv = jnp.asarray(env(p), dtype=config.dtype())
            nv = jnp.asarray(env(n), dtype=config.dtype())
            lam = jax.random.gamma(k1, nv, dtype=config.dtype()) * \
                pv / (1.0 - pv)
            return jax.random.poisson(k2, lam).astype(jnp.int32)

        return Generator(fn, frozenset([p, n]))


class Poisson(Discrete):
    def __init__(self, lam):
        self.lam = R.to_real(lam)
        bounds.check(self.lam, "λ >= 0", lambda v: v >= 0.0)

    def log_density_at(self, v):
        v = R.to_real(v)
        return self.lam.log() * v - self.lam - combinatorics.factorial(v)

    def generator(self):
        lam = self.lam
        return Generator(
            lambda key, env: jax.random.poisson(
                key, jnp.asarray(env(lam), dtype=config.dtype())
            ).astype(jnp.int32),
            frozenset([lam]))


class Binomial(Discrete):
    """Binomial(p, k) (core/Discrete.scala:190-234; density routed through
    Multinomial in the reference — expanded here to the same closed form
    with eq-guards for the 0·log(0) corners)."""

    def __init__(self, p, k):
        self.p = R.to_real(p)
        self.k = R.to_real(k)
        bounds.check(self.p, "0 <= p <= 1", lambda v: 0.0 <= v <= 1.0)
        bounds.check(self.k, "k >= 0", lambda v: v >= 0.0)

    def log_density_at(self, v):
        v = R.to_real(v)
        p, k = self.p, self.k
        succ = R.eq(v, R.zero, R.zero, v * p.log())
        fail = R.eq(k - v, R.zero, R.zero, (k - v) * (1 - p).log())
        return combinatorics.choose(k, v) + succ + fail

    def generator(self):
        p, k = self.p, self.k

        def fn(key, env):
            pv = jnp.asarray(env(p), dtype=config.dtype())
            kv = jnp.asarray(env(k), dtype=config.dtype())
            return jax.random.binomial(key, kv, pv).astype(jnp.int32)

        return Generator(fn, frozenset([p, k]))


class BetaBinomial(Discrete):
    def __init__(self, a, b, k):
        self.a = R.to_real(a)
        self.b = R.to_real(b)
        self.k = R.to_real(k)

    def log_density_at(self, v):
        v = R.to_real(v)
        return (combinatorics.choose(self.k, v)
                + combinatorics.beta(self.a + v, self.k - v + self.b)
                - combinatorics.beta(self.a, self.b))

    def generator(self):
        a, b, k = self.a, self.b, self.k

        def fn(key, env):
            k1, k2 = jax.random.split(key)
            p = jax.random.beta(
                k1, jnp.asarray(env(a), dtype=config.dtype()),
                jnp.asarray(env(b), dtype=config.dtype()),
                dtype=config.dtype())
            kv = jnp.asarray(env(k), dtype=config.dtype())
            return jax.random.binomial(k2, kv, p).astype(jnp.int32)

        return Generator(fn, frozenset([a, b, k]))

    @staticmethod
    def mean_and_precision(mean, precision, k) -> "BetaBinomial":
        mean, precision = R.to_real(mean), R.to_real(precision)
        return BetaBinomial(mean * precision,
                            (R.one - mean) * precision, k)


class DiscreteMixture(Discrete):
    def __init__(self, components: dict):
        self.components = {d: R.to_real(w) for d, w in components.items()}
        for w in self.components.values():
            bounds.check(w, "0 <= p <= 1", lambda v: 0.0 <= v <= 1.0)

    def log_density_at(self, v):
        v = R.to_real(v)
        return R.log_sum_exp([
            d.log_density_at(v) + w.log()
            for d, w in self.components.items()
        ])

    def generator(self):
        return Generator.categorical(self.components)
