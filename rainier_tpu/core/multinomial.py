"""Multinomial distribution (counterpart of core/Multinomial.scala:11-38)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config
from ..compute import real as R
from . import combinatorics
from .distribution import Distribution
from .generator import Generator


class Multinomial(Distribution):
    """pmf-map parameterized multinomial over outcomes T with k trials.

    Observations are dicts T -> count.
    """

    def __init__(self, pmf: dict, k):
        self.pmf = {t: R.to_real(p) for t, p in pmf.items()}
        self.k = R.to_real(k)

    def log_density_at(self, v: dict) -> R.Real:
        terms = [combinatorics.factorial(self.k)]
        for t, i in v.items():
            i = R.to_real(i)
            p = self.pmf.get(t, R.zero)
            p_term = R.eq(i, R.zero, R.zero, i * p.log())
            terms.append(p_term - combinatorics.factorial(i))
        return R.sum_(terms)

    def log_density(self, ys) -> R.Real:
        if isinstance(ys, dict):
            return self.log_density_at(ys)
        return R.sum_([self.log_density_at(y) for y in ys])

    def generator(self) -> Generator:
        keys_ = list(self.pmf.keys())
        probs = [self.pmf[t] for t in keys_]
        k = self.k

        def fn(key, env):
            p = jnp.stack([jnp.asarray(env(pr), dtype=config.dtype())
                           for pr in probs])
            n = env(k)
            counts = jax.random.multinomial(key, n, p / jnp.sum(p))
            return {t: counts[i].astype(jnp.int32)
                    for i, t in enumerate(keys_)}

        return Generator(fn, frozenset(probs + [k]))

    @staticmethod
    def optional(pmf: dict, k) -> "Multinomial":
        total = R.sum_(list(pmf.values()))
        new_pmf = {(t,): p for t, p in pmf.items()}
        new_pmf[None] = R.one - total
        return Multinomial(new_pmf, k)
