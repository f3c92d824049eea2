"""Posterior-predictive generators (counterpart of core/Generator.scala).

A Generator is a pure sampling program ``(key, env) -> value`` where ``env``
evaluates any Real (distribution parameters, tracked expressions) at the
current posterior draw.  Because both the RNG (jax.random, counter-based)
and the env (graph evaluation) are traceable, an entire posterior-predictive
pass vmaps over thousands of draws into one XLA program — replacing the
reference's per-draw interpreted Evaluator loop (core/Generator.scala:59-94,
which compiles at most MaxRequirements=500 Reals and interprets the rest).

Rejection-sampler generators from the reference (Marsaglia-Tsang Gamma at
core/Continuous.scala:124-145, Knuth/PTRS Poisson at core/Discrete.scala:
141-186) are replaced by jax.random's native counter-based samplers, which
are the TPU-idiomatic equivalents of the same algorithms.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from .. import config
from ..compute import interp
from ..compute import real as R


class Env:
    """Evaluates Reals at a posterior draw.  ``base`` maps leaf node id ->
    value (parameters bound from the draw, columns bound to data)."""

    def __init__(self, base: dict[int, Any]):
        self._base = dict(base)
        self._backend = interp.jax_backend()

    def __call__(self, x) -> jnp.ndarray:
        x = R.to_real(x)
        if x.id in self._base:
            return jnp.asarray(self._base[x.id])
        val = interp.evaluate([x], self._base, self._backend,
                              config.dtype())[0]
        self._base[x.id] = val
        return val

    def to_double(self, x):
        return self(x)

    def to_int(self, x):
        return self(x).astype(jnp.int32)


def empty_env() -> Env:
    return Env({})


class Generator:
    """Sampling monad; `fn(key, env) -> value` (core/Generator.scala:10-159)."""

    def __init__(self, fn: Callable[[jax.Array, Env], Any],
                 requirements: frozenset = frozenset()):
        self.fn = fn
        self.requirements = requirements

    def get(self, key: jax.Array, env: Env | None = None):
        return self.fn(key, env if env is not None else empty_env())

    def map(self, f: Callable) -> "Generator":
        return Generator(lambda k, e: f(self.fn(k, e)), self.requirements)

    def flat_map(self, f: Callable[[Any], "Generator"]) -> "Generator":
        def fn(key, env):
            k1, k2 = jax.random.split(key)
            inner = to_generator(f(self.fn(k1, env)))
            return inner.fn(k2, env)

        return Generator(fn, self.requirements)

    def zip(self, other: "Generator") -> "Generator":
        def fn(key, env):
            k1, k2 = jax.random.split(key)
            return (self.fn(k1, env), other.fn(k2, env))

        return Generator(fn, self.requirements | other.requirements)

    def repeat(self, n) -> "Generator":
        n = _static_count(n)

        def fn(key, env):
            keys = jax.random.split(key, n)
            try:
                return jax.vmap(lambda k: self.fn(k, env))(keys)
            except Exception:
                return jnp.stack([self.fn(keys[i], env) for i in range(n)])

        return Generator(fn, self.requirements)

    @staticmethod
    def of(t) -> "Generator":
        """`Generator(t)` constructor analogue: convert a Real /
        Distribution / Vec / tuple / list / dict, recursively, via the
        ToGenerator typeclass chain (core/Generator.scala:161-248)."""
        return to_generator(t)

    @staticmethod
    def constant(value) -> "Generator":
        return Generator(lambda k, e: value)

    @staticmethod
    def from_fn(fn: Callable) -> "Generator":
        return Generator(fn)

    @staticmethod
    def real(x) -> "Generator":
        x = R.to_real(x)
        return Generator(lambda k, e: e(x), frozenset([x]))

    @staticmethod
    def require(reqs, fn: Callable) -> "Generator":
        return Generator(fn, frozenset(reqs))

    @staticmethod
    def categorical(pmf: dict) -> "Generator":
        """Draw a key of `pmf` with probability proportional to its value.

        Numeric keys lower to one `jax.random.categorical`; generator- or
        distribution-valued keys (mixtures) lower to `lax.switch` over the
        component samplers (core/Generator.scala categorical + mixture
        flatMap path).
        """
        items = list(pmf.items())
        probs = [R.to_real(p) for _, p in items]

        def draw_index(key, env):
            p = jnp.stack([jnp.asarray(env(pr), dtype=config.dtype())
                           for pr in probs])
            logits = jnp.log(jnp.maximum(p, 1e-30))
            return jax.random.categorical(key, logits)

        keys_ = [t for t, _ in items]
        if all(isinstance(t, (int, float)) for t in keys_):
            vals = jnp.asarray(keys_, dtype=config.dtype())

            def fn(key, env):
                return vals[draw_index(key, env)]

            return Generator(fn, frozenset(probs))

        def fn(key, env):
            k1, k2 = jax.random.split(key)
            idx = draw_index(k1, env)
            branches = [to_generator(t) for t in keys_]

            def make_branch(g):
                # env is host-side structure: close over it, trace only key
                return lambda op_key: g.fn(op_key, env)

            return jax.lax.switch(idx, [make_branch(g) for g in branches],
                                  k2)

        return Generator(fn, frozenset(probs))

    @staticmethod
    def traverse(gens: Sequence) -> "Generator":
        gens = [to_generator(g) for g in gens]

        def fn(key, env):
            keys = jax.random.split(key, len(gens))
            return [g.fn(keys[i], env) for i, g in enumerate(gens)]

        reqs = frozenset().union(*[g.requirements for g in gens]) \
            if gens else frozenset()
        return Generator(fn, reqs)


def _static_count(n) -> int:
    if isinstance(n, R.Constant):
        return int(n.value)
    if isinstance(n, R.Real):
        raise ValueError("repeat() count must be statically known "
                         "(a Constant or python int) for XLA tracing")
    return int(n)


def to_generator(x) -> Generator:
    """ToGenerator typeclass analogue (core/Generator.scala:161-248)."""
    from .distribution import Distribution

    if isinstance(x, Generator):
        return x
    if isinstance(x, Distribution):
        return x.generator()
    if isinstance(x, R.Real):
        return Generator.real(x)
    if isinstance(x, (int, float)):
        return Generator.constant(jnp.asarray(x, dtype=config.dtype()))
    if isinstance(x, (tuple, list)):
        gens = [to_generator(i) for i in x]

        def fn(key, env):
            keys = jax.random.split(key, len(gens))
            vals = [g.fn(keys[i], env) for i, g in enumerate(gens)]
            return tuple(vals) if isinstance(x, tuple) else vals

        reqs = frozenset().union(*[g.requirements for g in gens]) \
            if gens else frozenset()
        return Generator(fn, reqs)
    if isinstance(x, dict):
        ks = list(x.keys())
        gens = [to_generator(x[k]) for k in ks]

        def fn(key, env):
            keys = jax.random.split(key, len(gens))
            return {k: g.fn(keys[i], env)
                    for i, (k, g) in enumerate(zip(ks, gens))}

        reqs = frozenset().union(*[g.requirements for g in gens]) \
            if gens else frozenset()
        return Generator(fn, reqs)
    from ..compute.vec import Vec

    if isinstance(x, Vec):
        # a Vec is array-valued, so its generator yields a per-row array
        # (stacking happens at trace time; heterogeneous element values
        # — e.g. a Vec of tuples — fall back to the plain list)
        def _stack(vals):
            try:
                return jnp.stack(vals)
            except (TypeError, ValueError):
                return vals

        return to_generator(x.to_list()).map(_stack)
    raise TypeError(f"cannot convert {type(x)} to Generator")
