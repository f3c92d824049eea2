"""Lowering Real DAGs to XLA-compiled callables.

Counterpart of compute/Compiler.scala + compute/Target.scala +
ir/CompiledFunction.scala + ir/DataFunction.scala — collapsed to ~150 lines
because tracing the DAG with JAX *is* the compiler: XLA performs the CSE
(Translator.scala SymCache), method packing (Packer.scala), register
allocation (VarTypes.scala) and native code emission (MethodGenerator /
ClassGenerator / GeneratedClassLoader) that the reference hand-rolls in
bytecode.  The gradient is not a graph-to-graph transform
(compute/Gradient.scala) but ``jax.grad`` of the lowered function — the
adjoint rules coincide.

Layout contract (analogue of DataFunction's input layout,
ir/MethodGenerator.scala:169-181): the flat parameter vector ``q`` packs
every latent in *creation order*; a scalar Parameter takes one slot, a
VectorParameter(k) takes k contiguous slots.  Data columns are passed as a
tuple of device arrays, NOT baked into the program, so one compiled density
serves any same-shaped dataset (and can be donated/sharded).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from . import interp
from . import real as R


def find_parameters(roots: Sequence[R.Real]) -> list[R.Real]:
    """All Parameter/VectorParameter leaves reachable from roots,
    transitively through their priors, in creation order
    (cf. TargetGroup.findParameters, compute/Target.scala:82-129)."""
    found: dict[int, R.Real] = {}
    frontier = list(roots)
    seen_roots: set[int] = set()
    while frontier:
        root = frontier.pop()
        if id(root) in seen_roots:
            continue
        seen_roots.add(id(root))
        for node in R.topological([root]):
            if isinstance(node, (R.Parameter, R.VectorParameter)):
                if node.id not in found:
                    found[node.id] = node
                    if node.prior is not None:
                        frontier.append(node.prior)
    return [found[i] for i in sorted(found)]


def find_columns(roots: Sequence[R.Real]) -> list[R.Real]:
    cols: dict[int, R.Real] = {}
    for node in R.topological(list(roots)):
        if isinstance(node, (R.Column, R.IntColumn, R.MatColumn)):
            cols.setdefault(node.id, node)
    return [cols[i] for i in sorted(cols)]


@dataclass
class ParamLayout:
    parameters: list[R.Real]
    slices: list[tuple[int, int]] = field(init=False)
    n_vars: int = field(init=False)

    def __post_init__(self):
        self.slices = []
        off = 0
        for p in self.parameters:
            size = p.size if isinstance(p, R.Parameter) else p.k
            self.slices.append((off, off + size))
            off += size
        self.n_vars = off

    def env_for(self, q):
        """Bind the flat vector q to parameter leaves."""
        env = {}
        for p, (a, b) in zip(self.parameters, self.slices):
            if isinstance(p, R.Parameter):
                env[p.id] = q[a]
            else:
                env[p.id] = q[a:b]
        return env

    def pack(self, values: dict[R.Real, object], xp=np):
        """Inverse of env_for: build a flat q from per-parameter values."""
        q = xp.zeros((self.n_vars,))
        for p, (a, b) in zip(self.parameters, self.slices):
            if p in values:
                if isinstance(p, R.Parameter):
                    q = q.at[a].set(values[p]) if xp is jnp else _npset(
                        q, a, values[p])
                else:
                    q = q.at[a:b].set(values[p]) if xp is jnp else _npsets(
                        q, a, b, values[p])
        return q


def _npset(q, i, v):
    q[i] = v
    return q


def _npsets(q, a, b, v):
    q[a:b] = v
    return q


def prior_total(parameters: Sequence[R.Real]) -> R.Real:
    """Sum of distinct prior densities (TargetGroup's dedicated "prior"
    target, compute/Target.scala:73-75)."""
    terms = []
    for p in parameters:
        if p.prior is None:
            continue
        if isinstance(p, R.VectorParameter):
            terms.append(R.VecSum(p.prior, p.k))
        else:
            terms.append(p.prior)
    return R.sum_(terms)


class CompiledDensity:
    """Compiled ``logp(q)`` + gradient for a set of likelihood Reals.

    Fills the role of Model.density() → DensityFunction
    (core/Model.scala:38-50): ``n_vars``-dim unconstrained vector in,
    scalar log-density and dense gradient out, all on device.
    """

    def __init__(self, likelihoods: Sequence[R.Real],
                 extra_roots: Sequence[R.Real] = ()):
        self.likelihoods = [R.to_real(l) for l in likelihoods]
        roots = self.likelihoods + [R.to_real(e) for e in extra_roots]
        self.layout = ParamLayout(find_parameters(roots))
        self._prior = prior_total(self.layout.parameters)
        self.columns = find_columns(
            self.likelihoods + [self._prior] +
            [p.prior for p in self.layout.parameters if p.prior is not None])
        self._backend = interp.jax_backend()
        self._jit_cache: dict = {}

    @property
    def n_vars(self) -> int:
        return self.layout.n_vars

    @property
    def parameters(self) -> list[R.Real]:
        return self.layout.parameters

    def column_values(self, dtype=None) -> tuple:
        dtype = dtype or config.dtype()
        out = []
        for c in self.columns:
            if isinstance(c, R.IntColumn):
                out.append(jnp.asarray(c.values))
            else:
                out.append(jnp.asarray(c.values, dtype=dtype))
        return tuple(out)

    def logp_fn(self) -> Callable:
        """Pure function (q, cols) -> scalar logp; embeddable in scans/vmaps."""
        likelihoods = self.likelihoods
        prior = self._prior
        layout = self.layout
        columns = self.columns
        backend = self._backend

        def logp(q, cols):
            env = layout.env_for(q)
            for c, v in zip(columns, cols):
                env[c.id] = v
            roots = likelihoods + [prior]
            vals = interp.evaluate(roots, env, backend, q.dtype)
            total = vals[-1]
            for v in vals[:-1]:
                total = total + jnp.sum(v)
            return total

        return logp

    def logp_and_grad_fn(self) -> Callable:
        """(q, cols) -> (logp, grad) — the hot function HMC calls."""
        return jax.value_and_grad(self.logp_fn())

    def logp_lanes_fn(self) -> Callable:
        """(qb (n_vars, C), cols) -> (C,) — whole-chain-block batched
        density in the Pallas kernel's chains-on-lanes layout (see
        interp.evaluate_lanes).  No vmap: every intermediate is rank ≤ 2
        with the chain axis on lanes, so Mosaic lowering needs no
        transposes and MatVec hits the MXU as (n,p)@(p,C)."""
        likelihoods = self.likelihoods
        prior = self._prior
        layout = self.layout
        columns = self.columns

        def logp(qb, cols):
            backend = interp.jax_backend()
            env = {}
            for p, (a, b) in zip(layout.parameters, layout.slices):
                env[p.id] = qb[a:b]                      # (size, C)
            for c, v in zip(columns, cols):
                if isinstance(c, (R.IntColumn, R.MatColumn)):
                    env[c.id] = v
                else:
                    env[c.id] = v.reshape(-1, 1)         # (n, 1)
            roots = likelihoods + [prior]
            vals = interp.evaluate_lanes(roots, env, backend, qb.dtype)
            C = qb.shape[1]
            total = jnp.zeros((1, C), qb.dtype)
            for v in vals:
                if jnp.ndim(v) == 2 and v.shape[0] > 1:
                    v = jnp.sum(v, axis=0, keepdims=True)
                total = total + v
            return total.reshape(C)

        return logp

    def logp_lanes_split_fn(self):
        """Base/row-term split of logp_lanes_fn for row-tiled kernel
        evaluation: returns ``(base_fn, tile_fn)`` with

        * ``base_fn(qb) -> (C,)`` — every column-free term: the prior
          total plus any non-RowSum likelihood roots;
        * ``tile_fn(qb, mask, cols_tile) -> (C,)`` — each RowSum
          likelihood's *per-row child* evaluated on a row-slice of every
          column, multiplied by ``mask`` ((R, 1) — 0 for padding rows)
          and summed over the tile's rows,

        so ``logp(qb, cols) == base_fn(qb) + Σ_tiles tile_fn(...)`` for
        any tiling of the (mask-padded) rows — including RowSum children
        that degenerate to row-independent values, which contribute
        ``child · Σmask`` per tile (the driver still verifies the
        identity numerically before enabling tiling).  Returns None when
        the base terms reference columns (no clean split exists).

        This is the TPU analogue of the reference's DataFunction row loop
        over out-of-cache datasets (ir/DataFunction.scala:48-84): the
        kernel streams row tiles through VMEM-sized activations instead
        of materializing (n_rows, C) reverse-mode residuals."""
        row_roots = [r.child for r in self.likelihoods
                     if isinstance(r, R.RowSum)]
        base_roots = [r for r in self.likelihoods
                      if not isinstance(r, R.RowSum)] + [self._prior]
        if find_columns(base_roots):
            return None
        layout = self.layout
        columns = self.columns

        def env_of(qb):
            env = {}
            for p, (a, b) in zip(layout.parameters, layout.slices):
                env[p.id] = qb[a:b]
            return env

        def base_fn(qb):
            backend = interp.jax_backend()
            vals = interp.evaluate_lanes(base_roots, env_of(qb), backend,
                                         qb.dtype)
            C = qb.shape[1]
            total = jnp.zeros((1, C), qb.dtype)
            for v in vals:
                if jnp.ndim(v) == 2 and v.shape[0] > 1:
                    v = jnp.sum(v, axis=0, keepdims=True)
                total = total + v
            return total.reshape(C)

        def tile_fn(qb, mask, cols_tile):
            backend = interp.jax_backend()
            env = env_of(qb)
            for c, v in zip(columns, cols_tile):
                if isinstance(c, (R.IntColumn, R.MatColumn)):
                    env[c.id] = v
                else:
                    env[c.id] = v.reshape(-1, 1)
            vals = interp.evaluate_lanes(row_roots, env, backend,
                                         qb.dtype)
            C = qb.shape[1]
            total = jnp.zeros((1, C), qb.dtype)
            for v in vals:
                if jnp.ndim(v) == 2 and v.shape[0] > 1:
                    total = total + jnp.sum(v * mask, axis=0,
                                            keepdims=True)
                else:
                    # row-independent child: each (unmasked) row
                    # contributes v once
                    total = total + v * jnp.sum(mask)
            return total.reshape(C)

        return base_fn, tile_fn

    # -- convenience jitted entry points ---------------------------------
    # column values are runtime arguments (never baked into the cached
    # program), so data swapped via Column.swap_values / Model.with_data
    # is visible to every subsequent call while the program cache survives
    def _jitted(self, kind):
        if kind not in self._jit_cache:
            f = self.logp_fn() if kind == "logp" \
                else self.logp_and_grad_fn()
            self._jit_cache[kind] = config.jit(f)
        return self._jit_cache[kind]

    def logp(self, q) -> jax.Array:
        q = jnp.asarray(q, dtype=config.dtype())
        return self._jitted("logp")(q, self.column_values())

    def logp_and_grad(self, q):
        q = jnp.asarray(q, dtype=config.dtype())
        return self._jitted("grad")(q, self.column_values())


def compile_outputs(parameters: Sequence[R.Real],
                    outputs: Sequence[R.Real]) -> Callable:
    """Compile arbitrary output expressions as a function of the flat
    parameter vector (Compiler.compile, compute/Compiler.scala:22-31; used
    by Generator.prepare).  Returns a jitted fn q -> list of values."""
    layout = ParamLayout(list(parameters))
    outs = [R.to_real(o) for o in outputs]
    columns = find_columns(outs)
    backend = interp.jax_backend()
    dtype = config.dtype()

    def raw(q, col_vals):
        env = layout.env_for(q)
        for c, v in zip(columns, col_vals):
            env[c.id] = v
        return interp.evaluate(outs, env, backend, q.dtype)

    jitted = config.jit(raw)
    jitted_v = config.jit(jax.vmap(raw, in_axes=(0, None)))

    def _col_vals():
        # fetched per call (runtime args), so data swapped via
        # Column.swap_values is visible without recompiling
        return tuple(
            jnp.asarray(c.values) if isinstance(c, R.IntColumn)
            else jnp.asarray(c.values, dtype=dtype) for c in columns)

    def fn(q):
        return jitted(q, _col_vals())

    # batched entry: config.jit may carry TPU compiler_options, which JAX
    # rejects on nested jits — callers must not wrap `fn` in jax.jit/vmap
    # themselves (Trace.evaluate batches over draws through this)
    fn.vmapped = lambda qs: jitted_v(qs, _col_vals())
    return fn
