"""Backend-parameterized DAG evaluation.

One evaluation core serves two backends:

* ``jax`` — used by :mod:`rainier_tpu.compute.compiler` under ``jax.jit``
  tracing.  This *is* the compiler: tracing the DAG once produces a jaxpr
  that XLA CSEs, simplifies, fuses and lowers to TPU code — replacing the
  reference's entire ir/ package (Translator → Packer → VarTypes →
  MethodGenerator → ClassGenerator → GeneratedClassLoader,
  rainier-compute/.../ir/*).
* ``numpy`` — a slow interpreted oracle, the analogue of
  compute/Evaluator.scala, used by the four-way consistency tests
  (rainier-test/.../compute/RealTest.scala:7-55).

Evaluation is iterative (explicit topological order) so arbitrarily deep
user folds cannot blow Python's stack, and memoized per node id so shared
subgraphs are computed once (hash-consing happens again, properly, in XLA).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from . import real as R


class _NumpyBackend:
    name = "numpy"

    def __init__(self):
        self.np = np

    def asarray(self, x, dtype):
        return np.asarray(x, dtype=dtype)

    def where(self, c, t, f):
        with np.errstate(all="ignore"):
            return np.where(c, t, f)

    def logsumexp(self, stacked):
        from scipy.special import logsumexp

        return logsumexp(stacked, axis=0)

    def sigmoid(self, x):
        from scipy.special import expit

        return expit(x)

    def softplus(self, x):
        return np.logaddexp(0.0, x)

    def lgamma(self, x):
        from scipy.special import gammaln

        return gammaln(x)

    def take(self, arr, idx):
        return np.take(arr, idx, mode="clip")

    def take_along0(self, stacked, idx):
        return np.take_along_axis(stacked, idx[None, :], axis=0)[0]

    def matvec(self, mat, vec):
        return mat @ vec


class _JaxBackend:
    name = "jax"

    def __init__(self):
        import jax
        import jax.numpy as jnp

        self.np = jnp
        self._jax = jax

    def asarray(self, x, dtype):
        return self.np.asarray(x, dtype=dtype)

    def where(self, c, t, f):
        return self.np.where(c, t, f)

    def logsumexp(self, stacked):
        return self._jax.scipy.special.logsumexp(stacked, axis=0)

    def sigmoid(self, x):
        return self._jax.nn.sigmoid(x)

    def softplus(self, x):
        return self._jax.nn.softplus(x)

    def lgamma(self, x):
        return self._jax.scipy.special.gammaln(x)

    def take(self, arr, idx):
        return self.np.take(arr, idx, mode="clip")

    def take_along0(self, stacked, idx):
        return self.np.take_along_axis(stacked, idx[None, :], axis=0)[0]

    def matvec(self, mat, vec):
        # the MXU path: X·β with f32 accumulation AND f32-exact products
        # (default TPU matmul precision is bf16 — too coarse for density
        # evaluation; see config.matmul_precision)
        from .. import config as _cfg

        return self.np.matmul(mat, vec,
                              preferred_element_type=self.np.float32,
                              precision=_cfg.matmul_precision())


NUMPY_BACKEND = _NumpyBackend()


def jax_backend() -> _JaxBackend:
    return _JaxBackend()


def _unary_val(be, op: str, v):
    xp = be.np
    if op == "neg":
        return -v
    if op == "exp":
        return xp.exp(v)
    if op == "log":
        return xp.log(v)
    if op == "log1p":
        return xp.log1p(v)
    if op == "expm1":
        return xp.expm1(v)
    if op == "abs":
        return xp.abs(v)
    if op == "sqrt":
        return xp.sqrt(v)
    if op == "sin":
        return xp.sin(v)
    if op == "cos":
        return xp.cos(v)
    if op == "tan":
        return xp.tan(v)
    if op == "asin":
        return xp.arcsin(v)
    if op == "acos":
        return xp.arccos(v)
    if op == "atan":
        return xp.arctan(v)
    if op == "sinh":
        return xp.sinh(v)
    if op == "cosh":
        return xp.cosh(v)
    if op == "tanh":
        return xp.tanh(v)
    if op == "logistic":
        return be.sigmoid(v)
    if op == "logit":
        return xp.log(v) - xp.log1p(-v)
    if op == "softplus":
        return be.softplus(v)
    if op == "lgamma":
        return be.lgamma(v)
    raise ValueError(op)


def _binary_val(be, op: str, a, b):
    xp = be.np
    if op == "add":
        return a + b
    if op == "sub":
        return a - b
    if op == "mul":
        return a * b
    if op == "div":
        return a / b
    if op == "pow":
        return xp.power(a, b)
    if op == "min":
        return xp.minimum(a, b)
    if op == "max":
        return xp.maximum(a, b)
    raise ValueError(op)


def _pred_val(be, pred: str, a, b):
    if pred == "eq":
        return a == b
    if pred == "lt":
        return a < b
    if pred == "gt":
        return a > b
    if pred == "lte":
        return a <= b
    if pred == "gte":
        return a >= b
    raise ValueError(pred)


def _broadcast_stack(be, vals):
    xp = be.np
    shape = np.broadcast_shapes(*[np.shape(v) for v in vals])
    return xp.stack([xp.broadcast_to(xp.asarray(v), shape) for v in vals])


def evaluate(roots, env: Mapping[int, object], backend, dtype):
    """Evaluate `roots` given `env` (node.id -> value for leaves).

    Returns a list of values aligned with roots.  Non-leaf nodes are
    computed in topological order with per-node memoization.
    """
    xp = backend.np
    memo: dict[int, object] = dict(env)
    if backend.name == "numpy":
        errstate = np.errstate(all="ignore")
    else:
        import contextlib

        errstate = contextlib.nullcontext()
    with errstate:
        for node in R.topological(list(roots)):
            nid = node.id
            if nid in memo:
                continue
            if isinstance(node, R.Constant):
                memo[nid] = backend.asarray(node.value, dtype)
            elif isinstance(node, (R.Column, R.MatColumn)):
                memo[nid] = backend.asarray(node.values, dtype)
            elif isinstance(node, R.IntColumn):
                memo[nid] = xp.asarray(node.values)
            elif isinstance(node, R.MatVec):
                memo[nid] = backend.matvec(memo[node.mat.id],
                                           memo[node.vec.id])
            elif isinstance(node, (R.Parameter, R.VectorParameter)):
                raise KeyError(
                    f"no value bound for parameter {node!r} ({node.name})")
            elif isinstance(node, R.Unary):
                memo[nid] = _unary_val(backend, node.op, memo[node.child.id])
            elif isinstance(node, R.Binary):
                memo[nid] = _binary_val(backend, node.op, memo[node.left.id],
                                        memo[node.right.id])
            elif isinstance(node, R.NArySum):
                acc = memo[node.children[0].id]
                for c in node.children[1:]:
                    acc = acc + memo[c.id]
                memo[nid] = acc
            elif isinstance(node, R.LogSumExp):
                stacked = _broadcast_stack(backend,
                                           [memo[c.id] for c in node.children])
                memo[nid] = backend.logsumexp(stacked)
            elif isinstance(node, R.Select):
                cond = _pred_val(backend, node.pred, memo[node.left.id],
                                 memo[node.right.id])
                memo[nid] = backend.where(cond, memo[node.if_true.id],
                                          memo[node.if_false.id])
            elif isinstance(node, R.Compare):
                a, b = memo[node.left.id], memo[node.right.id]
                memo[nid] = xp.sign(a - b)
            elif isinstance(node, R.Lookup):
                idx = memo[node.index.id]
                idx = (xp.asarray(idx) - node.low).astype(xp.int32) \
                    if not isinstance(idx, (int, np.integer)) \
                    else int(idx) - node.low
                vals = [memo[t.id] for t in node.table]
                idx_arr = xp.asarray(idx)
                if idx_arr.ndim == 0:
                    stacked = _broadcast_stack(backend, vals)
                    memo[nid] = backend.take(stacked, idx_arr)
                else:
                    shape = np.broadcast_shapes(
                        tuple(idx_arr.shape),
                        *[np.shape(v) for v in vals])
                    stacked = xp.stack(
                        [xp.broadcast_to(xp.asarray(v), shape) for v in vals])
                    memo[nid] = backend.take_along0(
                        stacked, xp.broadcast_to(idx_arr, shape).astype(
                            xp.int32))
            elif isinstance(node, R.Gather):
                src = memo[node.source.id]
                idx = xp.asarray(memo[node.index.id]).astype(xp.int32)
                memo[nid] = backend.take(src, idx)
            elif isinstance(node, R.RowSum):
                v = memo[node.child.id]
                if np.ndim(v) == 0:
                    memo[nid] = v * node.n_rows
                else:
                    memo[nid] = xp.sum(v)
            elif isinstance(node, R.VecSum):
                v = memo[node.child.id]
                if np.ndim(v) == 0:
                    memo[nid] = v * node.k
                else:
                    memo[nid] = xp.sum(v)
            else:
                raise TypeError(f"unknown node {type(node)}")
    return [memo[r.id] for r in roots]


def evaluate_lanes(roots, env: Mapping[int, object], backend, dtype):
    """Batched chains-on-lanes evaluation for the Pallas fused-HMC kernel.

    Same DAG, evaluated for a whole chain block at once with the chain
    axis LAST (on TPU vector lanes) and the observation axis first (on
    sublanes) — the kernel's native layout.  Shape conventions, enforced
    by the caller's env bindings:

    * scalar-valued node         → ()  or (1, C)
    * Parameter                  → (1, C)
    * VectorParameter (k slots)  → (k, C)
    * Column                     → (n, 1)   (data broadcasts over lanes)
    * IntColumn                  → (n,) int (gather indices)
    * MatColumn                  → (n, p)
    * column-shaped intermediate → (n, C)

    Everything is rank ≤ 2 and layout-aligned, so Mosaic lowering never
    needs a transpose (jax.vmap over either q axis inserts bool
    transposes and batched dot_generals it cannot legalize);
    `MatVec` is a direct (n,p)@(p,C) MXU matmul — the chain-batched
    systolic-array shape the design doc calls for.  Lookup lowers to a
    masked sum over table entries (branch-free, differentiable) rather
    than a dynamic gather.
    """
    xp = backend.np
    memo: dict[int, object] = dict(env)
    for node in R.topological(list(roots)):
        nid = node.id
        if nid in memo:
            continue
        if isinstance(node, R.Constant):
            memo[nid] = backend.asarray(node.value, dtype)
        elif isinstance(node, (R.Column, R.IntColumn, R.MatColumn)):
            raise KeyError(f"no value bound for column {node!r}")
        elif isinstance(node, (R.Parameter, R.VectorParameter)):
            raise KeyError(f"no value bound for parameter {node!r}")
        elif isinstance(node, R.MatVec):
            memo[nid] = backend.matvec(memo[node.mat.id],
                                       memo[node.vec.id])
        elif isinstance(node, R.Unary):
            memo[nid] = _unary_val(backend, node.op, memo[node.child.id])
        elif isinstance(node, R.Binary):
            memo[nid] = _binary_val(backend, node.op, memo[node.left.id],
                                    memo[node.right.id])
        elif isinstance(node, R.NArySum):
            acc = memo[node.children[0].id]
            for c in node.children[1:]:
                acc = acc + memo[c.id]
            memo[nid] = acc
        elif isinstance(node, R.LogSumExp):
            # pairwise max + shifted exp sum: no rank-3 stack in-kernel
            vals = [memo[c.id] for c in node.children]
            m = vals[0]
            for v in vals[1:]:
                m = xp.maximum(m, v)
            s = xp.exp(vals[0] - m)
            for v in vals[1:]:
                s = s + xp.exp(v - m)
            memo[nid] = m + xp.log(s)
        elif isinstance(node, R.Select):
            cond = _pred_val(backend, node.pred, memo[node.left.id],
                             memo[node.right.id])
            memo[nid] = backend.where(cond, memo[node.if_true.id],
                                      memo[node.if_false.id])
        elif isinstance(node, R.Compare):
            memo[nid] = xp.sign(memo[node.left.id] - memo[node.right.id])
        elif isinstance(node, R.Lookup):
            idx = memo[node.index.id]
            if not hasattr(idx, "ndim") or xp.ndim(idx) == 0:
                idx = xp.asarray(idx)
            if idx.dtype.kind == "f":
                idx = idx.astype(xp.int32)
            idx = idx - node.low
            if idx.ndim == 1:            # IntColumn index → (n, 1)
                idx = idx.reshape(-1, 1)
            acc = None
            for k, t in enumerate(node.table):
                term = xp.where(idx == k, memo[t.id], 0.0)
                acc = term if acc is None else acc + term
            memo[nid] = acc
        elif isinstance(node, R.Gather):
            src = memo[node.source.id]    # (k, C)
            idx = memo[node.index.id]
            idx = xp.asarray(idx).astype(xp.int32)
            memo[nid] = xp.take(src, idx, axis=0, mode="clip")  # (n, C)
        elif isinstance(node, (R.RowSum, R.VecSum)):
            v = memo[node.child.id]
            count = node.n_rows if isinstance(node, R.RowSum) else node.k
            if xp.ndim(v) == 0:
                memo[nid] = v * count
            elif v.shape[0] == 1:
                memo[nid] = v * count
            else:
                memo[nid] = xp.sum(v, axis=0, keepdims=True)
        else:
            raise TypeError(f"unknown node {type(node)}")
    return [memo[r.id] for r in roots]
