"""Data-parallel (observation-sharded) likelihood evaluation.

The reference's dormant 8-way observation split (core/Model.scala:98-132,
NumSplits=8 — split but evaluated serially, DataFunction.scala:41-46) is
realized here properly: Column arrays are laid out row-sharded across the
mesh's 'data' axis, the per-observation density and its row-sum partial
reduce per device, and XLA's SPMD partitioner inserts the cross-device
psum over ICI.  Gradients shard the same way (the adjoint of a sharded
reduction is a sharded broadcast), so a 100k-row logistic regression's
density+gradient scales with the data axis.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import mesh as M

log = logging.getLogger("rainier_tpu")


def shard_columns(col_vals: tuple, mesh: Mesh, axis: str = M.DATA) -> tuple:
    """Place column arrays row-sharded over `axis`; columns whose length
    does not divide the axis are replicated (with a warning)."""
    if axis not in mesh.axis_names:
        return col_vals
    n_shards = mesh.shape[axis]
    if n_shards == 1:
        return col_vals
    out = []
    for c in col_vals:
        if c.shape[0] % n_shards == 0:
            out.append(jax.device_put(c, NamedSharding(mesh, P(axis))))
        else:
            log.warning(
                "column of %d rows not divisible by %d data shards; "
                "replicating", c.shape[0], n_shards)
            out.append(jax.device_put(c, NamedSharding(mesh, P())))
    return tuple(out)


def sharded_logp_fn(compiled, mesh: Mesh, axis: str = M.DATA):
    """Returns (logp_and_grad(q), sharded_cols) with data-sharded columns.
    The partitioner handles the reduction; user code is unchanged."""
    cols = shard_columns(compiled.column_values(), mesh, axis)
    lpg = compiled.logp_and_grad_fn()

    def fn(q):
        return lpg(q, cols)

    return fn, cols
