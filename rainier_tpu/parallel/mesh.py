"""Device-mesh helpers for chain- and data-parallel inference.

No reference counterpart — stripe/rainier is single-process and runs
chains sequentially (core/Model.scala:16-22, SURVEY.md §2.6).  Here the
two scaling axes of MCMC map onto a 2-D mesh:

* ``chains`` — embarrassingly-parallel chain batch (the dp axis).  Chains
  only communicate when pooled adaptation / cross-chain diagnostics are
  requested, via psum/pmean over ICI.
* ``data``  — observation sharding for ≥100k-row likelihoods (the
  structural analogue of sequence parallelism, SURVEY.md §5): Columns are
  sharded row-wise, each device computes a partial log-density sum, and
  XLA's SPMD partitioner inserts the psum (the annotate-shardings recipe).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAINS = "chains"
DATA = "data"


def make_mesh(n_chain_shards: int | None = None,
              n_data_shards: int = 1,
              devices=None) -> Mesh:
    """Build a ('chains', 'data') mesh.  Defaults to all devices on the
    chains axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_chain_shards is None:
        n_chain_shards = len(devices) // n_data_shards
    n = n_chain_shards * n_data_shards
    if n > len(devices):
        raise ValueError(
            f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_chain_shards, n_data_shards)
    return Mesh(arr, (CHAINS, DATA))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(CHAINS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
