"""Checkpoint / resume for sampler state.

The reference has none (SURVEY.md §5): warmup's (stepSize, massMatrix)
come back with the trace but can only be re-fed through Static* configs.
Here the full adaptation product — step size, mass matrix, final chain
positions, RNG — is an explicit serializable pytree, so sampling can
resume exactly (warm restarts, elastic reruns, N-host scaling runs).

Format: a single .npz of flattened pytree leaves + a JSON tree-structure
descriptor (no pickle — loadable anywhere).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, tree) -> None:
    leaves, treedef = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, __treedef__=json.dumps(str(treedef)), **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, like_tree):
    """Restore into the structure of `like_tree` (leaf order must match)."""
    data = np.load(path, allow_pickle=False)
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
    _, treedef = _flatten(like_tree)
    return jax.tree.unflatten(treedef, leaves)


def resume_config(trace, base_config):
    """Build a SamplerConfig that resumes sampling with the adaptation
    product of a finished run: static step size + static mass (per-chain
    values are averaged — use per-chain resume via sampler state for exact
    continuation)."""
    from ..sampler import config as C

    step = float(np.mean(np.asarray(trace.step_size)))
    mass = trace.mass
    if mass.diag is not None:
        m = C.StaticMassMatrix(diag=np.mean(np.asarray(mass.diag), axis=0))
    elif mass.cov is not None:
        m = C.StaticMassMatrix(cov=np.mean(np.asarray(mass.cov), axis=0))
    else:
        m = C.IdentityMassMatrix()
    import dataclasses

    return dataclasses.replace(base_config, warmup_iterations=0,
                               step_size=C.StaticStepSize(step),
                               mass_matrix=m)
