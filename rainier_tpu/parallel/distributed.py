"""Multi-host SPMD launch glue.

No reference counterpart (pure single-JVM library).  On a multi-host TPU
slice, call `initialize()` once per process before building meshes: it
wires jax.distributed over DCN (coordinator discovery from standard TPU
env vars), after which `jax.devices()` spans the slice and the same
mesh/sharding code paths scale from 1 to N hosts — collectives ride ICI
within a slice and DCN across them.
"""

from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger("rainier_tpu")

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-process; no-op for
    single-process runs (so the same entrypoint works everywhere)."""
    global _initialized
    if _initialized:
        return
    explicit = coordinator_address is not None
    env_present = any(v in os.environ for v in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not env_present:
        log.info("single-process run; skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    log.info("jax.distributed initialized: process %d/%d, %d local / %d "
             "global devices", jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


def is_primary() -> bool:
    return jax.process_index() == 0
