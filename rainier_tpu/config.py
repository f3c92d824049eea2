"""Global numeric configuration.

The reference (stripe/rainier) computes everything in JVM float64
(rainier-compute/.../ir/MethodGenerator.scala emits `[D` double arrays).
On TPU, float64 is emulated and slow; the MXU/VPU are built for f32/bf16.
We therefore default to float32 state everywhere, with a switch for float64
(useful for CPU-backed oracle tests, where `jax_enable_x64` is turned on).

MCMC acceptance decisions are sensitive to rounding, so samplers accumulate
the Hamiltonian in `accum_dtype` (still f32 by default on TPU; the dual-avg
and Welford adaptation statistics are carried in f32 which is empirically
sufficient — see tests/test_sampler.py moment checks).
"""

import jax.numpy as jnp

_DTYPE = jnp.float32


def set_dtype(dtype) -> None:
    global _DTYPE
    _DTYPE = jnp.dtype(dtype)


def dtype():
    """Compute dtype used when lowering graphs / running samplers."""
    return _DTYPE
