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

# Matmul precision for density-evaluation MatVec (X·β and its chain-
# batched (n,p)@(p,C) form).  TPU MXUs multiply in bf16 by default —
# ~4e-3 relative error, coarser than the posterior widths sharp GLMs
# adapt to (a 100k-row logistic posterior has std ~1e-2), which silently
# wrecks warmup adaptation on TPU while the same f32 program converges on
# CPU.  "highest" forces f32-exact products (bf16 multi-pass emulation on
# the MXU); density matmuls are skinny (p ≪ n), so the extra passes are
# noise next to HBM traffic.  Generator/viz matmuls keep the default.
_MATMUL_PRECISION = "highest"


def set_matmul_precision(p) -> None:
    """None restores the backend default (bf16 passes on TPU)."""
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = p


def matmul_precision():
    return _MATMUL_PRECISION


# XLA:TPU's dot-strength-reduction pass pathologically explodes on
# grad-of-MatVec programs with narrow p (readme-regression shape: MatVec
# p=3 under grad with an injection chain): 41.9s to compile vs 1.1s with
# the pass disabled, measured on v5e (docs/internals.md).  Density
# programs keep their dots as dots.
_TPU_COMPILER_FLAGS = {"xla_tpu_enable_dot_strength_reduction": "false"}


def jit(fun, **kw):
    """jax.jit for density/sampler programs: on TPU, applies compiler
    flags that work around known XLA pathologies (see _TPU_COMPILER_FLAGS);
    identical to jax.jit elsewhere."""
    import jax

    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        kw.setdefault("compiler_options", dict(_TPU_COMPILER_FLAGS))
    return jax.jit(fun, **kw)


def enable_compilation_cache(directory: str = None) -> None:
    """Persist XLA executables across processes (round-4 verdict #8:
    NUTS configs paid 13-67 s of backend compile per fresh process vs
    the reference's ~1 s bytecode builds).  A warm cache turns those
    into sub-second deserializations.

    ``directory`` defaults to ``~/.cache/rainier_tpu/xla``.  Safe to
    call more than once; applies process-wide (it is jax.config state —
    the one deliberate exception to this module's no-global-flags rule,
    because the cache is infrastructure, not model/sampler policy)."""
    import os

    import jax

    directory = directory or os.path.join(
        os.path.expanduser("~"), ".cache", "rainier_tpu", "xla")
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    # cache every program regardless of compile time or size; density
    # programs are small but recompiled constantly across benchmark runs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def set_dtype(dtype) -> None:
    global _DTYPE
    _DTYPE = jnp.dtype(dtype)


def dtype():
    """Compute dtype used when lowering graphs / running samplers."""
    return _DTYPE
