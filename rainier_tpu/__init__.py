"""rainier-tpu: TPU-native Bayesian inference.

A from-scratch rebuild of the capabilities of stripe/rainier (composable
fixed-structure generative models + HMC-family inference) designed for
TPUs: models lower to XLA via JAX tracing, samplers are pure functional
transition kernels run under `lax.scan`/`vmap`/`shard_map`, and thousands
of chains shard across a device mesh.
"""

import os as _os


def enable_compilation_cache(directory: str | None = None) -> None:
    """Persist XLA executables across processes.

    The reference JIT-compiles each model's density to JVM bytecode and
    keeps it in-process (ir/GeneratedClassLoader.scala); there is nothing
    to persist because compilation is milliseconds.  On TPU — especially
    behind a remote-compile tunnel — a cold compile can take seconds, so
    the framework defaults to JAX's on-disk persistent compilation cache.
    Disable with RAINIER_TPU_NO_COMPILE_CACHE=1 or by pointing
    ``directory`` at None after import.
    """
    import jax

    directory = directory or _os.path.join(
        _os.path.expanduser("~"), ".cache", "rainier_tpu", "xla")
    _os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    # Cache everything: behind a remote-compile tunnel the wall-clock cost
    # of a "fast" compile is dominated by round-trip latency that the
    # measured compile time (and hence the default 1s threshold) misses.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


if _os.environ.get("RAINIER_TPU_NO_COMPILE_CACHE") != "1":
    enable_compilation_cache()

from . import compute
from .compute import (Real, Vec, const, to_real, parameter,
                      vector_parameter, sum_, log_sum_exp, eq, lt, gt, lte,
                      gte, compare, lookup, zero, one, two, neg_one, pi,
                      infinity, neg_infinity, Column, IntColumn, MatColumn)
from . import config
from . import core
from .core import (Beta, Bernoulli, BetaBinomial, Binomial, Cauchy,
                   Continuous, Discrete, DiscreteConstant, DiscreteMixture,
                   Distribution, Exponential, Gamma, Generator, Geometric,
                   Laplace, LogNormal, Mixture, Model, Multinomial,
                   MVNormal, NegativeBinomial, Normal, Poisson, Uniform,
                   MarginalizedLatent, marginalize, auto_vip, vip_latent,
                   vip_latent_vec)
from . import sampler
from .sampler import (EHMC, HMC, NUTS, SamplerConfig, StaticMassMatrix,
                      StaticStepSize)
from . import parallel
from . import variational
from .variational import advi
from . import viz
from . import inspect as inspection

__version__ = "0.1.0"
