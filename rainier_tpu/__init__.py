"""rainier-tpu: TPU-native Bayesian inference.

A from-scratch rebuild of the capabilities of stripe/rainier (composable
fixed-structure generative models + HMC-family inference) designed for
TPUs: models lower to XLA via JAX tracing, samplers are pure functional
transition kernels run under `lax.scan`/`vmap`/`shard_map`, and thousands
of chains shard across a device mesh.
"""

from . import compute
from .compute import (Real, Vec, const, parameter, vector_parameter, zero,
                      one, pi, infinity, neg_infinity)
from . import config
from . import core
from .core import (Beta, Bernoulli, BetaBinomial, Binomial, Cauchy,
                   Continuous, Discrete, DiscreteConstant, DiscreteMixture,
                   Distribution, Exponential, Gamma, Generator, Geometric,
                   Laplace, LogNormal, Mixture, Model, Multinomial,
                   MVNormal, NegativeBinomial, Normal, Poisson, Uniform)
from . import sampler
from .sampler import (EHMC, HMC, NUTS, SamplerConfig, StaticMassMatrix,
                      StaticStepSize)
from . import parallel
from . import variational
from .variational import advi
from . import viz
from . import inspect as inspection

__version__ = "0.1.0"
