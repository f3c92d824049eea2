from . import combinatorics
from .combinatorics import beta as log_beta, choose as log_choose
from .combinatorics import factorial as log_factorial, gamma as log_gamma
from .continuous import (Beta, Cauchy, Continuous, Exponential, Gamma,
                         Laplace, LogNormal, Mixture, Normal, Uniform)
from .discrete import (Bernoulli, BetaBinomial, Binomial, Discrete,
                       DiscreteConstant, DiscreteMixture, Geometric,
                       NegativeBinomial, Poisson)
from .distribution import Distribution
from .generator import Env, Generator, to_generator
from .injection import Exp, Injection, Scale, Translate
from .model import Model
from .multinomial import Multinomial
from .support import (BoundedAboveSupport, BoundedBelowSupport,
                      BoundedSupport, Support, UnboundedSupport)

__all__ = [
    "combinatorics", "log_beta", "log_choose", "log_factorial", "log_gamma",
    "Beta", "Cauchy", "Continuous", "Exponential", "Gamma", "Laplace",
    "LogNormal", "Mixture", "Normal", "Uniform", "Bernoulli", "BetaBinomial",
    "Binomial", "Discrete", "DiscreteConstant", "DiscreteMixture",
    "Geometric", "NegativeBinomial", "Poisson", "Distribution", "Env",
    "Generator", "to_generator", "Exp", "Injection", "Scale", "Translate",
    "Model", "Multinomial", "BoundedAboveSupport", "BoundedBelowSupport",
    "BoundedSupport", "Support", "UnboundedSupport",
]
from .sbc import SBC, Rep, rank_uniformity_pvalue  # noqa: E402
from .trace import Diagnostics, Trace  # noqa: E402

__all__ += ["SBC", "Rep", "rank_uniformity_pvalue", "Diagnostics", "Trace"]
from .mvnormal import MVNormal  # noqa: E402

__all__ += ["MVNormal"]
from .marginal import (MarginalizedLatent, enumerated_support,  # noqa: E402
                       marginalize)

__all__ += ["MarginalizedLatent", "enumerated_support", "marginalize"]
from .reparam import (AutoVIPResult, auto_vip, vip_latent,  # noqa: E402
                      vip_latent_vec)

__all__ += ["AutoVIPResult", "auto_vip", "vip_latent", "vip_latent_vec"]
