"""Variationally inferred parameterization (VIP) — partial/automatic
(non-)centering of Normal latents.

The reference's roadmap (docs/roadmap.md "Automatic Reparameterization")
cites Gorinova, Moore & Hoffman, "Automatic Reparameterisation of
Probabilistic Programs" (arXiv:1906.03028) as the improvement it never
built: its `latent` (like ours, core/Continuous.scala:27-34 +
Injection.scala) always produces the *non-centered* parameterization,
which is right for weakly-identified hierarchies (funnels) and wrong for
data-dominated ones.  VIP interpolates: for ``x ~ Normal(mu, sigma)``
with interpolation weight ``lam`` in [0, 1], the sampled parameter is

    x_raw ~ Normal(lam * mu, sigma ** lam)
    x     = mu + sigma ** (1 - lam) * (x_raw - lam * mu)

``lam = 0`` is exactly the default non-centered latent, ``lam = 1`` the
centered one, and fractional values trade between them.  ``auto_vip``
picks ``lam`` automatically by the paper's criterion — the ELBO of a
mean-field variational fit, which is maximized when the posterior over
``x_raw`` is closest to independent Gaussian, i.e. when the
parameterization has best conditioned the geometry for both ADVI and HMC.

Everything is graph-level: ``lam`` enters the `Real` DAG, so one XLA
program per candidate, no Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from ..compute import bounds
from ..compute import real as R
from ..compute.vec import Vec


def _vip_prior(family, location: R.Real, scale: R.Real, lam: R.Real):
    """log Fam((p - lam*mu) / sigma^lam) - lam*log(sigma), the density of
    the raw parameter x_raw ~ Fam(lam*mu, sigma^lam)."""

    def prior(p: R.Real) -> R.Real:
        sd = scale.pow(lam)
        z = (p - lam * location) / sd
        return family._std_log_density(z) - sd.log()

    return prior


def _vip_family(family):
    from .continuous import Normal, _LocationScaleFamily

    family = Normal if family is None else family
    if not isinstance(family, _LocationScaleFamily):
        raise TypeError("VIP applies to location-scale families "
                        "(Normal/Cauchy/Laplace); got "
                        f"{type(family).__name__}")
    return family


def _vip_args(location, scale, lam):
    location, scale = R.to_real(location), R.to_real(scale)
    lam = R.to_real(lam)
    bounds.check(scale, "σ >= 0", lambda v: v >= 0.0)
    bounds.check(lam, "0 <= λ <= 1", lambda v: 0.0 <= v <= 1.0)
    return location, scale, lam


def vip_latent(location, scale, lam=0.0, family=None) -> R.Real:
    """A location-scale latent at interpolation weight ``lam``.

    ``vip_latent(mu, s, 0.0)`` is equivalent to ``Normal(mu, s).latent()``
    (non-centered); ``lam=1.0`` is the centered parameterization; values
    between interpolate (VIP, arXiv:1906.03028 §3).  location/scale may be
    Reals (hierarchical parents).  ``family`` defaults to Normal; any
    location-scale family (Cauchy, Laplace) works — VIP only needs the
    standard member's density."""
    family = _vip_family(family)
    location, scale, lam = _vip_args(location, scale, lam)
    x_raw = R.parameter(_vip_prior(family, location, scale, lam))
    return location + scale.pow(R.one - lam) * (x_raw - lam * location)


def vip_latent_vec(location, scale, k: int, lam=0.0, family=None) -> Vec:
    """Vector form: k iid location-scale latents sharing one interpolation
    weight, as a single rank-1 VectorParameter leaf."""
    family = _vip_family(family)
    location, scale, lam = _vip_args(location, scale, lam)
    vp = R.vector_parameter(k, _vip_prior(family, location, scale, lam))
    return Vec(element=location + scale.pow(R.one - lam) *
               (vp - lam * location), n=k)


@dataclass
class AutoVIPResult:
    model: object            # the Model built at the winning lam
    lam: object              # the winning candidate (as passed to build)
    elbos: list              # final ELBO per candidate, same order
    candidates: list

    def __repr__(self):
        pairs = ", ".join(f"{c}: {e:.2f}"
                          for c, e in zip(self.candidates, self.elbos))
        return f"AutoVIPResult(lam={self.lam}, elbos={{{pairs}}})"


def auto_vip(build: Callable, candidates: Sequence = (0.0, 0.5, 1.0),
             n_steps: int = 600, n_samples: int = 8, seed: int = 0,
             **advi_kwargs) -> AutoVIPResult:
    """Automatic reparameterization: rebuild the model at each candidate
    interpolation weight, score each by the ELBO of a short mean-field
    ADVI fit (the VIP selection criterion, arXiv:1906.03028 §4), and
    return the winner.

    ``build(lam)`` must construct a fresh Model using ``vip_latent(...,
    lam=lam)`` (or any lam-dependent structure — a candidate can be a
    tuple of per-latent weights if build interprets it so)."""
    from ..variational import advi

    elbos, models = [], []
    for cand in candidates:
        model = build(cand)
        fit = advi(model, n_steps=n_steps, n_samples=n_samples, seed=seed,
                   **advi_kwargs)
        # average the ELBO over the last 10% of steps to tame MC noise
        tail = fit.elbo_trace[-max(1, len(fit.elbo_trace) // 10):]
        elbos.append(float(sum(tail) / len(tail)))
        models.append(model)
    best = max(range(len(candidates)), key=lambda i: elbos[i])
    return AutoVIPResult(model=models[best], lam=candidates[best],
                         elbos=elbos, candidates=list(candidates))
