"""Simulation-Based Calibration (Talts et al., arXiv:1804.06788).

Counterpart of core/SBC.scala:15-216: synthesize data from the prior,
re-fit, compute the rank of the true parameter among posterior draws;
over many repetitions the ranks must be uniform.  Auto-thinning until
ESS ≥ `samples` (≤ `trials` attempts) and the animated terminal histogram
with 99% binomial quantile bands are reproduced; the per-repetition fit
runs the full vmapped sampler, so a repetition costs one compiled run.
"""

from __future__ import annotations

import math
import sys
import time
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import numpy as np

import jax

from ..compute import real as R
from .continuous import Continuous
from .generator import Generator, empty_env
from .model import Model

SAMPLES = 1024
CHAINS = 4
REPS_PER_BIN = 40
TRIALS = 5


@dataclass
class Rep:
    rank: int
    r_hat: float
    thin: int
    effective_sample_size: float
    seconds: float


class SBC:
    """sbc = SBC([prior, ...], fn) where fn maps the latent values to
    (likelihood distribution, tracked statistic)."""

    def __init__(self, priors: Sequence[Continuous],
                 fn: Callable[[list], tuple]):
        self.priors = list(priors)
        self.fn = fn

    @staticmethod
    def of(prior: Continuous, fn: Callable) -> "SBC":
        """SBC(prior){ x => dist } — calibrates on the latent itself
        (SBC.scala:185-189)."""
        return SBC([prior], lambda xs: (fn(xs[0]), xs[0]))

    # -- synthesize -------------------------------------------------------
    def synthesize(self, n_samples: int, key) -> tuple:
        """Prior-predictive draw: (data values, true statistic)."""
        k1, k2 = jax.random.split(key)
        prior_gens = [p.generator() for p in self.priors]
        keys = jax.random.split(k1, len(prior_gens))
        env = empty_env()
        vals = [float(g.get(keys[i], env)) for i, g in enumerate(prior_gens)]
        dist, stat = self.fn([R.const(v) for v in vals])
        true_stat = float(env(stat))
        data_gen = dist.generator()
        data = np.asarray(
            jax.vmap(lambda k: data_gen.get(k, empty_env()))(
                jax.random.split(k2, n_samples)))
        return data, true_stat

    def fit(self, values) -> tuple:
        dist, stat = self.fn([p.latent() for p in self.priors])
        return Model.observe(list(values), dist), stat

    def _fit_template(self, n: int) -> tuple:
        """One model graph per data length; repetitions swap the Column's
        values via Model.with_data so the compiled sampler program (cached
        on the CompiledDensity) is reused across reps — the reference
        rebuilds and re-compiles per repetition."""
        if not hasattr(self, "_templates"):
            self._templates = {}
        if n not in self._templates:
            col = R.Column(np.zeros(n))
            dist, stat = self.fn([p.latent() for p in self.priors])
            model = Model.likelihood(
                R.RowSum(dist.log_density_at(col), n))
            self._templates[n] = (model, stat, col)
        return self._templates[n]

    def model(self, n_synthetic: int, seed: int = 0) -> tuple:
        data, _ = self.synthesize(n_synthetic, jax.random.PRNGKey(seed))
        return self.fit(data)

    # -- repetition -------------------------------------------------------
    def _sample_once(self, sampler_fn, n_synthetic, thin, key, seed):
        data, true_stat = self.synthesize(n_synthetic, key)
        model, stat, col = self._fit_template(n_synthetic)
        # same-shape data swap through the sanctioned API: the compiled
        # sampler program (cached on the CompiledDensity) is reused
        model.with_data({col: data})
        cfg = sampler_fn(SAMPLES * thin // CHAINS)
        trace = model.sample(cfg, n_chains=CHAINS, seed=seed)
        trace = trace.thin(thin) if thin > 1 else trace
        diags = trace.diagnostics()
        max_rhat = max(d.r_hat for d in diags)
        min_ess = min(d.effective_sample_size for d in diags)
        stats = trace.evaluate(stat)
        raw_rank = int(np.sum(stats[1:] < true_stat))
        return raw_rank, max_rhat, min_ess, len(stats)

    def _repetition(self, sampler_fn, n_synthetic, bins, key, seed) -> Rep:
        t0 = time.time()
        thin = 1
        for trial in range(TRIALS):
            raw_rank, r_hat, ess, n_draws = self._sample_once(
                sampler_fn, n_synthetic, thin, key, seed + trial)
            if ess >= SAMPLES or trial == TRIALS - 1:
                break
            thin = int(math.ceil(SAMPLES / max(ess, 1.0)))
        rank = (raw_rank * bins) // max(n_draws - 1, 1)
        rank = min(rank, bins - 1)
        return Rep(rank=rank, r_hat=r_hat, thin=thin,
                   effective_sample_size=ess, seconds=time.time() - t0)

    def simulate(self, n_synthetic: int, sampler_fn: Callable,
                 log_bins: int = 3, reps: Optional[int] = None,
                 seed: int = 0):
        """Yield Reps (lazily, like the reference's Stream)."""
        assert log_bins > 0
        bins = 1 << log_bins
        assert bins <= SAMPLES
        reps = reps if reps is not None else bins * REPS_PER_BIN
        key = jax.random.PRNGKey(seed)
        for i in range(reps):
            key, k = jax.random.split(key)
            yield self._repetition(sampler_fn, n_synthetic, bins, k,
                                   seed + i * TRIALS)

    # -- terminal animation (SBC.animate / plot) --------------------------
    def animate(self, n_synthetic: int, sampler_fn: Callable,
                log_bins: int = 3, reps: Optional[int] = None,
                seed: int = 0, out=sys.stdout):
        bins = 1 << log_bins
        total = reps if reps is not None else bins * REPS_PER_BIN
        lower = binomial_quantile(0.005, total, 1.0 / bins)
        upper = binomial_quantile(0.995, total, 1.0 / bins)
        print(f"\nRunning simulation-based calibration "
              f"({total} reps, {bins} bins).", file=out)
        results = []
        t0 = time.time()
        for i, rep in enumerate(
                self.simulate(n_synthetic, sampler_fn, log_bins, total,
                              seed)):
            results.append(rep)
            elapsed = time.time() - t0
            remaining = elapsed * (total - i - 1) / (i + 1)
            self._plot(results, bins, i + 1, total, lower, upper,
                       remaining, out)
        return results

    def _plot(self, reps, bins, i, total, lower, upper, remaining, out):
        counts = np.zeros(bins, dtype=int)
        for r in reps:
            counts[r.rank] += 1
        max_rhat = max(r.r_hat for r in reps)
        ess_per_s = sum(r.effective_sample_size for r in reps) / max(
            sum(r.seconds for r in reps), 1e-9)
        lines = [f"Repetition {i}/{total}. ~{remaining:.0f}s remaining. "
                 f"ESS/s {ess_per_s:.0f}. max rHat {max_rhat:.3f}"]
        lines.append("99% of bins should land between [ and ]")
        for c in counts:
            color = "\033[32m" if lower <= c <= upper else "\033[31m"
            bar = "#" * min(c, lower) + " " * max(lower - c, 0)
            mid = "#" * max(min(c - lower, upper - lower), 0)
            mid += " " * max(upper - lower - len(mid), 0)
            tail = "#" * max(c - upper, 0)
            lines.append(f"{color}{bar}[{mid}]{tail}\033[0m")
        print("\n".join(lines) + "\n", file=out)


def binomial_quantile(q: float, n: int, p: float) -> int:
    """Smallest k with CDF ≥ q (SBC.binomialQuantile)."""
    from scipy.stats import binom

    return int(binom.ppf(q, n, p))


def rank_uniformity_pvalue(reps: Sequence[Rep], bins: int) -> float:
    """χ² goodness-of-fit p-value of the rank histogram vs uniform —
    a programmatic acceptance criterion on top of the reference's visual
    check."""
    from scipy.stats import chisquare

    counts = np.zeros(bins, dtype=int)
    for r in reps:
        counts[r.rank] += 1
    return float(chisquare(counts).pvalue)
