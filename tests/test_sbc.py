"""SBC goldset-style model zoo.

Mirrors rainier-test/.../SBCModel.scala's 12 models.  The reference pins
exact fixed-seed traces; across RNG regimes that is impossible, so the
acceptance criteria here are the statistical ones SURVEY.md §4 prescribes:
rank-histogram non-degeneracy/uniformity and sampler convergence.  The
full-depth calibration (hundreds of reps) runs via `SBC.animate` manually;
CI samples a few repetitions per model family.
"""

import numpy as np
import pytest

from goldset_zoo import zoo
from rainier_tpu.core import rank_uniformity_pvalue
from rainier_tpu.sampler import HMC, SamplerConfig


def _cfg(n):
    # short-warmup dual averaging is under-converged (same as the
    # reference at warmup≪1000); 500 is enough for these 1-D posteriors
    return SamplerConfig(warmup_iterations=500, iterations=max(n, 64),
                         sampler=HMC(6))


@pytest.mark.parametrize("name", ["uniform_normal", "poisson", "binomial"])
def test_sbc_reps_calibrate(name):
    sbc = dict(zoo())[name]
    reps = list(sbc.simulate(30, _cfg, log_bins=2, reps=12, seed=0))
    ranks = [r.rank for r in reps]
    assert max(r.r_hat for r in reps) < 1.2
    # ranks must spread over bins (a broken sampler collapses to one bin)
    assert len(set(ranks)) >= 2, ranks
    assert rank_uniformity_pvalue(reps, 4) > 1e-4


def test_zoo_models_build_and_fit():
    """Every goldset family must synthesize + fit + sample one repetition
    without error (the structural half of the goldset check)."""
    import jax

    for name, sbc in zoo():
        data, true_stat = sbc.synthesize(20, jax.random.PRNGKey(3))
        assert np.all(np.isfinite(np.asarray(data, dtype=np.float64))), name
        model, stat = sbc.fit(data)
        tr = model.sample(SamplerConfig(100, 100, sampler=HMC(4)),
                          n_chains=2, seed=1)
        vals = tr.evaluate(stat)
        assert np.all(np.isfinite(vals)), name
