"""Constant-parity sweep: every numeric default shared with the reference
is pinned here with a file:line citation, so silent drift (the round-1
`ehmc()` max_steps 1000-vs-1024 bug) is caught by one table-driven test.

Constants that the TPU build *deliberately* changes are listed at the
bottom with their rationale rather than silently diverging.
"""

import math

from rainier_tpu.core import sbc as SBC
from rainier_tpu.sampler import config as C
from rainier_tpu.sampler import dualavg

# (actual value, expected, reference citation)
SHARED_CONSTANTS = [
    # -- Nesterov dual averaging (sampler/DualAvg.scala:44-90) ------------
    (dualavg.STEP_SIZE_UPDATE_DENOM, 0.05,
     "DualAvg.scala stepSizeUpdateDenom = 0.05"),
    (dualavg.ACCEPT_PROB_UPDATE_DENOM, 10.0,
     "DualAvg.scala acceptProbUpdateDenom = 10"),
    (dualavg.DECAY_RATE, 0.75,
     "DualAvg.scala decayRate = 0.75"),
    (C.DualAvgStepSize().delta, 0.8,
     "sampler/Sampler.scala:25 DualAvgStepSize(0.8)"),
    # -- DefaultConfig (sampler/Sampler.scala:16-27) ----------------------
    (C.SamplerConfig().warmup_iterations, 1000,
     "Sampler.scala DefaultConfig warmupIterations = 1000"),
    (C.SamplerConfig().iterations, 1000,
     "Sampler.scala DefaultConfig iterations = 1000"),
    (C.SamplerConfig().sampler.max_steps, 1024,
     "Sampler.scala DefaultConfig sampler = EHMCSampler(1024)"),
    # -- EHMC (sampler/EHMC.scala:3-74) -----------------------------------
    (C.EHMC().p_count, 0.1,
     "EHMC.scala:15-27 warmup counts steps with prob 0.1"),
    (C.EHMC().buf_size, 100,
     "EHMC.scala RingBuffer(100) of empirical step counts"),
    (C.EHMC().min_steps, 1,
     "EHMC.scala:64-74 minSteps default 1"),
    (C.ehmc(10, 10).sampler.max_steps, 1024,
     "DefaultConfig EHMCSampler(1024) — round-1 drift was 1000"),
    # -- windowed mass adaptation (Sampler.scala:25 / MassMatrix.scala) ---
    (C.DiagonalMassMatrixTuner().initial_window, 50,
     "DiagonalMassMatrixTuner(50, 1.5, 50, 50)"),
    (C.DiagonalMassMatrixTuner().expansion, 1.5,
     "DiagonalMassMatrixTuner(50, 1.5, 50, 50)"),
    (C.DiagonalMassMatrixTuner().skip_first, 50,
     "DiagonalMassMatrixTuner(50, 1.5, 50, 50)"),
    (C.DiagonalMassMatrixTuner().skip_last, 50,
     "DiagonalMassMatrixTuner(50, 1.5, 50, 50)"),
    (C.DenseMassMatrixTuner().initial_window, 50,
     "DenseMassMatrixTuner same schedule (MassMatrix.scala:120-181)"),
    # -- SBC harness (core/SBC.scala:15-31) --------------------------------
    (SBC.SAMPLES, 1024, "SBC.scala Samples = 1024 (ESS target)"),
    (SBC.TRIALS, 5, "SBC.scala Trials = 5 (auto-thinning attempts)"),
    # -- HMC legacy constructor (sampler/HMC.scala:26-33) ------------------
    (C.hmc(7, 9, 5).sampler.n_steps, 5, "HMC(warmIt, it, nSteps)"),
]


def test_shared_constants_match_reference():
    mismatches = [
        f"{cite}: got {actual!r}, expected {expected!r}"
        for actual, expected, cite in SHARED_CONSTANTS
        if actual != expected
    ]
    assert not mismatches, "\n".join(mismatches)


def test_dual_avg_shrinkage_target():
    """mu = log(10·eps0) (DualAvg.scala:44-50)."""
    import pytest

    s = dualavg.dual_avg_init(0.25)
    # rel=1e-4: TPU f32 log is only ~2.5e-5-accurate (measured on v5e:
    # 0.9163132 vs 0.9162907); this is a constants-drift guard, not a
    # precision test — any actual formula change moves the value by
    # O(1)
    assert float(s.shrinkage_target) == pytest.approx(
        math.log(10.0 * 0.25), rel=1e-4)


# Deliberate deviations (documented, not drift):
# * optimizer grad_tol 1e-5 vs reference Optimizer.lbfgs eps=0.1
#   (optimizer/Optimizer.scala:6-24): ours is a relative gradient-norm
#   criterion on a different L-BFGS implementation; 0.1 would stop far
#   from the optimum under that criterion.
# * Generator has no MaxRequirements=500 split (Generator.scala:59-94):
#   everything is traced, so the compile/interpret split does not exist.
# * Model has no NumSplits=8 observation split (Model.scala:98-132):
#   superseded by Column sharding over the device mesh.
# * Stats are full-run aggregates rather than statsWindow=100 ring
#   buffers (Stats.scala:3-16): inside one fused scan there is no
#   incremental display to window for; the Progress path chunks instead.
