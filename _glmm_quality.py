"""Probe glmm_10k_latents mixing quality vs config (delta, warmup)."""
import sys, time, json
import numpy as np, jax
import rainier_tpu as rt
from rainier_tpu.sampler import NUTS, SamplerConfig
from rainier_tpu.sampler.config import DualAvgStepSize
from benchmarks import models as M

warm, it, delta = int(sys.argv[1]), int(sys.argv[2]), float(sys.argv[3])
model = M.glmm_large()
cfg = SamplerConfig(warm, it, sampler=NUTS(max_depth=8),
                    step_size=DualAvgStepSize(delta=delta))
t0 = time.time()
tr = model.sample(cfg, n_chains=128, seed=0, collect_idx=list(range(8)),
                  chunk_iters=100)
d = tr.diagnostics(); dr = tr.diagnostics(rank_normalized=True)
print(json.dumps({
    "warm": warm, "it": it, "delta": delta,
    "wall_s": round(time.time()-t0, 1),
    "timings": tr.timings,
    "max_rhat": round(max(x.r_hat for x in d), 4),
    "max_rhat_rank": round(max(x.r_hat for x in dr), 4),
    "min_ess_bulk": round(min(x.effective_sample_size for x in dr), 1),
    "divergences": tr.divergences(),
}))
