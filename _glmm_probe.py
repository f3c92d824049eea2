import sys, time
import numpy as np, jax
import rainier_tpu as rt
from rainier_tpu.sampler import NUTS, SamplerConfig
from benchmarks import models as M

chains = int(sys.argv[1]); it = int(sys.argv[2])
model = M.glmm_large()
cfg = SamplerConfig(it, it, sampler=NUTS(max_depth=8))
t0 = time.time()
tr = model.sample(cfg, n_chains=chains, seed=0, collect_idx=list(range(8)))
print("ok", time.time()-t0, "rhat subset:", max(d.r_hat for d in tr.diagnostics()))
print("timings:", tr.timings)
