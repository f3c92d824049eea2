"""Equal-chains EHMC vs HMC comparison on the funnel (VERDICT r2 #4)."""
import time, json, numpy as np, jax
import rainier_tpu as rt
from rainier_tpu.sampler import EHMC, HMC, SamplerConfig
from benchmarks import models as M

model = M.funnel()
for smp, label in ((HMC(5), "hmc5"), (EHMC(max_steps=1024), "ehmc1024")):
    cfg = SamplerConfig(1000, 1000, sampler=smp)
    tr = model.sample(cfg, n_chains=256, seed=0)   # warm/compile
    tr = model.sample(cfg, n_chains=256, seed=1)
    grads = float(np.sum(np.asarray(tr.stats.grad_evals)))
    s = tr.timings.get("sample_s")
    print(json.dumps({"sampler": label, "chains": 256,
                      "sample_s": s, "grad_evals": grads,
                      "grad_evals_per_s": round(grads / s),
                      "us_per_iteration": round(s / 2000 * 1e6, 1),
                      "timings": tr.timings}), flush=True)
