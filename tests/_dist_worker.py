"""Worker process for the 2-process jax.distributed test.

Invoked as: python tests/_dist_worker.py <coordinator> <n_procs> <pid> <out>

Each process owns 4 virtual CPU devices; jax.distributed joins them into
one 8-device world.  The worker then runs a mesh-sharded sample through
the ordinary driver path — the identical code a multi-host TPU slice
runs — and process 0 writes the posterior mean + device counts for the
parent test to assert on.
"""

import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    coordinator, n_procs, pid, out_path = sys.argv[1:5]
    from rainier_tpu.parallel import distributed

    distributed.initialize(coordinator_address=coordinator,
                           num_processes=int(n_procs),
                           process_id=int(pid))
    assert jax.process_count() == int(n_procs), jax.process_count()
    assert jax.device_count() == 4 * int(n_procs), jax.device_count()

    import numpy as np

    import rainier_tpu as rt
    from rainier_tpu.parallel import make_mesh
    from rainier_tpu.sampler import HMC, SamplerConfig

    rng = np.random.default_rng(0)
    data = rng.normal(2.0, 1.0, size=128)
    mu = rt.Normal(0, 10).latent()
    model = rt.Model.observe(list(data), rt.Normal(mu, 1.0))
    mesh = make_mesh(n_chain_shards=jax.device_count())
    cfg = SamplerConfig(warmup_iterations=200, iterations=300,
                        sampler=HMC(5), pooled_adaptation=True)
    trace = model.sample(cfg, n_chains=jax.device_count() * 2, seed=0,
                         mesh=mesh)
    est = float(trace.mean(mu))
    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump({"mu": est,
                       "process_count": jax.process_count(),
                       "device_count": jax.device_count(),
                       "n_chains": trace.n_chains}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
