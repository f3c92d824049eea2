#!/usr/bin/env python
"""Regenerate tests/goldsets/goldsets.json (the reference's per-model
`main` that prints "new goldset:", SBCModel.scala:22-31).

Run from the repo root:  python tests/goldsets/regen.py

Must run under the same backend configuration as the test suite (CPU,
8 virtual devices) so the committed values reproduce under pytest.
"""

import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from goldset_zoo import goldset_run, zoo  # noqa: E402


def main():
    out = {}
    for name, sbc in zoo():
        samples, true_stat = goldset_run(sbc)
        out[name] = {"true_stat": float(true_stat),
                     "samples": [float(v) for v in samples]}
        print(f"{name}: true={true_stat:.6f} "
              f"mean={sum(samples) / len(samples):.6f}")
    path = os.path.join(os.path.dirname(__file__), "goldsets.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
