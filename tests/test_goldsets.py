"""Fixed-key goldset regression tests (the reference's SBCTest.scala:5-35:
"sbc.{model} goldset" asserting exact reproduction of committed traces).

Determinism-based regression of sampler + compiler together: the full
synthesize -> fit -> warmup -> HMC-sample -> posterior-predict pipeline
must reproduce the committed values.  jax's counter-based PRNG and XLA's
CPU backend make the run bit-stable; the tolerance below only allows for
compiler-version noise in float reassociation (the reference, owning its
own bytecode backend, can afford exact equality at 1e-10)."""

import json
import os

import numpy as np
import pytest

from goldset_zoo import goldset_run, zoo

from conftest import require_cpu, require_devices  # noqa: E402

GOLD_PATH = os.path.join(os.path.dirname(__file__), "goldsets",
                         "goldsets.json")

with open(GOLD_PATH) as f:
    GOLDSETS = json.load(f)

ZOO = dict(zoo())


@pytest.mark.parametrize("name", sorted(GOLDSETS))
def test_goldset(name):
    require_cpu()
    golden = GOLDSETS[name]
    samples, true_stat = goldset_run(ZOO[name])
    assert np.isclose(true_stat, golden["true_stat"], rtol=1e-6), name
    np.testing.assert_allclose(samples, np.asarray(golden["samples"]),
                               rtol=2e-5, atol=1e-8,
                               err_msg=f"goldset drift: {name} — if the "
                               "change is intentional, regenerate with "
                               "python tests/goldsets/regen.py")


def test_goldsets_cover_zoo():
    assert set(GOLDSETS) == set(ZOO)
