"""Model.with_data / Column.swap_values: same-shape data swap with full
program-cache reuse and no stale-data hazard.

Round-1 SBC mutated `col.values` behind the compiler's back, and
CompiledDensity._jitted / compile_outputs baked column values into the
cached programs at first call — any consumer that cached would read stale
data.  Column values are now runtime arguments everywhere; these tests
prove every cached consumer observes the swap."""

import jax.numpy as jnp
import numpy as np
import pytest

import rainier_tpu as rt
from rainier_tpu.compute import real as R
from rainier_tpu.compute.compiler import compile_outputs
from rainier_tpu.sampler import HMC, SamplerConfig


def _normal_template(n):
    mu = rt.Normal(0, 10).latent()
    col = R.Column(np.zeros(n))
    model = rt.Model.likelihood(
        R.RowSum(rt.Normal(mu, 1.0).log_density_at(col), n))
    return model, mu, col


def test_jitted_logp_sees_swapped_data():
    model, mu, col = _normal_template(4)
    cd = model.density()
    q = np.array([0.0])
    lp1 = float(cd.logp(q))          # caches the jitted program
    model.with_data({col: np.array([5.0, 5.0, 5.0, 5.0])})
    lp2 = float(cd.logp(q))
    # fresh model conditioned on the new data = ground truth
    fresh_model, _, _ = _normal_template(4)
    fresh_model.with_data({list(fresh_model.density().columns)[0]:
                           np.array([5.0, 5.0, 5.0, 5.0])})
    lp_truth = float(fresh_model.density().logp(q))
    assert lp1 != pytest.approx(lp2)
    assert lp2 == pytest.approx(lp_truth, rel=1e-6)
    _, g2 = cd.logp_and_grad(q)
    assert float(g2[0]) > 0  # gradient pulls mu toward the new data


def test_compile_outputs_sees_swapped_data():
    col = R.Column(np.array([1.0, 2.0, 3.0]))
    total = R.RowSum(col * 2.0, 3)
    fn = compile_outputs([], [total])
    assert float(fn(jnp.zeros(0))[0]) == pytest.approx(12.0)
    col.swap_values(np.array([10.0, 20.0, 30.0]))
    assert float(fn(jnp.zeros(0))[0]) == pytest.approx(120.0)


def test_swap_shape_mismatch_rejected():
    col = R.Column(np.zeros(4))
    with pytest.raises(ValueError):
        col.swap_values(np.zeros(5))
    mat = R.MatColumn(np.zeros((4, 2)))
    with pytest.raises(ValueError):
        mat.swap_values(np.zeros((4, 3)))


def test_matcolumn_swap_updates_views():
    mat = R.MatColumn(np.arange(8.0).reshape(4, 2))
    v0 = mat.column(0)
    mat.swap_values(np.ones((4, 2)))
    assert np.allclose(v0.values, 1.0)


def test_driver_program_cache_reused_across_swaps():
    """Sampling after a swap must not retrace — and the posterior must
    move to the new data."""
    model, mu, col = _normal_template(64)
    cfg = SamplerConfig(warmup_iterations=200, iterations=300,
                        sampler=HMC(5))
    rng = np.random.default_rng(0)
    model.with_data({col: rng.normal(-3.0, 1.0, 64)})
    tr1 = model.sample(cfg, n_chains=2, seed=0)
    cache = model.density()._driver_cache
    assert len(cache) == 1
    model.with_data({col: rng.normal(4.0, 1.0, 64)})
    tr2 = model.sample(cfg, n_chains=2, seed=1)
    assert len(cache) == 1  # same program, new data
    assert abs(tr1.mean(mu) + 3.0) < 0.5
    assert abs(tr2.mean(mu) - 4.0) < 0.5


def test_with_data_rejects_non_columns():
    model, mu, _ = _normal_template(4)
    with pytest.raises(TypeError):
        model.with_data({mu: np.zeros(4)})
