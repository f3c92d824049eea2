"""Multi-device sharding, pooled adaptation, and checkpoint tests — run on
the 8-device virtual CPU mesh (SURVEY.md §4: the piece the reference never
needed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import rainier_tpu as rt
from rainier_tpu.parallel import (load_checkpoint, make_mesh, resume_config,
                                  save_checkpoint, shard_columns)
from rainier_tpu.sampler import HMC, SamplerConfig

from conftest import require_cpu, require_devices  # noqa: E402


@pytest.fixture(scope="module")
def model():
    rng = np.random.default_rng(0)
    xs = [tuple(r) for r in rng.normal(size=(64, 3))]
    ys = [float(np.dot(x, [1.0, -2.0, 0.5]) + 0.3 * rng.normal())
          for x in xs]
    sigma = rt.Exponential(1).latent()
    betas = rt.Normal(0, 1).latent_vec(3)
    return rt.Model.observe(ys, rt.Vec.from_(xs).map(
        lambda t: rt.Normal(rt.Vec.of(*t).dot(betas), sigma)))


def test_mesh_construction():
    require_devices(2)
    mesh = make_mesh(n_chain_shards=4, n_data_shards=2)
    assert dict(mesh.shape) == {"chains": 4, "data": 2}
    with pytest.raises(ValueError):
        make_mesh(n_chain_shards=16, n_data_shards=2)


def test_sharded_sampling_matches_unsharded(model):
    require_devices(2)
    cfg = SamplerConfig(warmup_iterations=100, iterations=200,
                        sampler=HMC(5))
    mesh = make_mesh(n_chain_shards=4, n_data_shards=2)
    tr_sharded = model.sample(cfg, n_chains=8, seed=0, mesh=mesh)
    tr_local = model.sample(cfg, n_chains=8, seed=0)
    # HMC trajectories are chaotic: different reduction orders diverge
    # exponentially, so compare posterior statistics, not paths
    m1 = tr_sharded.flat().mean(axis=0)
    m2 = tr_local.flat().mean(axis=0)
    s1 = tr_sharded.flat().std(axis=0)
    s2 = tr_local.flat().std(axis=0)
    np.testing.assert_allclose(m1, m2, atol=4 * np.max(s1) / np.sqrt(100))
    np.testing.assert_allclose(s1, s2, rtol=0.5)


def test_data_sharding_preserves_density(model):
    require_devices(2)
    mesh = make_mesh(n_chain_shards=4, n_data_shards=2)
    cd = model.density()
    cols = cd.column_values()
    sharded = shard_columns(cols, mesh)
    lpg = cd.logp_and_grad_fn()
    q = jnp.ones((cd.n_vars,)) * 0.3
    lp1, g1 = jax.jit(lambda q: lpg(q, cols))(q)
    lp2, g2 = jax.jit(lambda q: lpg(q, sharded))(q)
    np.testing.assert_allclose(float(lp1), float(lp2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4)


def test_pooled_adaptation_on_mesh(model):
    require_devices(2)
    mesh = make_mesh(n_chain_shards=8, n_data_shards=1)
    cfg = SamplerConfig(warmup_iterations=150, iterations=100,
                        sampler=HMC(5), pooled_adaptation=True)
    tr = model.sample(cfg, n_chains=8, seed=0, mesh=mesh)
    d = np.asarray(tr.mass.diag)
    assert np.allclose(d, d[0], rtol=1e-4)


def test_checkpoint_roundtrip(tmp_path, model):
    cfg = SamplerConfig(warmup_iterations=100, iterations=100,
                        sampler=HMC(5))
    tr = model.sample(cfg, n_chains=2, seed=0)
    state = {"chains": tr.chains, "mass": tr.mass,
             "step_size": tr.step_size, "final": np.zeros(3)}
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, state)
    restored = load_checkpoint(p, state)
    np.testing.assert_array_equal(restored["chains"], tr.chains)
    np.testing.assert_array_equal(restored["step_size"], tr.step_size)


def test_resume_config_continues_sampling(model):
    cfg = SamplerConfig(warmup_iterations=200, iterations=100,
                        sampler=HMC(5))
    tr = model.sample(cfg, n_chains=2, seed=0)
    cfg2 = resume_config(tr, cfg)
    assert cfg2.warmup_iterations == 0
    tr2 = model.sample(cfg2, n_chains=2, seed=1)
    assert tr2.chains.shape == (2, 100, model.n_vars)
    assert np.all(np.isfinite(tr2.chains))
