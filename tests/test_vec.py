"""Vec semantics: columnized maps, dot products, gathers, model observe."""

import jax.numpy as jnp
import numpy as np

import rainier_tpu as rt
from rainier_tpu.compute import Evaluator, real as R
from rainier_tpu.compute.vec import Vec


def test_column_vec_map_sum():
    v = Vec.from_([1.0, 2.0, 3.0])
    doubled = v.map(lambda x: x * 2)
    assert float(Evaluator().value(doubled.sum())) == 12.0


def test_tuple_vec_dot_latent():
    xs = Vec.from_([(1.0, 0.0), (0.0, 1.0), (1.0, 1.0)])
    betas = rt.Normal(0, 1).latent_vec(2)
    mu = xs.map(lambda t: Vec.of(*t).dot(betas))
    m = rt.Model.observe([1.0, 2.0, 3.0],
                         mu.map(lambda x: rt.Normal(x, 1.0)))
    cd = m.density()
    assert cd.n_vars == 2
    # at betas=(1,2): mus = 1,2,3 → perfect fit
    want = 3 * (-0.5 * np.log(2 * np.pi))
    prior = 2 * (-0.5 * np.log(2 * np.pi)) - 0.5 * (1 + 4)
    got = float(cd.logp(jnp.asarray([1.0, 2.0])))
    assert abs(got - (want + prior)) < 1e-4


def test_latent_vec_indexing():
    thetas = rt.Normal(0.0, 1.0).latent_vec(4)
    t2 = thetas[2]
    m = rt.Model.track_({t2})
    cd = m.density()
    q = jnp.asarray([0.0, 0.0, 5.0, 0.0])
    # evaluate tracked expr via compile_outputs
    from rainier_tpu.compute import compile_outputs

    f = compile_outputs(cd.parameters, [t2])
    assert abs(float(f(q)[0]) - 5.0) < 1e-6


def test_gather_by_data_index():
    # GLMM pattern: per-row effect = alphas[site_i]
    alphas = rt.Normal(0.0, 1.0).latent_vec(3)
    sites = Vec.from_ints([0, 1, 2, 1, 0])
    per_row = alphas[sites.element]
    m = rt.Model.observe([0.0, 1.0, 2.0, 1.0, 0.0],
                         Vec(element=rt.Normal(per_row, 1.0), n=5))
    cd = m.density()
    q = jnp.asarray([0.0, 1.0, 2.0])
    want = 5 * (-0.5 * np.log(2 * np.pi)) \
        + 3 * (-0.5 * np.log(2 * np.pi)) - 0.5 * (0 + 1 + 4)
    got = float(cd.logp(q))
    assert abs(got - want) < 1e-4


def test_vec_zip():
    a = Vec.from_([1.0, 2.0])
    b = Vec.from_([3.0, 4.0])
    z = a.zip(b)
    s = z.map(lambda t: t[0] * t[1])
    assert float(Evaluator().value(s.sum())) == 11.0


def test_list_vec_ops():
    v = Vec.of(R.const(1.0), R.const(2.0), R.const(3.0))
    assert float(Evaluator().value(v.take(2).sum())) == 3.0
    assert float(Evaluator().value(v.drop(1).sum())) == 5.0
    assert float(Evaluator().value(v.reverse()[0])) == 3.0
    assert float(Evaluator().value(v.dot(v))) == 14.0
