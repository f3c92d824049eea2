"""Four-way consistency oracle for the expression layer.

Mirrors rainier-test/.../compute/RealTest.scala:7-55: for each expression
family, at a spread of input points, assert agreement between
(a) construction-time constant folding,
(b) the interpreted NumPy oracle (Evaluator),
(c) the XLA-compiled path, and
(d) a plain-python reference function when given;
then check the XLA gradient against central finite differences computed
with the float64 oracle (reference uses 1e-5 step, 1e-3 relative
tolerance — same here, RealTest.scala:39-52).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import rainier_tpu as rt
from rainier_tpu.compute import Evaluator, compiler, real as R

POINTS = [0.0, 1.0, -1.0, 2.0, -2.0, 0.5, -0.5, 3.3]


def _assert_close(a, b, tol=1e-3, msg=""):
    if math.isnan(a) and math.isnan(b):
        return
    if math.isinf(a) or math.isinf(b):
        assert a == b or (math.isnan(a) or math.isnan(b)), (a, b, msg)
        return
    err = abs(a - b)
    if abs(b) > 1e-8:
        err /= abs(b)
    assert err < tol, f"{msg}: {a} vs {b}"


def check_expr(fn, ref_fn=None, points=POINTS, grad_points=None):
    """fn: Real -> Real.  Checks folding == oracle == XLA (== ref_fn), and
    d(fn)/dx matches finite differences."""
    x = R.parameter(lambda p: R.zero)
    expr = fn(x)
    cd = compiler.CompiledDensity([expr])
    grad_points = POINTS if grad_points is None else grad_points
    for v in points:
        oracle = float(Evaluator({x: v}).value(expr))
        folded_expr = fn(R.const(v))
        assert isinstance(folded_expr, R.Constant), "folding failed"
        _assert_close(folded_expr.value, oracle, msg=f"fold@{v}")
        compiled = float(cd.logp(jnp.asarray([v])))
        _assert_close(compiled, oracle, msg=f"xla@{v}")
        if ref_fn is not None:
            _assert_close(oracle, ref_fn(v), msg=f"ref@{v}")
    eps = 1e-5
    for v in grad_points:
        up = float(Evaluator({x: v + eps}).value(expr))
        dn = float(Evaluator({x: v - eps}).value(expr))
        if not (math.isfinite(up) and math.isfinite(dn)):
            continue
        fd = (up - dn) / (2 * eps)
        _, g = cd.logp_and_grad(jnp.asarray([v]))
        _assert_close(float(g[0]), fd, tol=2e-3, msg=f"grad@{v}")


def test_polynomial():
    check_expr(lambda x: x * x * 2 + x * 3 + 1,
               lambda v: 2 * v * v + 3 * v + 1)


def test_exp_log():
    check_expr(lambda x: (x.exp() + 1).log(),
               lambda v: math.log(math.exp(v) + 1))


def test_log_guarded():
    check_expr(lambda x: (x * x + 0.5).log(),
               lambda v: math.log(v * v + 0.5))


def test_division():
    check_expr(lambda x: (x + 10) / (x * x + 1.0),
               lambda v: (v + 10) / (v * v + 1))


def test_pow():
    check_expr(lambda x: (x * x + 1).pow(1.5),
               lambda v: (v * v + 1) ** 1.5)


def test_pow_by_real_exponent():
    check_expr(lambda x: R.const(2.5) ** (x * x),
               lambda v: 2.5 ** (v * v))


def test_trig():
    check_expr(lambda x: x.sin() + x.cos() * 2 + (x * 0.3).tan(),
               lambda v: math.sin(v) + 2 * math.cos(v) + math.tan(0.3 * v))


def test_inverse_trig():
    pts = [0.0, 0.5, -0.5, 0.9, -0.9]
    check_expr(lambda x: x.asin() + x.acos() + x.atan(),
               lambda v: math.asin(v) + math.acos(v) + math.atan(v),
               points=pts, grad_points=pts)


def test_hyperbolic():
    check_expr(lambda x: x.sinh() + x.cosh() + x.tanh(),
               lambda v: math.sinh(v) + math.cosh(v) + math.tanh(v))


def test_abs_kinks():
    # derivative excluded at the kink (reference marks abs underivable at 0)
    pts = [p for p in POINTS if p != 0.0]
    check_expr(lambda x: (x * x - 1).abs(),
               lambda v: abs(v * v - 1),
               grad_points=[p for p in pts if abs(p) != 1.0])


def test_min_max():
    check_expr(lambda x: x.min(0.5) + x.max(-0.5),
               lambda v: min(v, 0.5) + max(v, -0.5),
               grad_points=[0.0, 1.0, -1.0, 2.0, -2.0])


def test_logistic_logit():
    check_expr(lambda x: x.logistic(),
               lambda v: 1 / (1 + math.exp(-v)))
    pts = [0.1, 0.5, 0.9]
    check_expr(lambda x: x.logistic().logit(), points=pts, grad_points=pts)


def test_lgamma():
    from scipy.special import gammaln
    pts = [0.5, 1.0, 2.0, 3.3, 7.7]
    check_expr(lambda x: (x * x + 0.5).lgamma(),
               lambda v: float(gammaln(v * v + 0.5)), points=pts,
               grad_points=pts)


def test_softplus_log1p_expm1():
    check_expr(lambda x: x.softplus() + (x * x).log1p() + (x * 0.3).expm1(),
               lambda v: (math.log1p(math.exp(v)) + math.log1p(v * v)
                          + math.expm1(0.3 * v)))


def test_branching():
    # Real.gt branch expression (RealTest covers branching via Real.gt)
    check_expr(lambda x: R.gt(x, R.zero, x * 2, x * x),
               lambda v: 2 * v if v > 0 else v * v,
               grad_points=[1.0, -1.0, 2.0, -2.0, 0.5, -0.5])


def test_compare():
    check_expr(lambda x: R.compare(x, R.one),
               lambda v: float(np.sign(v - 1)), grad_points=[])


def test_lookup():
    table = [R.const(1.0), R.const(7.0), R.const(3.0)]
    # index at integer points only
    x = R.parameter(lambda p: R.zero)
    expr = R.lookup(x, table)
    for v in [0.0, 1.0, 2.0]:
        oracle = float(Evaluator({x: v}).value(expr))
        want = [1.0, 7.0, 3.0][int(v)]
        assert oracle == want
    cd = compiler.CompiledDensity([expr])
    for v in [0.0, 1.0, 2.0]:
        assert float(cd.logp(jnp.asarray([v]))) == [1.0, 7.0, 3.0][int(v)]


def test_sum_long():
    # pathological 81-term sums (RealTest.scala:183-189)
    check_expr(lambda x: R.sum_([x ** float(i % 4) * (0.1 * (i % 7))
                                 for i in range(81)]),
               points=[0.5, 1.0, -0.5, 2.0], grad_points=[0.5, 1.0, -0.5])


def test_cancellation():
    # (x + 1e10) - 1e10 style cancellation (RealTest.scala:191-194)
    check_expr(lambda x: (x + 100.0) - 100.0, lambda v: v,
               points=[0.5, 1.0, -0.5])


def test_log_sum_exp():
    check_expr(lambda x: R.log_sum_exp([x, x * 2, R.const(1.0)]),
               lambda v: float(np.logaddexp(np.logaddexp(v, 2 * v), 1.0)))


def test_normal_density_expr():
    check_expr(lambda x: rt.Normal(0.5, 2.0).log_density_at(x))


def test_gamma_density_expr():
    pts = [0.5, 1.0, 2.0, 3.3]
    check_expr(lambda x: rt.Gamma(2.0, 1.5).log_density_at(x), points=pts,
               grad_points=pts)


def test_poisson_density_expr():
    pts = [0.0, 1.0, 2.0, 5.0]
    check_expr(lambda x: rt.Poisson(2.5).log_density_at(x), points=pts,
               grad_points=[])


def test_nan_constant_raises():
    with pytest.raises(ArithmeticError):
        R.const(float("nan"))
    with pytest.raises(ArithmeticError):
        _ = R.const(float("inf")) - R.const(float("inf"))


def test_constant_folding_identities():
    x = R.parameter()
    assert (x + 0) is x
    assert (x * 1) is x
    assert isinstance(x * 0, R.Constant) and (x * 0).value == 0.0
    assert (x ** 1) is x
    assert x.exp().log() is x
    assert x.log().exp() is x


def test_deep_graph_no_recursion_limit():
    x = R.parameter(lambda p: R.zero)
    expr = x
    for i in range(5000):
        expr = expr + 1.0
    cd = compiler.CompiledDensity([expr])
    assert abs(float(cd.logp(jnp.asarray([1.0]))) - 5001.0) < 1e-2
