"""L-BFGS with strong-Wolfe line search, as a pure JAX program.

Counterpart of optimizer/LBFGS.java (RISO port with More-Thuente line
search, 755 lines of mutable Java) + optimizer/Optimizer.scala's MAP loop.
Rebuilt functionally: bounded `lax.while_loop`s, two-loop recursion over a
fixed-size (m, n) history ring, strong-Wolfe bracketing + bisection zoom.
The whole optimization jit-compiles into one XLA program (and vmaps, e.g.
for multi-start MAP), unlike the reference's per-iteration JVM loop.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

C1 = 1e-4   # Armijo (ftol in LBFGS.java)
C2 = 0.9    # curvature (gtol)


class LBFGSState(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    s_hist: jax.Array    # (m, n)
    y_hist: jax.Array    # (m, n)
    rho: jax.Array       # (m,)
    k: jax.Array         # iteration
    converged: jax.Array
    failed: jax.Array


def _two_loop(state: LBFGSState):
    """Two-loop recursion over the ring history → descent direction."""
    m = state.s_hist.shape[0]
    q = state.g

    def bw(i, c):
        q, alphas = c
        idx = (state.k - 1 - i) % m
        valid = i < jnp.minimum(state.k, m)
        alpha = jnp.where(valid,
                          state.rho[idx] * jnp.dot(state.s_hist[idx], q),
                          0.0)
        q = q - alpha * state.y_hist[idx]
        return q, alphas.at[i].set(alpha)

    q, alphas = jax.lax.fori_loop(0, m, bw,
                                  (q, jnp.zeros((m,), state.g.dtype)))
    # initial Hessian scaling γ = sᵀy / yᵀy of most recent pair
    last = (state.k - 1) % m
    ys = jnp.dot(state.s_hist[last], state.y_hist[last])
    yy = jnp.dot(state.y_hist[last], state.y_hist[last])
    gamma = jnp.where((state.k > 0) & (yy > 0), ys / yy, 1.0)
    r = gamma * q

    def fw(j, r):
        i = m - 1 - j
        idx = (state.k - 1 - i) % m
        valid = i < jnp.minimum(state.k, m)
        beta = jnp.where(valid,
                         state.rho[idx] * jnp.dot(state.y_hist[idx], r),
                         0.0)
        return r + (alphas[i] - beta) * state.s_hist[idx]

    r = jax.lax.fori_loop(0, m, fw, r)
    return -r


def _wolfe_line_search(fg: Callable, x, f0, g0, direction,
                       max_steps: int = 25):
    """Strong-Wolfe search along `direction`: bracket by doubling, then
    bisection zoom.  Returns (alpha, f, g, ok)."""
    dg0 = jnp.dot(g0, direction)

    def phi(alpha):
        f, g = fg(x + alpha * direction)
        return f, g, jnp.dot(g, direction)

    # -- bracketing phase ------------------------------------------------
    def bcond(c):
        (i, alpha, lo, hi, f_lo, dg_lo, done, *_rest) = c
        return (i < max_steps) & ~done

    def bbody(c):
        (i, alpha, lo, hi, f_lo, dg_lo, done, best_a, best_f, best_g) = c
        f, g, dg = phi(alpha)
        armijo_fail = (f > f0 + C1 * alpha * dg0) | (
            jnp.isnan(f))
        curv_ok = jnp.abs(dg) <= -C2 * dg0
        success = ~armijo_fail & curv_ok
        # found bracket: [lo, alpha] if armijo fails or dg >= 0
        bracket = armijo_fail | (dg >= 0)
        new_hi = jnp.where(bracket & ~done, alpha, hi)
        new_lo = jnp.where(bracket | done, lo, alpha)
        new_flo = jnp.where(bracket | done, f_lo, f)
        new_dglo = jnp.where(bracket | done, dg_lo, dg)
        best_a = jnp.where(success & ~done, alpha, best_a)
        best_f = jnp.where(success & ~done, f, best_f)
        best_g = jnp.where(success & ~done, g, best_g)
        done2 = done | success | bracket
        alpha2 = jnp.where(done2, alpha, alpha * 2.0)
        return (i + 1, alpha2, new_lo, new_hi, new_flo, new_dglo, done2,
                best_a, best_f, best_g)

    z = jnp.zeros((), x.dtype)
    c0 = (jnp.zeros((), jnp.int32), jnp.ones((), x.dtype), z,
          jnp.full((), jnp.inf, x.dtype), f0, dg0, jnp.asarray(False),
          z, f0, g0)
    (i, alpha, lo, hi, f_lo, dg_lo, done, best_a, best_f, best_g) = \
        jax.lax.while_loop(bcond, bbody, c0)
    have_success = best_a > 0

    # -- zoom phase (bisection) ------------------------------------------
    def zcond(c):
        (j, lo, hi, f_lo, dg_lo, a, f, g, ok) = c
        return (j < max_steps) & ~ok & jnp.isfinite(hi)

    def zbody(c):
        (j, lo, hi, f_lo, dg_lo, a, f, g, ok) = c
        mid = 0.5 * (lo + hi)
        fm, gm, dgm = phi(mid)
        armijo_fail = (fm > f0 + C1 * mid * dg0) | (fm >= f_lo) | \
            jnp.isnan(fm)
        curv_ok = jnp.abs(dgm) <= -C2 * dg0
        success = ~armijo_fail & curv_ok
        hi2 = jnp.where(armijo_fail, mid, jnp.where(
            dgm * (hi - lo) >= 0, lo, hi))
        lo2 = jnp.where(armijo_fail, lo, mid)
        f_lo2 = jnp.where(armijo_fail, f_lo, fm)
        dg_lo2 = jnp.where(armijo_fail, dg_lo, dgm)
        a2 = jnp.where(success, mid, a)
        f2 = jnp.where(success, fm, f)
        g2 = jnp.where(success, gm, g)
        return (j + 1, lo2, hi2, f_lo2, dg_lo2, a2, f2, g2, ok | success)

    zc0 = (jnp.zeros((), jnp.int32), lo, hi, f_lo, dg_lo, best_a, best_f,
           best_g, have_success)
    (_, lo, hi, f_lo, dg_lo, a, f, g, ok) = jax.lax.while_loop(
        zcond, zbody, zc0)
    # fall back to the best Armijo point (lo) when zoom exhausted
    a_fb, f_fb, g_fb = lo, f_lo, g0
    a = jnp.where(ok, a, a_fb)
    f = jnp.where(ok, f, f_fb)
    use_ok = ok
    return a, f, jnp.where(use_ok, g, g_fb), (a > 0) & jnp.isfinite(f)


def minimize(fg: Callable, x0, m: int = 5, max_iters: int = 500,
             grad_tol: float = 1e-5):
    """Minimize f; fg(x) -> (f, grad).  Returns LBFGSState."""
    n = x0.shape[0]
    dtype = x0.dtype
    f0, g0 = fg(x0)
    st0 = LBFGSState(
        x=x0, f=f0, g=g0,
        s_hist=jnp.zeros((m, n), dtype), y_hist=jnp.zeros((m, n), dtype),
        rho=jnp.zeros((m,), dtype), k=jnp.zeros((), jnp.int32),
        converged=jnp.asarray(False), failed=jnp.asarray(False))

    def cond(st):
        return (st.k < max_iters) & ~st.converged & ~st.failed

    def body(st):
        direction = _two_loop(st)
        # safeguard: if not a descent direction, restart with -g
        dg = jnp.dot(st.g, direction)
        direction = jnp.where(dg < 0, direction, -st.g)
        alpha, f_new, g_new, ok = _wolfe_line_search(
            fg, st.x, st.f, st.g, direction)
        s = alpha * direction
        x_new = st.x + s
        y = g_new - st.g
        sy = jnp.dot(s, y)
        slot = st.k % m
        good_pair = sy > 1e-10
        s_hist = st.s_hist.at[slot].set(jnp.where(good_pair, s, 0.0))
        y_hist = st.y_hist.at[slot].set(jnp.where(good_pair, y, 0.0))
        rho = st.rho.at[slot].set(jnp.where(good_pair, 1.0 / sy, 0.0))
        gnorm = jnp.linalg.norm(g_new)
        converged = gnorm < grad_tol * jnp.maximum(
            1.0, jnp.linalg.norm(x_new))
        return LBFGSState(x=x_new, f=f_new, g=g_new, s_hist=s_hist,
                          y_hist=y_hist, rho=rho, k=st.k + 1,
                          converged=converged, failed=~ok)

    return jax.lax.while_loop(cond, body, st0)


def lbfgs_map(model, t=None, seed: int = 0, m: int = 5,
              max_iters: int = 500, grad_tol: float = 1e-5,
              n_starts: int = 1, init_scale: float = 1.0):
    """MAP estimate (Model.optimize, core/Model.scala:26-30): maximize the
    joint density with L-BFGS, then evaluate `t` at the optimum.

    `n_starts > 1` runs a vmapped multi-start: the first start is the
    origin (reproducing the single-start result on unimodal densities),
    the rest are overdispersed x0 ~ N(0, init_scale²·I) — the same
    initialization convention the sampler driver and SMC use — and the
    start with the best objective wins."""
    from .. import config as global_config
    from ..core.generator import Env, to_generator

    dtype = global_config.dtype()
    cd = model.density()
    cols = cd.column_values(dtype)
    lpg = cd.logp_and_grad_fn()

    def fg(x):
        lp, g = lpg(x, cols)
        return -lp, -g

    x0 = jnp.zeros((max(n_starts, 1), cd.n_vars), dtype)
    if n_starts > 1:
        rand = init_scale * jax.random.normal(
            jax.random.PRNGKey(seed), (n_starts - 1, cd.n_vars), dtype)
        x0 = x0.at[1:].set(rand)
    sts = global_config.jit(jax.vmap(
        lambda x: minimize(fg, x, m=m, max_iters=max_iters,
                           grad_tol=grad_tol)))(x0)
    best = jnp.argmin(sts.f)
    st = jax.tree.map(lambda a: a[best], sts)
    if t is None:
        return st.x
    gen = to_generator(t)
    base = cd.layout.env_for(st.x)
    for c, v in zip(cd.columns, cd.column_values()):
        base[c.id] = v
    return jax.tree.map(
        lambda v: __import__("numpy").asarray(v),
        gen.fn(jax.random.PRNGKey(seed), Env(base)))
