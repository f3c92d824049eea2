"""Mass matrices + Welford estimators + windowed adaptation schedule.

Counterpart of sampler/MassMatrix.scala and sampler/MassMatrixEstimator.scala,
re-shaped for functional scanning:

* A mass matrix is a pytree (`MassState`) whose *kind* is static per
  compiled program ('identity' | 'diag' | 'dense'), so `velocity` /
  `sample_momentum` lower to branch-free code: elementwise multiply for
  diag, an MXU matmul / triangular solve for dense.
* Welford estimation (VarianceEstimator/CovarianceEstimator semantics,
  including the reference's /n vs /(n−1) normalization split) is a carried
  pytree updated inside the warmup scan.
* The expanding-window schedule (WindowedMassMatrixTuner.update,
  sampler/MassMatrix.scala:120-163: initial 50, ×1.5 growth, skipFirst/
  skipLast 50) is *data-independent*, so it is precomputed in Python as
  boolean per-iteration masks — no data-dependent control flow inside the
  compiled scan, and every chain shares the schedule (uniform branch).

Semantics note (matches reference): `diag` stores the posterior *variance*
estimate Σ̂ (mass matrix M = Σ̂⁻¹); momenta are drawn p ~ N(0, M) and
velocity(p) = Σ̂ p (LeapFrog.scala:202-251).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np


class MassState(NamedTuple):
    """diag: Σ̂ diagonal (n,) or None; dense: Σ̂ (n,n) + its lower Cholesky
    or None.  Identity mass carries neither."""

    diag: Optional[jax.Array] = None
    cov: Optional[jax.Array] = None
    chol: Optional[jax.Array] = None


def identity_mass() -> MassState:
    return MassState()


def diag_mass(variance) -> MassState:
    return MassState(diag=jnp.asarray(variance))


def dense_mass(cov) -> MassState:
    cov = jnp.asarray(cov)
    return MassState(cov=cov, chol=jnp.linalg.cholesky(cov))


def velocity(mass: MassState, p):
    """dq/dt = M⁻¹p = Σ̂ p (LeapFrog.velocity)."""
    if mass.diag is not None:
        return p * mass.diag
    if mass.cov is not None:
        return mass.cov @ p
    return p


def kinetic(mass: MassState, p):
    return 0.5 * jnp.dot(p, velocity(mass, p))


def sample_momentum(mass: MassState, key, n: int, dtype):
    """p ~ N(0, M) = N(0, Σ̂⁻¹) (LeapFrog.initializePs)."""
    z = jax.random.normal(key, (n,), dtype=dtype)
    if mass.diag is not None:
        return z / jnp.sqrt(mass.diag)
    if mass.chol is not None:
        # p = L⁻ᵀ z ⇒ cov(p) = (LLᵀ)⁻¹ = Σ̂⁻¹
        return jsl.solve_triangular(mass.chol.T, z, lower=False)
    return z


# ---------------------------------------------------------------------------
# Welford estimators (sampler/MassMatrixEstimator.scala)
# ---------------------------------------------------------------------------


class WelfordState(NamedTuple):
    count: jax.Array          # scalar
    mean: jax.Array           # (n,)
    raw: jax.Array            # (n,) sum of oldDiff*newDiff
    cov_raw: Optional[jax.Array] = None  # (n,n) for dense


def welford_init(n: int, dtype, dense: bool = False) -> WelfordState:
    return WelfordState(
        count=jnp.zeros((), dtype=dtype),
        mean=jnp.zeros((n,), dtype=dtype),
        raw=jnp.zeros((n,), dtype=dtype),
        cov_raw=jnp.zeros((n, n), dtype=dtype) if dense else None)


def welford_update(w: WelfordState, x) -> WelfordState:
    count = w.count + 1
    old_diff = x - w.mean
    mean = w.mean + old_diff / count
    new_diff = x - mean
    raw = w.raw + old_diff * new_diff
    cov_raw = w.cov_raw
    if cov_raw is not None:
        # CovarianceEstimator.update accumulates newDiff ⊗ oldDiff
        cov_raw = cov_raw + jnp.outer(new_diff, old_diff)
    return WelfordState(count, mean, raw, cov_raw)


def welford_variance(w: WelfordState):
    """VarianceEstimator.variance divides by n (not n−1)."""
    return w.raw / jnp.maximum(w.count, 1)


def welford_covariance(w: WelfordState):
    """CovarianceEstimator.covariance divides by n−1."""
    return w.cov_raw / jnp.maximum(w.count - 1, 1)


def mass_from_welford(w: WelfordState, kind: str,
                      ridge: float = 1e-6) -> MassState:
    if kind == "diag":
        v = welford_variance(w)
        # the reference requires nonzero elements (DiagonalMassMatrix);
        # we floor at `ridge` for the same effect functionally
        return diag_mass(jnp.maximum(v, ridge))
    if kind == "dense":
        cov = welford_covariance(w)
        # Stan-style shrinkage toward a small identity:
        #   Σ_reg = n/(n+5)·Σ̂ + 1e-3·5/(n+5)·I
        # The reference uses the raw sample covariance
        # (CovarianceEstimator.covariance) — safe in f64 on the JVM, but
        # in f32 an early, short adaptation window can produce a
        # near-singular Σ̂ whose Cholesky has ~0 diagonal, making the
        # momentum draw L⁻ᵀz astronomically large and overflowing the
        # kinetic energy.  Shrinkage bounds the condition number; as the
        # window grows the estimate converges to the sample covariance.
        n = jnp.maximum(w.count, 1.0)
        shrink = n / (n + 5.0)
        eye = jnp.eye(cov.shape[0], dtype=cov.dtype)
        cov = shrink * cov + (1e-3 * (1.0 - shrink) + ridge) * eye
        return dense_mass(cov)
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# Windowed schedule (precomputed masks)
# ---------------------------------------------------------------------------


def window_masks(iterations: int, initial_window: int, expansion: float,
                 skip_first: int, skip_last: int):
    """Per-iteration (update, close) booleans replicating
    WindowedMassMatrixTuner.update's counter logic
    (sampler/MassMatrix.scala:139-163)."""
    update = np.zeros(iterations, dtype=bool)
    close = np.zeros(iterations, dtype=bool)
    window = initial_window
    i = 0
    for it in range(iterations):
        j = it + 1
        if j < skip_first or (iterations - j) < skip_last:
            continue
        update[it] = True
        i += 1
        if i == window:
            i = 0
            window = int(window * expansion)
            close[it] = True
    return jnp.asarray(update), jnp.asarray(close)
