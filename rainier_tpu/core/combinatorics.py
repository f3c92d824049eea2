"""Log-combinatoric functions (counterpart of core/Combinatorics.scala:9-35).

The reference approximates log-Γ with Nemes' series plus the Boost shift
trick because the JVM gives it no fast lgamma.  XLA has a native `lgamma`
lowering (vectorized on the VPU), so `gamma` here is exact to ulp instead
of approximate — one of the places the TPU build is *more* accurate than
the reference.
"""

from __future__ import annotations

from ..compute import real as R


def gamma(z) -> R.Real:
    """log Γ(z)."""
    z = R.to_real(z)
    if isinstance(z, R.Constant):
        if z.value == 0.0:
            return R.infinity
        if z.value in (1.0, 2.0):
            return R.zero
    return z.lgamma()


def beta(a, b) -> R.Real:
    """log B(a,b)."""
    a, b = R.to_real(a), R.to_real(b)
    return gamma(a) + gamma(b) - gamma(a + b)


def factorial(k) -> R.Real:
    """log k!"""
    return gamma(R.to_real(k) + 1)


def choose(n, k) -> R.Real:
    """log C(n,k)."""
    n, k = R.to_real(n), R.to_real(k)
    return factorial(n) - factorial(k) - factorial(n - k)
