"""Cholesky kernels (mirrors rainier-test/.../compute/CholeskyTest.scala)."""

import jax.numpy as jnp
import numpy as np

from rainier_tpu.compute import cholesky as C


def random_spd(rng, n):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def test_pack_unpack_roundtrip(rng):
    for n in [1, 2, 4, 7]:
        m = np.tril(rng.normal(size=(n, n)))
        packed = C.pack_lower(jnp.asarray(m))
        assert packed.shape == (C.packed_size(n),)
        back = C.unpack_lower(packed, n)
        np.testing.assert_allclose(np.asarray(back), m, rtol=1e-5)


def test_log_determinant(rng):
    for n in [2, 4, 6]:
        a = random_spd(rng, n)
        L = np.linalg.cholesky(a)
        packed = C.pack_lower(jnp.asarray(L))
        got = float(C.log_determinant(packed))
        want = np.linalg.slogdet(a)[1]
        np.testing.assert_allclose(got, want, rtol=5e-4)


def test_inverse_multiply(rng):
    for n in [2, 4, 6]:
        a = random_spd(rng, n)
        L = np.linalg.cholesky(a)
        x = rng.normal(size=n)
        got = C.inverse_multiply(C.pack_lower(jnp.asarray(L)),
                                 jnp.asarray(x))
        want = np.linalg.solve(a, x)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-4)


def test_triangular_solves(rng):
    n = 4
    a = random_spd(rng, n)
    L = np.linalg.cholesky(a)
    b = rng.normal(size=n)
    y = C.lower_triangular_solve(jnp.asarray(L), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(L @ np.asarray(y)), b, rtol=1e-3,
                               atol=1e-4)
    z = C.upper_triangular_solve(jnp.asarray(L.T), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(L.T @ np.asarray(z)), b,
                               rtol=1e-3, atol=1e-4)
