"""Triangular/Cholesky kernels (counterpart of compute/Cholesky.scala:9-99
and the primitive kernels in sampler/MassMatrix.scala:33-118).

The reference keeps two copies: a symbolic packed-lower-triangular Cholesky
over ``Vector[Real]`` (for future MVNormal) and primitive Array[Double]
versions for the dense mass matrix.  On TPU both collapse to one set of
jnp kernels: `jnp.linalg.cholesky` hits XLA's blocked triangular routines
(MXU-tiled), and packed<->square converters keep the packed layout available
where it saves memory.  A symbolic (Real-graph) MVNormal path instead uses
these same functions inside the lowered density, since Reals lower to jnp.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np


def packed_size(n: int) -> int:
    return n * (n + 1) // 2


def matrix_size(packed_len: int) -> int:
    n = int((np.sqrt(8 * packed_len + 1) - 1) / 2)
    assert packed_size(n) == packed_len, packed_len
    return n


def pack_lower(mat):
    """Square (n,n) -> packed row-major lower triangle (n*(n+1)/2,)."""
    n = mat.shape[-1]
    idx = jnp.tril_indices(n)
    return mat[..., idx[0], idx[1]]


def unpack_lower(packed, n: int):
    """Packed lower triangle -> square (n,n) with zeros above diagonal."""
    idx = jnp.tril_indices(n)
    out = jnp.zeros(packed.shape[:-1] + (n, n), dtype=packed.dtype)
    return out.at[..., idx[0], idx[1]].set(packed)


def cholesky_lower(mat):
    """Lower-triangular Cholesky factor of an SPD matrix."""
    return jnp.linalg.cholesky(mat)


def log_determinant(packed_l):
    """log|A| from packed lower Cholesky factor of A = L Lᵀ
    (Cholesky.logDeterminant, compute/Cholesky.scala)."""
    n = matrix_size(packed_l.shape[-1])
    diag_idx = jnp.asarray([packed_size(i + 1) - 1 for i in range(n)])
    return 2.0 * jnp.sum(jnp.log(packed_l[..., diag_idx]))


def inverse_multiply(packed_l, vec):
    """Solve A x = vec given packed lower Cholesky of A (forward+back
    substitution; Cholesky.inverseMultiply)."""
    n = vec.shape[-1]
    L = unpack_lower(packed_l, n)
    y = jsl.solve_triangular(L, vec, lower=True)
    return jsl.solve_triangular(L.T, y, lower=False)


def lower_triangular_solve(L, b):
    return jsl.solve_triangular(L, b, lower=True)


def upper_triangular_solve(U, b):
    """Back substitution (DenseMassMatrix.upperTriangularSolve,
    sampler/MassMatrix.scala:55-72)."""
    return jsl.solve_triangular(U, b, lower=False)
