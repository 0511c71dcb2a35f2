"""Weighted least-squares normal-equation solver.

Capability parity with the reference's fixed-size ``myWLS<N>``
(jni/myWLS.h:29-66): accumulate J^T w J and J^T w e with an optional diagonal
prior, then solve. TPU-native differences: the accumulation is a batched
einsum over all residuals at once (the reference adds rows one at a time,
myWLS.h:39-49), and the solve is a Cholesky factorization instead of a dense
inverse (myWLS.h:53-62 uses ``inverse()``).

Note: the reference call sites cast residuals to int before accumulation
(Tracker.cc:766-767, HomographyInit.cc:196-197 — a bug catalogued in
SURVEY.md §6); we deliberately keep full-precision residuals.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl


def solve_normal_equations(J, e, w=None, prior=0.0, ridge=1e-9):
    """Solve (J^T W J + prior*I) x = J^T W e over batched rows.

    J: [M, N] stacked Jacobian rows; e: [M] residuals; w: [M] weights
    (or None for unit weights); prior: scalar diagonal prior
    (myWLS::add_prior, myWLS.h:29-33).
    Returns (x[N], A[N,N]) where A is the (prior-augmented) information
    matrix, matching myWLS exposing its accumulator.
    """
    if w is None:
        w = jnp.ones(J.shape[:-1], J.dtype)
    Jw = J * w[..., None]
    A = jnp.einsum("...mi,...mj->...ij", Jw, J)
    b = jnp.einsum("...mi,...m->...i", Jw, e)
    n = J.shape[-1]
    A = A + (prior + ridge) * jnp.eye(n, dtype=J.dtype)
    L, low = jsl.cho_factor(A, lower=True)
    x = jsl.cho_solve((L, low), b)
    return x, A


def solve_spd(A, b, ridge=1e-9):
    """Cholesky solve of a symmetric positive-definite system, batched."""
    n = A.shape[-1]
    A = A + ridge * jnp.eye(n, dtype=A.dtype)
    L, low = jsl.cho_factor(A, lower=True)
    return jsl.cho_solve((L, low), b)


def inv3x3(A):
    """Closed-form (adjugate) inverse of batched 3x3 matrices.

    jnp.linalg.inv on a [N, 3, 3] batch lowers to a serial LU while-loop
    on TPU (~2x slower than this at N=2048, and off the vector units);
    the adjugate form is pure elementwise math. Callers guard
    singular/masked entries themselves.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    safe = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    inv = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return inv / safe[..., None, None]
