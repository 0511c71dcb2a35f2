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
