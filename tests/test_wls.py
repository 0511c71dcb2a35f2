"""WLS solver tests (jni/myWLS.h semantics, solved by Cholesky)."""

import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.ops import wls


def test_solves_overdetermined_system(rng):
    J = rng.normal(size=(100, 6)).astype(np.float32)
    x_true = rng.normal(size=6).astype(np.float32)
    e = J @ x_true
    x, A = wls.solve_normal_equations(jnp.asarray(J), jnp.asarray(e))
    np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-3)
    assert A.shape == (6, 6)


def test_weights_downweight_outliers(rng):
    J = rng.normal(size=(100, 3)).astype(np.float32)
    x_true = np.array([1.0, -2.0, 0.5], np.float32)
    e = J @ x_true
    e[:5] += 100.0  # gross outliers
    w = np.ones(100, np.float32)
    w[:5] = 0.0
    x, _ = wls.solve_normal_equations(
        jnp.asarray(J), jnp.asarray(e), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-3)


def test_prior_pulls_to_zero(rng):
    J = rng.normal(size=(50, 4)).astype(np.float32)
    e = rng.normal(size=50).astype(np.float32)
    x0, _ = wls.solve_normal_equations(jnp.asarray(J), jnp.asarray(e), prior=0.0)
    x1, _ = wls.solve_normal_equations(jnp.asarray(J), jnp.asarray(e), prior=1e6)
    assert np.linalg.norm(np.asarray(x1)) < 1e-3 * max(
        np.linalg.norm(np.asarray(x0)), 1e-6
    ) + 1e-6


def test_solve_spd(rng):
    M = rng.normal(size=(8, 8)).astype(np.float32)
    A = M @ M.T + 8 * np.eye(8, dtype=np.float32)
    x_true = rng.normal(size=8).astype(np.float32)
    b = A @ x_true
    x = wls.solve_spd(jnp.asarray(A), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-3)
