"""Golden tests for Lie-group ops (SURVEY.md §4.1: exp/ln round trips per
jni/RT.h:132-383 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from visualslam_android_tpu.ops import lie


def _random_w(rng, n, scale=1.0, max_norm=3.0):
    """Random rotation vectors with norm clamped below pi (log-map range)."""
    w = rng.normal(size=(n, 3)) * scale
    norms = np.linalg.norm(w, axis=-1, keepdims=True)
    w = np.where(norms > max_norm, w * (max_norm / norms), w)
    return jnp.asarray(w, jnp.float32)


def test_so3_exp_matches_scipy(rng):
    w = _random_w(rng, 64)
    R = lie.so3_exp(w)
    R_ref = Rotation.from_rotvec(np.asarray(w)).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)


def test_so3_exp_small_angle(rng):
    w = _random_w(rng, 32, scale=1e-6)
    R = lie.so3_exp(w)
    R_ref = Rotation.from_rotvec(np.asarray(w, np.float64)).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-6)


@pytest.mark.parametrize("scale", [1e-5, 0.1, 1.0, 2.5])
def test_so3_round_trip(rng, scale):
    w = _random_w(rng, 64, scale)
    w_back = lie.so3_ln(lie.so3_exp(w))
    np.testing.assert_allclose(np.asarray(w_back), np.asarray(w), atol=2e-4)


def test_so3_ln_near_pi(rng):
    axes = rng.normal(size=(32, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    w = jnp.asarray(axes * 3.10, jnp.float32)
    R = lie.so3_exp(w)
    w_back = lie.so3_ln(R)
    # Axis may flip sign only together with the angle; compare rotations.
    R2 = lie.so3_exp(w_back)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


@pytest.mark.parametrize("scale", [1e-6, 0.5, 2.0])
def test_se3_round_trip(rng, scale):
    rho = rng.normal(size=(64, 3)) * scale
    w = np.asarray(_random_w(rng, 64, scale))
    mu = jnp.asarray(np.concatenate([rho, w], axis=-1), jnp.float32)
    R, t = lie.se3_exp(mu)
    mu_back = lie.se3_ln(R, t)
    np.testing.assert_allclose(np.asarray(mu_back), np.asarray(mu), atol=3e-4)


def test_se3_exp_rotation_only():
    mu = jnp.array([[0.0, 0, 0, 0.3, -0.2, 0.1]], jnp.float32)
    R, t = lie.se3_exp(mu)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-7)
    R_ref = Rotation.from_rotvec([[0.3, -0.2, 0.1]]).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)


def test_se3_compose_inverse(rng):
    mu = jnp.asarray(rng.normal(size=(16, 6)) * 0.5, jnp.float32)
    R, t = lie.se3_exp(mu)
    Ri, ti = lie.se3_inverse(R, t)
    Rc, tc = lie.se3_mul(R, t, Ri, ti)
    np.testing.assert_allclose(
        np.asarray(Rc), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)


def test_se3_apply_matches_matrix(rng):
    mu = jnp.asarray(rng.normal(size=(8, 6)) * 0.5, jnp.float32)
    x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    R, t = lie.se3_exp(mu)
    y = lie.se3_apply(R, t, x)
    y_ref = np.einsum("bij,bj->bi", np.asarray(R), np.asarray(x)) + np.asarray(t)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


def test_se2_round_trip(rng):
    mu = jnp.asarray(rng.normal(size=(32, 3)) * 0.8, jnp.float32)
    R, t = lie.se2_exp(mu)
    mu_back = lie.se2_ln(R, t)
    np.testing.assert_allclose(np.asarray(mu_back), np.asarray(mu), atol=1e-4)


def test_so2_exp_ln(rng):
    theta = jnp.asarray(rng.uniform(-3.0, 3.0, size=(16,)), jnp.float32)
    R = lie.so2_exp(theta)
    np.testing.assert_allclose(np.asarray(lie.so2_ln(R)), np.asarray(theta), atol=1e-5)


def test_generator_field_matches_exp_derivative():
    # d/deps [exp(eps * e_i) * x]_{eps=0} == generator_field(x_h, i)
    x = jnp.array([0.7, -0.3, 2.0], jnp.float32)
    x_h = jnp.concatenate([x, jnp.ones(1, jnp.float32)])
    for i in range(6):
        def f(eps, i=i):
            mu = jnp.zeros(6, jnp.float32).at[i].set(eps)
            R, t = lie.se3_exp(mu)
            return lie.se3_apply(R, t, x)

        d = jax.jacfwd(f)(0.0)
        g = lie.se3_generator_field(x_h, i)[:3]
        np.testing.assert_allclose(np.asarray(d), np.asarray(g), atol=1e-5)


def test_jit_and_grad():
    mu = jnp.ones((6,), jnp.float32) * 0.1

    @jax.jit
    def loss(mu):
        R, t = lie.se3_exp(mu)
        return jnp.sum(lie.se3_ln(R, t) ** 2)

    g = jax.grad(loss)(mu)
    assert np.all(np.isfinite(np.asarray(g)))
