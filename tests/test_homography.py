"""Homography init + triangulation tests (SURVEY.md §4.2: synthetic planar
grid with known R, t, n — must pick the right Faugeras decomposition)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualslam_android_tpu.models import homography, triangulate
from visualslam_android_tpu.ops import lie


def _planar_matches(rng, R, t, n=(0.0, 0.0, 1.0), d=4.0, n_pts=120,
                    noise=0.0, n_outliers=0, focal=270.0):
    """Generate z=1-plane correspondences of points on plane
    n . X = d (world = first camera frame)."""
    n = np.asarray(n, np.float64)
    pts = []
    while len(pts) < n_pts:
        m = rng.uniform(-0.5, 0.5, size=2)
        ray = np.array([m[0], m[1], 1.0])
        s = d / (n @ ray)
        if s <= 0.1:
            continue
        pts.append(s * ray)
    X = np.stack(pts)  # [M, 3] in first camera
    first = X[:, :2] / X[:, 2:3]
    Xb = X @ np.asarray(R).T + np.asarray(t)
    second = Xb[:, :2] / Xb[:, 2:3]
    if noise > 0:
        second = second + rng.normal(scale=noise / focal, size=second.shape)
    if n_outliers > 0:
        idx = rng.choice(n_pts, n_outliers, replace=False)
        second[idx] += rng.uniform(-0.2, 0.2, size=(n_outliers, 2))
    jac = np.tile(np.eye(2, dtype=np.float32) * focal, (n_pts, 1, 1))
    return (
        jnp.asarray(first, jnp.float32),
        jnp.asarray(second, jnp.float32),
        jnp.asarray(jac, jnp.float32),
    )


def _pose_error(R_est, t_est, R_true, t_true):
    """Rotation angle error + translation direction angle (scale-free)."""
    dR = np.asarray(R_est) @ np.asarray(R_true).T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    te, tt = np.asarray(t_est), np.asarray(t_true)
    te = te / max(np.linalg.norm(te), 1e-12)
    tt = tt / max(np.linalg.norm(tt), 1e-12)
    tang = np.arccos(np.clip(abs(te @ tt), -1, 1))
    return ang, tang


@pytest.mark.parametrize("noise,outliers", [(0.0, 0), (0.3, 0), (0.3, 12)])
def test_recovers_known_motion(rng, noise, outliers):
    mu = jnp.asarray([0.25, 0.1, 0.05, 0.02, -0.24, 0.03], jnp.float32)
    R_true, t_true = lie.se3_exp(mu)
    first, second, jac = _planar_matches(
        rng, R_true, t_true, noise=noise, n_outliers=outliers
    )
    valid = jnp.ones(first.shape[0], bool)
    res = homography.compute(
        first, second, jac, valid, jax.random.PRNGKey(0)
    )
    assert bool(res.success)
    ang, tang = _pose_error(res.R, res.t, R_true, t_true)
    tol = 0.01 if noise == 0 else 0.06
    assert ang < tol, f"rotation error {ang}"
    assert tang < tol * 4, f"translation direction error {tang}"
    if outliers:
        inl = np.asarray(res.inliers)
        assert inl.sum() >= 90


def test_recovers_plane_normal(rng):
    mu = jnp.asarray([0.3, 0.0, 0.0, 0.0, -0.2, 0.0], jnp.float32)
    R_true, t_true = lie.se3_exp(mu)
    first, second, jac = _planar_matches(rng, R_true, t_true)
    res = homography.compute(
        first, second, jac, jnp.ones(first.shape[0], bool),
        jax.random.PRNGKey(1),
    )
    n_est = np.asarray(res.normal)
    n_est = n_est / np.linalg.norm(n_est)
    # Normal defined up to sign.
    assert min(
        np.linalg.norm(n_est - [0, 0, 1]), np.linalg.norm(n_est + [0, 0, 1])
    ) < 0.1


def test_masked_matches_ignored(rng):
    mu = jnp.asarray([0.25, 0.1, 0.0, 0.0, -0.2, 0.0], jnp.float32)
    R_true, t_true = lie.se3_exp(mu)
    first, second, jac = _planar_matches(rng, R_true, t_true, n_pts=100)
    # Append 40 pure-garbage padded matches, masked out.
    g = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (40, 2)), jnp.float32)
    first = jnp.concatenate([first, g])
    second = jnp.concatenate([second, -g])
    jac = jnp.concatenate([jac, jnp.tile(jnp.eye(2) * 270.0, (40, 1, 1))])
    valid = jnp.concatenate([jnp.ones(100, bool), jnp.zeros(40, bool)])
    res = homography.compute(first, second, jac, valid, jax.random.PRNGKey(2))
    assert bool(res.success)
    ang, _ = _pose_error(res.R, res.t, R_true, t_true)
    assert ang < 0.02
    assert not bool(jnp.any(res.inliers[100:]))


def test_triangulation_exact(rng):
    X = jnp.asarray(rng.uniform([-1, -1, 3], [1, 1, 6], (64, 3)), jnp.float32)
    Ra, ta = lie.se3_identity()
    mu = jnp.asarray([0.3, -0.1, 0.05, 0.02, -0.1, 0.01], jnp.float32)
    Rb, tb = lie.se3_exp(mu)
    Xa = X
    Xb = lie.se3_apply(Rb, tb, X)
    ma = Xa[:, :2] / Xa[:, 2:3]
    mb = Xb[:, :2] / Xb[:, 2:3]
    Ra_b = jnp.broadcast_to(Ra, (64, 3, 3))
    ta_b = jnp.broadcast_to(ta, (64, 3))
    Rb_b = jnp.broadcast_to(Rb, (64, 3, 3))
    tb_b = jnp.broadcast_to(tb, (64, 3))
    Xt = triangulate.triangulate(Ra_b, ta_b, Rb_b, tb_b, ma, mb)
    np.testing.assert_allclose(np.asarray(Xt), np.asarray(X), atol=2e-3)
    z = triangulate.depth_in_camera(Rb_b, tb_b, Xt)
    assert np.all(np.asarray(z) > 0)


def test_triangulation_noise_robust(rng):
    X = jnp.asarray(rng.uniform([-1, -1, 3], [1, 1, 6], (64, 3)), jnp.float32)
    mu = jnp.asarray([0.4, 0.0, 0.0, 0.0, -0.1, 0.0], jnp.float32)
    Rb, tb = lie.se3_exp(mu)
    Xb = lie.se3_apply(Rb, tb, X)
    ma = X[:, :2] / X[:, 2:3] + jnp.asarray(
        rng.normal(scale=0.5 / 270, size=(64, 2)), jnp.float32
    )
    mb = Xb[:, :2] / Xb[:, 2:3]
    Ra_b = jnp.broadcast_to(jnp.eye(3), (64, 3, 3))
    ta_b = jnp.zeros((64, 3))
    Rb_b = jnp.broadcast_to(Rb, (64, 3, 3))
    tb_b = jnp.broadcast_to(tb, (64, 3))
    Xt = triangulate.triangulate(Ra_b, ta_b, Rb_b, tb_b, ma, mb)
    err = np.linalg.norm(np.asarray(Xt) - np.asarray(X), axis=-1)
    assert np.median(err) < 0.15
