"""ATAN camera tests (SURVEY.md §4.1: project/unproject inverses and
Jacobians vs finite differences, per jni/ATANCamera.cc:133-231)."""

import jax
import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.config import CameraConfig
from visualslam_android_tpu.ops import camera as cam_ops


def _cam():
    c = CameraConfig()
    return cam_ops.make_camera(c.params(), 800, 480)


def test_project_unproject_round_trip(rng):
    cam = _cam()
    m = jnp.asarray(rng.uniform(-0.4, 0.4, size=(256, 2)), jnp.float32)
    px = cam_ops.project(cam, m)
    m_back = cam_ops.unproject(cam, px)
    np.testing.assert_allclose(np.asarray(m_back), np.asarray(m), atol=1e-4)


def test_unproject_project_round_trip(rng):
    cam = _cam()
    px = jnp.asarray(
        np.stack(
            [rng.uniform(10, 790, size=256), rng.uniform(10, 470, size=256)],
            axis=-1,
        ),
        jnp.float32,
    )
    m = cam_ops.unproject(cam, px)
    px_back = cam_ops.project(cam, m)
    np.testing.assert_allclose(np.asarray(px_back), np.asarray(px), atol=1e-2)


def test_center_projects_near_principal_point():
    cam = _cam()
    px = cam_ops.project(cam, jnp.zeros((2,), jnp.float32))
    np.testing.assert_allclose(np.asarray(px), np.asarray(cam.center), atol=1e-5)


def test_zero_distortion_is_pinhole(rng):
    c = CameraConfig(w=0.0)
    cam = cam_ops.make_camera(c.params(), 800, 480)
    m = jnp.asarray(rng.uniform(-0.5, 0.5, size=(64, 2)), jnp.float32)
    px = cam_ops.project(cam, m)
    expected = np.asarray(cam.center) + np.asarray(cam.focal) * np.asarray(m)
    np.testing.assert_allclose(np.asarray(px), expected, atol=1e-4)


def test_projection_derivs_match_finite_differences(rng):
    cam = _cam()
    m = jnp.asarray(rng.uniform(-0.3, 0.3, size=(32, 2)), jnp.float32)
    _, J = cam_ops.project_derivs(cam, m)
    eps = 1e-3
    for k in range(2):
        dm = jnp.zeros((2,), jnp.float32).at[k].set(eps)
        fd = (cam_ops.project(cam, m + dm) - cam_ops.project(cam, m - dm)) / (
            2 * eps
        )
        np.testing.assert_allclose(
            np.asarray(J[..., k]), np.asarray(fd), atol=5e-2, rtol=1e-2
        )


def test_in_image_border():
    cam = _cam()
    pts = jnp.array([[5.0, 5.0], [100.0, 100.0], [795.0, 300.0]], jnp.float32)
    inside = cam_ops.in_image(cam, pts, border=10.0)
    assert list(np.asarray(inside)) == [False, True, False]


def test_helpers_finite():
    cam = _cam()
    assert float(cam_ops.largest_radius_in_image(cam)) > 0.4
    opd = float(cam_ops.one_pixel_dist(cam))
    assert 1e-4 < opd < 1e-2
    M = np.asarray(cam_ops.gl_frustum(cam))
    assert np.all(np.isfinite(M)) and M[3, 2] == -1.0


def test_project_jits():
    cam = _cam()
    f = jax.jit(lambda m: cam_ops.project(cam, m))
    out = f(jnp.zeros((4, 2), jnp.float32))
    assert out.shape == (4, 2)
