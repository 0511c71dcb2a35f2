"""Overlay rendering tests (the reference's debug overlays:
jni/Tracker.cc:148-216,322-336,580-588; colors jni/KeyFrame.cc:116-130)."""

import jax
import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.config import CameraConfig
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.utils import overlay


def _blank(h=60, w=80):
    return jnp.full((h, w, 3), 0.5, jnp.float32)


def test_draw_dots_paints_and_masks():
    img = _blank()
    xy = jnp.asarray([[10.0, 20.0], [40.0, 30.0]])
    mask = jnp.asarray([True, False])
    colors = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = np.asarray(overlay.draw_dots(img, xy, colors, mask, radius=1))
    np.testing.assert_allclose(out[20, 10], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[21, 11], [1, 0, 0], atol=1e-6)  # radius
    np.testing.assert_allclose(out[30, 40], [0.5, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[0, 0], [0.5, 0.5, 0.5], atol=1e-6)


def test_draw_dots_out_of_bounds_safe():
    img = _blank()
    xy = jnp.asarray([[-5.0, 2.0], [79.0, 59.0], [1000.0, 1000.0]])
    mask = jnp.ones(3, bool)
    colors = jnp.ones((3, 3))
    out = np.asarray(overlay.draw_dots(img, xy, colors, mask, radius=2))
    assert out.shape == (60, 80, 3)
    np.testing.assert_allclose(out[59, 79], [1, 1, 1], atol=1e-6)


def test_found_points_level_colors():
    img = _blank()
    pos = jnp.asarray([[10.0, 10.0], [30.0, 10.0], [50.0, 10.0],
                       [70.0, 10.0]])
    level = jnp.asarray([0, 1, 2, 3])
    out = np.asarray(
        overlay.draw_found_points(img, pos, level, jnp.ones(4, bool))
    )
    np.testing.assert_allclose(out[10, 10], overlay.LEVEL_COLORS[0],
                               atol=1e-6)
    np.testing.assert_allclose(out[10, 30], overlay.LEVEL_COLORS[1],
                               atol=1e-6)
    np.testing.assert_allclose(out[10, 50], overlay.LEVEL_COLORS[2],
                               atol=1e-6)
    np.testing.assert_allclose(out[10, 70], overlay.LEVEL_COLORS[3],
                               atol=1e-6)


def test_trails_draw_line_between_endpoints():
    img = _blank()
    p0 = jnp.asarray([[10.0, 10.0]])
    p1 = jnp.asarray([[50.0, 50.0]])
    out = np.asarray(overlay.draw_trails(img, p0, p1, jnp.ones(1, bool)))
    # Midpoint of the segment is green; endpoint is a red dot.
    np.testing.assert_allclose(out[30, 30], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[50, 50], [1, 0, 0], atol=1e-6)


def test_render_grid_projects_plane():
    cam = cam_ops.make_camera(CameraConfig().params(), 80, 60)
    # Camera 2 m above the plane looking straight down: R flips z.
    R = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]]
    )
    t = jnp.asarray([0.0, 0.0, 2.0])
    out = np.asarray(overlay.render_grid(_blank(), cam, R, t))
    black = (out < 0.05).all(axis=-1)
    assert black.sum() > 100, black.sum()
    # The grid center projects near the principal point.
    cy, cx = int(0.470265 * 60), int(0.505171 * 80)
    assert black[cy - 2:cy + 3, cx - 2:cx + 3].any()


def test_overlays_jittable():
    f = jax.jit(overlay.draw_found_points)
    out = f(_blank(), jnp.asarray([[5.0, 5.0]]), jnp.asarray([2]),
            jnp.ones(1, bool))
    assert out.shape == (60, 80, 3)


def test_grayscale_and_255_inputs():
    img8 = jnp.full((60, 80), 128.0)
    out = np.asarray(
        overlay.draw_fast_corners(img8, jnp.asarray([[4.0, 4.0]]),
                                  jnp.ones(1, bool))
    )
    assert out.shape == (60, 80, 3)
    np.testing.assert_allclose(out[0, 0], [128 / 255.0] * 3, atol=1e-6)
    np.testing.assert_allclose(out[4, 4], [1, 0, 1], atol=1e-6)
