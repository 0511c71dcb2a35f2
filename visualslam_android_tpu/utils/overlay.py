"""Debug/AR overlay rendering: FAST corners, init trails, per-level tracked
points, and the reference ground grid.

Capability parity with the reference's visual overlays:

- per-level point colors (gavLevelColors: red/yellow/green/blue,
  jni/KeyFrame.cc:116-130);
- FAST corner dots (Tracker::drawFast, jni/Tracker.cc:148-155);
- trail lines during map init, green->red segments with the matched end
  highlighted (jni/Tracker.cc:322-336);
- found-point dots colored by search level after TrackMap
  (jni/Tracker.cc:580-588);
- the projected 17x17 ground-plane grid, 0.1 m cells, black 2 px lines
  (Tracker::RenderGrid, jni/Tracker.cc:178-216).

TPU-native design: no per-primitive host loop — every overlay is a single
fixed-shape vectorized rasterization. Dots are one scatter over an [M, d, d]
stamp neighborhood; line segments are drawn by sampling S points along ALL
segments at once and scattering the resulting [M, S] pixel cloud. Everything
is jittable and can run on-device next to the tracker, or on CPU for host
display.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import lie

# gavLevelColors (jni/KeyFrame.cc:122-127), one RGB row per pyramid level.
LEVEL_COLORS = np.asarray(
    [
        [1.0, 0.0, 0.0],   # level 0: red
        [1.0, 1.0, 0.0],   # level 1: yellow
        [0.0, 1.0, 0.0],   # level 2: green
        [0.0, 0.0, 0.7],   # level 3: blue
    ],
    np.float32,
)


def _ensure_rgb(img):
    img = jnp.asarray(img, jnp.float32)
    if img.ndim == 2:
        img = jnp.repeat(img[..., None], 3, axis=-1)
    # Accept [0, 255] or [0, 1] inputs (traced-value-safe).
    scale = jnp.where(jnp.max(img) > 1.5, 1.0 / 255.0, 1.0)
    return img * scale


def draw_dots(img_rgb, xy, colors, mask, radius: int = 2):
    """Scatter filled (2r+1)^2 square dots at xy [M, 2] (x, y order) with
    per-dot colors [M, 3]; mask [M] disables dots. One vectorized
    scatter — no per-point loop."""
    img = jnp.asarray(img_rgb, jnp.float32)
    H, W = img.shape[:2]
    xy = jnp.asarray(xy, jnp.float32)
    colors = jnp.broadcast_to(jnp.asarray(colors, jnp.float32),
                              (xy.shape[0], 3))
    d = 2 * radius + 1
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(-radius, radius + 1),
                     jnp.arange(-radius, radius + 1), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)                                     # [d*d, (dy, dx)]
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)[:, None] + offs[None, :, 0]
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)[:, None] + offs[None, :, 1]
    ok = (
        jnp.asarray(mask, bool)[:, None]
        & (cy >= 0) & (cy < H) & (cx >= 0) & (cx < W)
    )
    # Route masked pixels to a sacrificial row then slice it off.
    cy = jnp.where(ok, cy, H)
    cx = jnp.where(ok, cx, 0)
    canvas = jnp.zeros((H + 1, W, 3), img.dtype)
    hit = jnp.zeros((H + 1, W), img.dtype)
    col = jnp.broadcast_to(colors[:, None, :], (xy.shape[0], d * d, 3))
    canvas = canvas.at[cy.reshape(-1), cx.reshape(-1)].add(
        col.reshape(-1, 3)
    )
    hit = hit.at[cy.reshape(-1), cx.reshape(-1)].add(
        ok.astype(img.dtype).reshape(-1)
    )
    canvas, hit = canvas[:H], hit[:H]
    painted = hit > 0
    color_out = canvas / jnp.maximum(hit, 1.0)[..., None]
    return jnp.where(painted[..., None], color_out, img)


def draw_segments(img_rgb, p0, p1, colors, mask, samples: int = 64,
                  thickness: int = 1):
    """Draw M line segments p0->p1 ([M, 2] each, x/y) by sampling
    `samples` points along every segment at once and scattering the
    [M, samples] pixel cloud (with a (2t-1)-wide stamp)."""
    img = jnp.asarray(img_rgb, jnp.float32)
    p0 = jnp.asarray(p0, jnp.float32)
    p1 = jnp.asarray(p1, jnp.float32)
    ts = jnp.linspace(0.0, 1.0, samples)
    pts = p0[:, None, :] + ts[None, :, None] * (p1 - p0)[:, None, :]
    M = p0.shape[0]
    m = jnp.broadcast_to(jnp.asarray(mask, bool)[:, None], (M, samples))
    return draw_dots(
        img, pts.reshape(-1, 2),
        jnp.broadcast_to(jnp.asarray(colors, jnp.float32)[:, None, :],
                         (M, samples, 3)).reshape(-1, 3),
        m.reshape(-1), radius=thickness - 1,
    )


def draw_fast_corners(img_rgb, corners_xy, mask, color=(1.0, 0.0, 1.0)):
    """Tracker::drawFast (jni/Tracker.cc:148-155): mark level-0 FAST
    corners. corners_xy [M, 2] (x, y), mask [M]."""
    img = _ensure_rgb(img_rgb)
    col = jnp.broadcast_to(jnp.asarray(color, jnp.float32),
                           (corners_xy.shape[0], 3))
    return draw_dots(img, corners_xy, col, mask, radius=1)


def draw_corner_mask(img_rgb, corner_mask, color=(1.0, 0.0, 1.0)):
    """Same overlay from the tracker's dense [H, W] corner mask."""
    img = _ensure_rgb(img_rgb)
    cm = jnp.asarray(corner_mask, bool)
    col = jnp.asarray(color, jnp.float32)
    return jnp.where(cm[..., None], col, img)


def draw_trails(img_rgb, from_xy, to_xy, mask):
    """Init-phase trail overlay (jni/Tracker.cc:322-336): green segment
    from the trail origin to the current match, red dot at the match."""
    img = _ensure_rgb(img_rgb)
    M = from_xy.shape[0]
    green = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                             (M, 3))
    red = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                           (M, 3))
    img = draw_segments(img, from_xy, to_xy, green, mask)
    return draw_dots(img, to_xy, red, mask, radius=1)


def draw_found_points(img_rgb, pos_xy, level, mask):
    """Per-level colored dots for points found by TrackMap
    (jni/Tracker.cc:580-588, colors jni/KeyFrame.cc:116-130)."""
    img = _ensure_rgb(img_rgb)
    colors = jnp.asarray(LEVEL_COLORS)[jnp.clip(level, 0, 3)]
    return draw_dots(img, pos_xy, colors, mask, radius=2)


def draw_map_points_colored(img_rgb, pos_xy, color_gray, mask,
                            radius: int = 2):
    """Dots colored by each point's OWN sampled source intensity
    (PointStore.color_gray — the per-point color capability of
    jni/KeyFrame.cc:82-93 / jni/MapMaker.cc:661-663, sampled correctly
    at creation instead of copied uninitialized). Grayscale pipeline:
    the stored intensity renders as a gray level."""
    img = _ensure_rgb(img_rgb)
    g = jnp.clip(color_gray / 255.0, 0.0, 1.0)
    colors = jnp.stack([g, g, g], axis=-1)
    return draw_dots(img, pos_xy, colors, mask, radius=radius)


def render_grid(img_rgb, cam: cam_ops.Camera, R, t, half_cells: int = 8,
                cell: float = 0.1):
    """Tracker::RenderGrid (jni/Tracker.cc:178-216): project the z=0
    world plane's (2*half_cells+1)^2 lattice through the current pose and
    rasterize both line families in black."""
    img = _ensure_rgb(img_rgb)
    n = 2 * half_cells + 1
    ij = jnp.arange(n, dtype=jnp.float32) - half_cells
    gx, gy = jnp.meshgrid(ij * cell, ij * cell, indexing="ij")
    pw = jnp.stack([gx, gy, jnp.zeros_like(gx)], axis=-1).reshape(-1, 3)
    pc = lie.se3_apply(R, t, pw)
    z = jnp.maximum(pc[:, 2], 0.001)  # clamp as the reference does
    px = cam_ops.project(cam, pc[:, :2] / z[:, None]).reshape(n, n, 2)

    # Both line families: rows (i, j)->(i, j+1) and columns (j, i)->(j+1, i).
    a = jnp.concatenate(
        [px[:, :-1].reshape(-1, 2), px[:-1, :].reshape(-1, 2)]
    )
    b = jnp.concatenate(
        [px[:, 1:].reshape(-1, 2), px[1:, :].reshape(-1, 2)]
    )
    M = a.shape[0]
    black = jnp.zeros((M, 3), jnp.float32)
    return draw_segments(img, a, b, black, jnp.ones(M, bool), thickness=2)
