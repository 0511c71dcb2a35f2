"""Synthetic rendered scenes for tests and benchmarks.

The reference has no test assets (SURVEY.md §4); these generators provide
ground-truth-exact image sequences: a textured world plane rendered through
the ATAN camera from arbitrary poses (exact inverse warp, no geometry
approximation), plus random 3D structure for estimation-only tests. They
drive the BASELINE.json config-1 style benchmarks (synthetic planar grid)
and all integration tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import image as img_ops
from visualslam_android_tpu.ops import lie


class PlanarScene(NamedTuple):
    """A textured plane z = depth (world frame), texture sampled at
    (x, y) * px_per_m + center."""

    texture: jnp.ndarray  # [Ht, Wt] f32 in [0, 255]
    depth: float
    px_per_m: float

    def world_to_tex(self, xy_w):
        Ht, Wt = self.texture.shape
        return xy_w * self.px_per_m + jnp.asarray(
            [Wt / 2.0, Ht / 2.0], xy_w.dtype
        )

    def tex_to_world(self, uv):
        Ht, Wt = self.texture.shape
        xy = (uv - jnp.asarray([Wt / 2.0, Ht / 2.0], uv.dtype)) / self.px_per_m
        return xy


def make_planar_scene(rng, depth=4.0, tex_size=1024, px_per_m=160.0,
                      n_blobs=400, blur=1.0) -> PlanarScene:
    """Corner-rich random texture: rectangles of random intensity."""
    tex = np.full((tex_size, tex_size), 128.0, np.float32)
    for _ in range(n_blobs):
        x = rng.integers(0, tex_size - 40)
        y = rng.integers(0, tex_size - 40)
        w = int(rng.integers(6, 40))
        h = int(rng.integers(6, 40))
        tex[y : y + h, x : x + w] = rng.uniform(0, 255)
    tex += rng.uniform(0, 4, tex.shape).astype(np.float32)
    tex = np.clip(tex, 0, 255)
    t = img_ops.gaussian_blur(jnp.asarray(tex), blur)
    return PlanarScene(texture=t, depth=depth, px_per_m=px_per_m)


def make_photo_scene(depth=4.0, px_per_m=160.0, tile=2,
                     photo_path=None) -> PlanarScene:
    """Planar scene textured with a REAL photograph (matplotlib's bundled
    grace_hopper.jpg — the only real-camera image shipped in this
    environment; network egress is unavailable so TUM/KITTI imagery
    cannot be fetched). Mirror-tiled to kill seam discontinuities. Real
    photographs exercise natural texture statistics — smooth shading,
    low-contrast regions, photographic noise — that the random-rectangle
    texture cannot; combined with apply_sensor_effects this is the
    closest obtainable stand-in for the BASELINE's real-imagery configs."""
    if photo_path is None:
        import matplotlib

        photo_path = (
            matplotlib.get_data_path() + "/sample_data/grace_hopper.jpg"
        )
    from PIL import Image

    g = np.asarray(Image.open(photo_path).convert("L"), np.float32)
    flip_h = g[:, ::-1]
    row = np.concatenate([g, flip_h] * tile, axis=1)
    full = np.concatenate([row, row[::-1]] * tile, axis=0)
    return PlanarScene(
        texture=jnp.asarray(full), depth=depth, px_per_m=px_per_m
    )


def apply_sensor_effects(img, rng, exposure_gain=1.0, exposure_bias=0.0,
                         noise_std=2.0, blur_sigma=0.0):
    """Camera-realism post-pass for rendered frames: exposure drift
    (gain/bias), Gaussian read noise, optional defocus/motion blur. All
    host-side numpy (test-data generation, not the compute path)."""
    out = np.asarray(img, np.float32) * exposure_gain + exposure_bias
    if blur_sigma > 0:
        out = np.asarray(
            img_ops.gaussian_blur(jnp.asarray(out), float(blur_sigma))
        )
    if noise_std > 0:
        out = out + rng.normal(scale=noise_std, size=out.shape)
    return np.clip(out, 0.0, 255.0).astype(np.float32)


def render(scene: PlanarScene, cam: cam_ops.Camera, R, t, shape_hw):
    """Render the plane from camera pose (R, t) = camera-from-world.

    Exact inverse warp: for every output pixel, unproject to a ray,
    intersect the plane, sample the texture bilinearly.
    """
    H, W = shape_hw
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = jnp.stack([xs, ys], axis=-1).astype(jnp.float32).reshape(-1, 2)
    m = cam_ops.unproject(cam, px)  # [P, 2] z=1 plane, camera frame
    ray_c = jnp.concatenate([m, jnp.ones((m.shape[0], 1), m.dtype)], -1)
    # World ray: X = C + s * d where C = -R^T t, d = R^T ray_c.
    Rt = R.T
    C = -Rt @ t
    d = ray_c @ R  # [P, 3] = (R^T ray^T)^T
    s = (scene.depth - C[2]) / d[:, 2]
    Xw = C[None, :] + s[:, None] * d
    uv = scene.world_to_tex(Xw[:, :2])
    vals = img_ops.bilinear_sample(scene.texture, uv)
    # Rays hitting behind the camera or off-texture get mid-gray.
    Ht, Wt = scene.texture.shape
    ok = (
        (s > 0)
        & (uv[:, 0] >= 0)
        & (uv[:, 1] >= 0)
        & (uv[:, 0] < Wt - 1)
        & (uv[:, 1] < Ht - 1)
    )
    vals = jnp.where(ok, vals, 128.0)
    return vals.reshape(H, W)


def plane_point_from_pixel(scene: PlanarScene, cam: cam_ops.Camera, R, t, px):
    """Ground-truth world point(s) seen at pixel(s) px from pose (R, t)."""
    m = cam_ops.unproject(cam, px)
    ray_c = jnp.concatenate([m, jnp.ones((*m.shape[:-1], 1), m.dtype)], -1)
    C = -(R.T @ t)
    d = ray_c @ R  # R^T applied to each ray
    s = (scene.depth - C[..., 2]) / d[..., 2]
    return C + s[..., None] * d


def look_at_pose(position, target=(0.0, 0.0, 4.0), up=(0.0, -1.0, 0.0)):
    """Camera-from-world (R, t) for a camera at `position` looking at
    `target` (z forward, x right, y down)."""
    pos = np.asarray(position, np.float64)
    tgt = np.asarray(target, np.float64)
    fwd = tgt - pos
    fwd /= np.linalg.norm(fwd)
    upv = np.asarray(up, np.float64)
    right = np.cross(upv, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_wc = np.stack([right, down, fwd], axis=1)  # world-from-camera
    R = R_wc.T  # camera-from-world
    t = -R @ pos
    return jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)


def random_structure(rng, n_points, depth_range=(3.0, 6.0),
                     xy_range=2.0):
    """Random 3D points for estimation-only tests."""
    xy = rng.uniform(-xy_range, xy_range, size=(n_points, 2))
    z = rng.uniform(*depth_range, size=(n_points, 1))
    return jnp.asarray(np.concatenate([xy, z], axis=-1), jnp.float32)
