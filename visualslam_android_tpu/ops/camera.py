"""Batched ATAN/FOV (Devernay-Faugeras) camera model.

Capability parity with the reference's ``ATANCamera`` (jni/ATANCamera.{h,cc}):
project / unproject between the z=1 camera plane and distorted pixels
(ATANCamera.cc:133-164), analytic 2x2 projection Jacobian
(ATANCamera.cc:198-231), the radial transfer functions ``rtrans_factor`` /
``invrtrans`` (ATANCamera.h:136-150), largest-radius and one-pixel-distance
helpers, and a GL-style frustum matrix.

Unlike the reference — whose camera object caches per-call state and is
explicitly NOT thread-safe (ATANCamera.h:7-11, one copy per consumer) — this
module is purely functional: a `Camera` pytree of parameters plus stateless
batched ops, so one camera value is shared by every jitted stage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-9


def _safe_norm(v):
    """L2 norm with a well-defined (zero) gradient at v = 0; a bare
    jnp.linalg.norm propagates NaN through jnp.where guards."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-18)


class Camera(NamedTuple):
    """FOV camera. Normalized intrinsics as in ATANCamera.cc:20-24, scaled by
    the image size on construction (ATANCamera.cc:37-129)."""

    focal: jnp.ndarray   # [2] (fx * W, fy * H)
    center: jnp.ndarray  # [2] (cx * W - 0.5, cy * H - 0.5)
    w: jnp.ndarray       # [] FOV distortion parameter omega
    two_tan_half_w: jnp.ndarray  # [] 2 * tan(w / 2)
    size: jnp.ndarray    # [2] (W, H) as float


def make_camera(params, width: int, height: int, dtype=jnp.float32) -> Camera:
    """Build a Camera from normalized (fx, fy, cx, cy, w) and an image size.

    The -0.5 pixel-center offset matches ATANCamera::RefreshParams
    (ATANCamera.cc:37-129).
    """
    fx, fy, cx, cy, w = [jnp.asarray(p, dtype) for p in params]
    size = jnp.array([width, height], dtype)
    focal = jnp.stack([fx * width, fy * height])
    center = jnp.stack([cx * width - 0.5, cy * height - 0.5])
    return Camera(
        focal=focal,
        center=center,
        w=w,
        two_tan_half_w=2.0 * jnp.tan(w / 2.0),
        size=size,
    )


def scale_camera(cam: Camera, factor: float) -> Camera:
    """Camera for a pyramid level: intrinsics scaled by `factor` (the
    reference instead converts coordinates with LevelZeroPos; we keep all
    matching in level-0 coordinates, so this is used only for SBI-sized
    operations)."""
    return Camera(
        focal=cam.focal * factor,
        center=(cam.center + 0.5) * factor - 0.5,
        w=cam.w,
        two_tan_half_w=cam.two_tan_half_w,
        size=cam.size * factor,
    )


def _rtrans_factor(cam: Camera, r):
    """Undistorted radius -> distortion factor (ATANCamera.h:136-143):
    factor(r) = atan(r * 2tan(w/2)) / (r * w), with the w->0 / r->0 limits.
    """
    rw_small = jnp.abs(cam.w) < 1e-5
    r_small = r < 0.001
    safe_r = jnp.where(r_small, 1.0, r)
    safe_w = jnp.where(rw_small, 1.0, cam.w)
    factor = jnp.arctan(safe_r * cam.two_tan_half_w) / (safe_r * safe_w)
    return jnp.where(rw_small | r_small, 1.0, factor)


def _invrtrans(cam: Camera, r_dist):
    """Distorted radius -> undistorted radius (ATANCamera.h:145-150):
    r = tan(r_dist * w) / (2 tan(w/2))."""
    w_small = jnp.abs(cam.w) < 1e-5
    safe = jnp.where(w_small, 1.0, cam.two_tan_half_w)
    r = jnp.tan(r_dist * cam.w) / safe
    return jnp.where(w_small, r_dist, r)


def project(cam: Camera, m):
    """Camera-plane point m[..., 2] (x/z, y/z) -> pixel [..., 2]
    (ATANCamera.cc:133-145)."""
    r = _safe_norm(m)
    factor = _rtrans_factor(cam, r)
    dist = factor[..., None] * m
    return cam.center + cam.focal * dist


def unproject(cam: Camera, v):
    """Pixel v[..., 2] -> camera-plane point [..., 2]
    (ATANCamera.cc:149-164)."""
    dist = (v - cam.center) / cam.focal
    r_dist = _safe_norm(dist)
    r = _invrtrans(cam, r_dist)
    safe = jnp.where(r_dist < _EPS, 1.0, r_dist)
    factor = jnp.where(r_dist < _EPS, 1.0, r / safe)
    return factor[..., None] * dist


def project_derivs(cam: Camera, m):
    """(pixel, d pixel / d m [..., 2, 2]) — the analytic Jacobian of
    ATANCamera::GetProjectionDerivs_Eigen (ATANCamera.cc:198-231), computed
    exactly via forward-mode AD (identical values, fused by XLA)."""
    flat = m.reshape(-1, 2)
    px, jac = jax.vmap(
        lambda mm: (project(cam, mm), jax.jacfwd(lambda q: project(cam, q))(mm))
    )(flat)
    return px.reshape(m.shape), jac.reshape(*m.shape, 2)


def in_image(cam: Camera, v, border=0.0):
    """Pixel inside the frame with a border margin
    (mirrors CVD-style in_image_with_border, vision/ImageHandler.cpp:120-122).
    """
    lo = v >= border
    hi = v < cam.size - border
    return jnp.all(lo & hi, axis=-1)


def largest_radius_in_image(cam: Camera):
    """Largest undistorted camera-plane radius visible in the image
    (ATANCamera's mdLargestRadius; used for epipolar search bounds,
    jni/MapMaker.cc:570-585)."""
    corners = jnp.stack(
        [
            jnp.array([0.0, 0.0]),
            jnp.stack([cam.size[0] - 1.0, jnp.array(0.0)]),
            jnp.stack([jnp.array(0.0), cam.size[1] - 1.0]),
            jnp.stack([cam.size[0] - 1.0, cam.size[1] - 1.0]),
        ]
    )
    m = unproject(cam, corners)
    return jnp.max(jnp.linalg.norm(m, axis=-1))


def one_pixel_dist(cam: Camera):
    """Camera-plane distance corresponding to one pixel at the center
    (ATANCamera's mdOnePixelDist; angle-threshold helper)."""
    c = cam.center
    a = unproject(cam, c)
    b = unproject(cam, c + jnp.array([1.0, 0.0], c.dtype))
    return jnp.linalg.norm(b - a)


def gl_frustum(cam: Camera, near=0.01, far=100.0):
    """OpenGL-style 4x4 projection matrix from the linear part of the camera
    (parity with ATANCamera's MakeUFBLinearFrustumMatrix capability; the
    distortion is ignored as in the reference's GL path)."""
    fx, fy = cam.focal[0], cam.focal[1]
    cx, cy = cam.center[0], cam.center[1]
    W, H = cam.size[0], cam.size[1]
    left = -near * cx / fx
    right = near * (W - cx) / fx
    top = -near * cy / fy
    bottom = near * (H - cy) / fy
    M = jnp.zeros((4, 4), cam.focal.dtype)
    M = M.at[0, 0].set(2 * near / (right - left))
    M = M.at[0, 2].set((right + left) / (right - left))
    M = M.at[1, 1].set(2 * near / (bottom - top))
    M = M.at[1, 2].set((bottom + top) / (bottom - top))
    M = M.at[2, 2].set(-(far + near) / (far - near))
    M = M.at[2, 3].set(-2 * far * near / (far - near))
    M = M.at[3, 2].set(-1.0)
    return M
