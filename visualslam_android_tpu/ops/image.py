"""Dense image-processing ops: pyramid, bilinear sampling, affine warping,
Shi-Tomasi scoring, Gaussian blur.

Capability parity with the reference's image utilities
(jni/vision/ImageHandler.{h,cpp}): bilinear ``sample``
(ImageHandler.cpp:3-19), affine ``transform_image`` with out-of-image count
(ImageHandler.cpp:21-113), ``in_image_with_border`` (:120-122), and
``FindShiTomasiScoreAtPoint`` (:124-155), plus the pyramid half-sampling of
KeyFrame::MakeKeyFrame_Lite (jni/KeyFrame.cc:20-23).

TPU-native differences: images are f32 arrays in [0, 255] (matching the
reference's u8 value scale, on which the Shi-Tomasi threshold 70 and FAST
thresholds are calibrated), everything is dense and batched — Shi-Tomasi is
computed for the whole image at once with box-filter sums instead of
per-point loops, and warps are vmapped gathers.

Coordinate convention: points are (x, y) = (column, row), like the
reference's Eigen::Vector2d corners; arrays index as img[y, x].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def half_sample(img):
    """2x2 block mean — equivalent to the reference's half-size
    cv::resize with bilinear interpolation (jni/KeyFrame.cc:20-23)."""
    H, W = img.shape[-2:]
    x = img[..., : H - H % 2, : W - W % 2]
    x = x.reshape(*x.shape[:-2], H // 2, 2, W // 2, 2)
    return x.mean(axis=(-3, -1))


def make_pyramid(img, n_levels=4):
    """List of n_levels images, level 0 = input (KeyFrame.cc:18-23)."""
    levels = [img]
    for _ in range(n_levels - 1):
        levels.append(half_sample(levels[-1]))
    return levels


def bilinear_sample(img, xy):
    """Bilinear sample at xy[..., 2] = (x, y) float positions
    (ImageHandler.cpp:3-19 semantics: floor + fractional blend).

    Out-of-range coordinates are clamped; callers mask validity separately
    (the reference's transform_image does its own bounds check).
    """
    H, W = img.shape[-2:]
    x, y = xy[..., 0], xy[..., 1]
    lx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    ly = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - lx, 0.0, 1.0)
    fy = jnp.clip(y - ly, 0.0, 1.0)
    i00 = img[..., ly, lx]
    i01 = img[..., ly, lx + 1]
    i10 = img[..., ly + 1, lx]
    i11 = img[..., ly + 1, lx + 1]
    top = (1 - fx) * i00 + fx * i01
    bot = (1 - fx) * i10 + fx * i11
    return (1 - fy) * top + fy * bot


def in_image_with_border(shape_hw, xy, border):
    """(x, y) strictly inside [border, W-border) x [border, H-border)
    (ImageHandler.cpp:120-122)."""
    H, W = shape_hw
    x, y = xy[..., 0], xy[..., 1]
    return (x >= border) & (y >= border) & (x < W - border) & (y < H - border)


def patch_grid(half_size, dtype=jnp.float32):
    """[(2h+1)^2, 2] grid of (x, y) offsets centered on 0."""
    n = 2 * half_size + 1
    ys, xs = jnp.mgrid[0:n, 0:n]
    return jnp.stack(
        [xs.reshape(-1) - half_size, ys.reshape(-1) - half_size], axis=-1
    ).astype(dtype)


def affine_warp_patch(img, M, in_center, out_half_size, default=0.0):
    """Extract a warped square patch: out(i, j) = img(in_center + M @ d)
    where d = (j, i) - out_center — the semantics of the reference's
    ``transform_image`` (ImageHandler.cpp:21-113) specialized to centered
    square patches (its only use, PatchFinder.cc:79-125).

    Returns (patch[(2h+1), (2h+1)], n_outside) like the reference's
    out-of-image count. Batched over leading axes of M / in_center via vmap.
    """
    n = 2 * out_half_size + 1
    offs = patch_grid(out_half_size, M.dtype)  # [(n*n), 2]
    src = in_center + offs @ M.T
    H, W = img.shape[-2:]
    valid = (
        (src[..., 0] >= 0)
        & (src[..., 1] >= 0)
        & (src[..., 0] < W - 1)
        & (src[..., 1] < H - 1)
    )
    vals = bilinear_sample(img, src)
    vals = jnp.where(valid, vals, default)
    return vals.reshape(n, n), jnp.sum(~valid)


def _box_sum(x, half):
    """Sliding-window sum over a (2*half+1)^2 box, same-padded with zeros."""
    k = 2 * half + 1
    return lax.reduce_window(
        x, 0.0, lax.add, (k, k), (1, 1), [(half, half), (half, half)]
    )


def shi_tomasi_dense(img, half_box=3):
    """Dense Shi-Tomasi (min eigenvalue) score map.

    Matches FindShiTomasiScoreAtPoint (ImageHandler.cpp:124-155): central
    differences WITHOUT the 1/2 factor, box sums over (2*half_box+1)^2,
    normalized by 2 * n_pixels — computed for every pixel at once instead
    of per-candidate. Border pixels (where the box or gradient stencil
    leaves the image) hold approximate values; callers mask with
    border >= half_box + 1 (the reference only evaluates candidates with
    border 10, KeyFrame.cc:65).
    """
    dx = jnp.zeros_like(img)
    dx = dx.at[..., :, 1:-1].set(img[..., :, 2:] - img[..., :, :-2])
    dy = jnp.zeros_like(img)
    dy = dy.at[..., 1:-1, :].set(img[..., 2:, :] - img[..., :-2, :])
    xx = _box_sum(dx * dx, half_box)
    yy = _box_sum(dy * dy, half_box)
    xy = _box_sum(dx * dy, half_box)
    n_pix = (2 * half_box + 1) ** 2
    xx, yy, xy = xx / (2.0 * n_pix), yy / (2.0 * n_pix), xy / (2.0 * n_pix)
    tr = xx + yy
    det = xx * yy - xy * xy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    return 0.5 * (tr - disc)


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_blur(img, sigma: float, truncate: float = 3.0):
    """Separable Gaussian blur (used for the SmallBlurryImage,
    jni/SmallBlurryImage.cc:20-55). Edge-replicate padding like OpenCV's
    default border mode."""
    if sigma <= 0:
        return img
    radius = max(1, int(truncate * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)

    def conv1d(im, axis):
        pad = [(0, 0)] * im.ndim
        pad[axis] = (radius, radius)
        imp = jnp.pad(im, pad, mode="edge")
        out = jnp.zeros_like(im)
        for i in range(2 * radius + 1):
            sl = [slice(None)] * im.ndim
            sl[axis] = slice(i, i + im.shape[axis])
            out = out + k[i] * imp[tuple(sl)]
        return out

    return conv1d(conv1d(img, -1), -2)


def extract_slabs(imgs, kf_idx, center_int, half_size):
    """Per-point axis-aligned slabs via batched dynamic_slice.

    imgs [K, H, W] (or [H, W] with kf_idx None); center_int [N, 2] integer
    (x, y); returns (slabs [N, S, S], base_xy [N, 2]) with S = 2*half+1,
    slab origin clamped into the image.

    This is THE fast path for batched sampling on TPU: a vmapped
    dynamic_slice keeps rows lane-contiguous (~0.1 ns/element) where a
    per-element gather scalarizes (~10 ns/element, measured on v5e). All
    sub-pixel work then happens as vector math inside the slab
    (:func:`separable_bilinear`).
    """
    S = 2 * half_size + 1
    H, W = imgs.shape[-2:]
    x0 = jnp.clip(center_int[:, 0] - half_size, 0, W - S)
    y0 = jnp.clip(center_int[:, 1] - half_size, 0, H - S)
    if imgs.ndim == 2:
        slabs = jax.vmap(
            lambda x, y: lax.dynamic_slice(imgs, (y, x), (S, S))
        )(x0, y0)
    else:
        slabs = jax.vmap(
            lambda k, x, y: lax.dynamic_slice(
                imgs, (k, y, x), (1, S, S)
            )[0]
        )(kf_idx, x0, y0)
    return slabs, jnp.stack([x0, y0], axis=-1)


def region_size(slab_size: int, tile: int = 32) -> int:
    """Region edge length G for :func:`extract_regions`: the smallest
    multiple of `tile` that contains a `slab_size` window at any alignment
    (worst case the window starts at tile offset tile-1)."""
    return tile * -(-(tile - 1 + slab_size) // tile)


def extract_regions(imgs, kf_idx, origin_int, slab_size: int,
                    tile: int = 32):
    """Per-point image regions WITHOUT serial per-point slicing.

    imgs [K, H, W] (or [H, W] with kf_idx None); origin_int [N, 2] = the
    (x, y) top-left corner of the slab each point needs; returns
    (regions [N, G, G], base_xy [N, 2]) with G = region_size(slab_size),
    guaranteeing that every in-image pixel of
    [origin, origin + slab_size) lies inside the region.

    Method: the image is cut into non-overlapping tile x tile blocks by a
    pure reshape, and each point row-gathers the (G/tile)^2 block of tiles
    containing its slab. Row gathers of whole tiles vectorize on TPU,
    where a vmapped dynamic_slice (or block lax.gather) lowers to a
    2048-iteration sequential while loop (~3.7 ms vs ~1.1 ms measured on
    v5e for 2048 35x35 slabs from 800x480).
    """
    G = region_size(slab_size, tile)
    g = G // tile
    H, W = imgs.shape[-2:]
    if imgs.ndim == 2:
        imgs = imgs[None]
        kf_idx = jnp.zeros(origin_int.shape[0], jnp.int32)
    K = imgs.shape[0]
    Hp = max(tile * -(-H // tile), G)
    Wp = max(tile * -(-W // tile), G)
    if (Hp, Wp) != (H, W):
        imgs = jnp.pad(imgs, ((0, 0), (0, Hp - H), (0, Wp - W)))
    Ty, Tx = Hp // tile, Wp // tile
    tiles = (
        imgs.reshape(K, Ty, tile, Tx, tile)
        .transpose(0, 1, 3, 2, 4)
        .reshape(K * Ty * Tx, tile * tile)
    )
    tx = jnp.clip(origin_int[:, 0] // tile, 0, Tx - g)
    ty = jnp.clip(origin_int[:, 1] // tile, 0, Ty - g)
    idx = kf_idx * (Ty * Tx) + ty * Tx + tx
    rows = []
    for i in range(g):
        cols = [
            jnp.take(tiles, idx + i * Tx + j, axis=0).reshape(
                -1, tile, tile
            )
            for j in range(g)
        ]
        rows.append(jnp.concatenate(cols, axis=2))
    regions = jnp.concatenate(rows, axis=1)  # [N, G, G]
    base = jnp.stack([tx * tile, ty * tile], axis=-1)
    return regions, base


def separable_bilinear(slabs, rel_xy):
    """Bilinear-sample slabs [N, S, S] at rel_xy [N, P, 2] (slab-relative
    float coords) WITHOUT per-element gathers: the bilinear kernel
    w(x, y) = max(0, 1-|x|) * max(0, 1-|y|) is separable, so each sample is
    the bilinear form  w_y^T . slab . w_x  — two batched matmuls that run
    on the MXU instead of a scalarized gather.

    Samples outside [0, S-1] get weight 0 (callers mask validity).
    Inside the slab this is exactly 4-tap bilinear interpolation.
    """
    N, S, _ = slabs.shape
    dtype = slabs.dtype
    grid = jnp.arange(S, dtype=dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel_xy[..., 0:1] - grid))  # [N,P,S]
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel_xy[..., 1:2] - grid))  # [N,P,S]
    tmp = jnp.einsum("nps,nst->npt", wy, slabs)
    return jnp.sum(tmp * wx, axis=-1)  # [N, P]


def extract_patch(img, center_xy, half_size):
    """Axis-aligned integer-centered patch via dynamic_slice; center must be
    at least half_size from the border (callers mask). Returns
    [(2h+1), (2h+1)]."""
    n = 2 * half_size + 1
    H, W = img.shape[-2:]
    x0 = jnp.clip(center_xy[0].astype(jnp.int32) - half_size, 0, W - n)
    y0 = jnp.clip(center_xy[1].astype(jnp.int32) - half_size, 0, H - n)
    return lax.dynamic_slice(img, (y0, x0), (n, n))


def extract_window(img, center_xy, half_size):
    """Like extract_patch but returns (window, top_left_xy) so callers can
    convert window coordinates back to image coordinates."""
    n = 2 * half_size + 1
    H, W = img.shape[-2:]
    x0 = jnp.clip(center_xy[0].astype(jnp.int32) - half_size, 0, W - n)
    y0 = jnp.clip(center_xy[1].astype(jnp.int32) - half_size, 0, H - n)
    win = lax.dynamic_slice(img, (y0, x0), (n, n))
    return win, jnp.stack([x0, y0])
