"""Batched patch matching: warped templates, coarse ZMSSD search over corner
candidates, inverse-composition subpixel refinement, and MiniPatch SSD
search.

Capability parity with the reference's 5-stage ``PatchFinder``
(jni/PatchFinder.{h,cc}) and ``MiniPatch`` (jni/MiniPatch.{h,cc}):

1. warp matrix + search level from view change
   (CalcSearchLevelAndWarpMatrix, PatchFinder.cc:31-68; det clamped to
   [0.25, 3) per level);
2. warped template generation (MakeTemplateCoarseCont :79-125 via
   transform_image) and the no-warp variant (:130-148);
3. coarse ZMSSD search over FAST corners within a radius
   (FindPatchCoarse :170-235; max SSD = 500 * patch_px, :19-20);
4. inverse-composition subpixel template (MakeSubPixTemplate :242-267,
   3 params: dx, dy, mean-difference);
5. subpixel iteration with bilinear target sampling
   (IterateSubPix(ToConvergence) :272-350, convergence 0.03 px).

TPU-native design (SURVEY.md §2 #13, §7): everything is batched over ALL
points at once with fixed shapes.

- The per-corner ZMSSD loop over row-LUT candidates (PatchFinder.cc:204-227)
  becomes a dense computation over every offset in the search square:
  patch sums via ``reduce_window``, the template cross-correlation via a
  grouped convolution (one group per point -> MXU), candidate validity
  (is-a-corner, within radius, in-image) as masks, and argmin over offsets.
  The reference's integer ZMSSD identity
  ZMSSD = Sum I^2 + Sum T^2 - 2 Sum IT - (Sum T - Sum I)^2 / Npix
  (ZMSSDAtPoint, PatchFinder.cc:352-380) is used in float form.
- Subpixel refinement runs a fixed-iteration ``fori_loop`` with converged /
  failed masks instead of data-dependent early exit.
- Search-level dispatch (a per-point data-dependent int) is handled by the
  caller running one fixed-shape pass per pyramid level with point masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from visualslam_android_tpu.ops import image as img_ops
from visualslam_android_tpu.ops import wls as wls_ops
from visualslam_android_tpu.ops.levels import (
    level_n_pos,
    level_scale,
    level_zero_pos,
)

N_LEVELS = 4


# ---------------------------------------------------------------------------
# Stage 1: warp matrix and search level
# ---------------------------------------------------------------------------


def calc_search_level_and_warp(
    pc, motion_right, motion_down, cam_derivs, n_levels=N_LEVELS,
    det_lo=0.25, det_hi=3.0,
):
    """Batched CalcSearchLevelAndWarpMatrix (PatchFinder.cc:31-68).

    pc[..., 3]: point in current camera frame; motion_right/down[..., 3]:
    the map point's source-pixel displacement vectors rotated into the
    current camera (R @ v3PixelRight_W / v3PixelDown_W); cam_derivs
    [..., 2, 2]: projection derivatives at the point.

    Returns (warp_inv[..., 2, 2], search_level[...], good[...]):
    warp_inv maps source-KF source-level pixels to current level-0 pixels;
    good is False where the determinant is out of range at every level
    (too near / far / reflected, PatchFinder.cc:56-63).
    """
    inv_z = 1.0 / pc[..., 2]

    def in_plane(motion):
        return jnp.stack(
            [
                (motion[..., 0] - pc[..., 0] * motion[..., 2] * inv_z) * inv_z,
                (motion[..., 1] - pc[..., 1] * motion[..., 2] * inv_z) * inv_z,
            ],
            axis=-1,
        )

    col_r = jnp.einsum("...ab,...b->...a", cam_derivs, in_plane(motion_right))
    col_d = jnp.einsum("...ab,...b->...a", cam_derivs, in_plane(motion_down))
    warp_inv = jnp.stack([col_r, col_d], axis=-1)  # columns = right, down
    det = (
        warp_inv[..., 0, 0] * warp_inv[..., 1, 1]
        - warp_inv[..., 0, 1] * warp_inv[..., 1, 0]
    )
    # Search level: smallest l with det * 0.25^l <= det_hi
    # (PatchFinder.cc:56-60; det_lo/det_hi = PatchConfig.warp_det_lo/hi).
    lv = jnp.zeros(det.shape, jnp.int32)
    d = det
    for _ in range(n_levels - 1):
        step = d > det_hi
        lv = lv + step.astype(jnp.int32)
        d = jnp.where(step, d * 0.25, d)
    good = (d <= det_hi) & (d >= det_lo)
    return warp_inv, lv, good


# ---------------------------------------------------------------------------
# Stage 2: template generation
# ---------------------------------------------------------------------------


class Templates(NamedTuple):
    """Per-point warped search templates and precomputed statistics."""

    data: jnp.ndarray      # [N, P, P] warped template pixels
    t_sum: jnp.ndarray     # [N] template pixel sum
    t_sumsq: jnp.ndarray   # [N] template pixel sum of squares
    grad_x: jnp.ndarray    # [N, P-2, P-2] interior x-gradients (0.5 factor)
    grad_y: jnp.ndarray    # [N, P-2, P-2]
    h_inv: jnp.ndarray     # [N, 3, 3] inverse-composition (JTJ)^-1
    bad: jnp.ndarray       # [N] template touched outside the source image


def _finalize_templates(data, bad) -> Templates:
    """Template sums (MakeTemplateSums, PatchFinder.cc:153-166) and the
    inverse-composition Hessian (MakeSubPixTemplate :242-267)."""
    t_sum = jnp.sum(data, axis=(-2, -1))
    t_sumsq = jnp.sum(data * data, axis=(-2, -1))
    gx = 0.5 * (data[:, 1:-1, 2:] - data[:, 1:-1, :-2])
    gy = 0.5 * (data[:, 2:, 1:-1] - data[:, :-2, 1:-1])
    ones = jnp.ones_like(gx)
    J = jnp.stack([gx, gy, ones], axis=-1)  # [N, P-2, P-2, 3]
    H = jnp.einsum("nhwi,nhwj->nij", J, J)
    # Closed-form batched inverse: jnp.linalg.inv lowers to a serial LU
    # while-loop on TPU.
    h_inv = wls_ops.inv3x3(H + 1e-6 * jnp.eye(3, dtype=data.dtype))
    return Templates(data, t_sum, t_sumsq, gx, gy, h_inv, bad)


# Half-extent of the source slab a warped template samples from. The warp
# determinant is clamped to [0.25, 3) per search level
# (calc_search_level_and_warp, PatchFinder.cc:56-63), so the template's
# source footprint is ~sqrt(3) * half_patch for isotropic warps; 16 covers
# >3x that. Templates whose warp stretches beyond the slab are marked bad
# (the reference would sample them, but such warps are degenerate views the
# tracker rejects downstream anyway).
TEMPLATE_SLAB_HALF = 16


def _warp_m2(warp_inv, search_level):
    """m2 = inv(warp_inv) * 2^search_level: source pixels per template
    pixel (MakeTemplateCoarseCont, PatchFinder.cc:84-90)."""
    det = (
        warp_inv[:, 0, 0] * warp_inv[:, 1, 1]
        - warp_inv[:, 0, 1] * warp_inv[:, 1, 0]
    )
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv = (
        jnp.stack(
            [
                jnp.stack([warp_inv[:, 1, 1], -warp_inv[:, 0, 1]], axis=-1),
                jnp.stack([-warp_inv[:, 1, 0], warp_inv[:, 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / safe_det[:, None, None]
    )
    return inv * (2.0 ** search_level.astype(inv.dtype))[:, None, None]


def _warped_template_data(regions, base, center, src, dims_wh, half_patch):
    """Shared tail of the warped-template builders: sample the warped grid
    from per-point regions, mask samples outside the source image or the
    +-TEMPLATE_SLAB_HALF slab around the source center (the region is
    guaranteed to contain that slab by extract_regions)."""
    n = 2 * half_patch + 1
    rel = src - base[:, None, :].astype(src.dtype)
    d = jnp.abs(src - center[:, None, :])
    valid = (
        (src[..., 0] >= 0)
        & (src[..., 1] >= 0)
        & (src[..., 0] < dims_wh[..., 0] - 1)
        & (src[..., 1] < dims_wh[..., 1] - 1)
        & (d[..., 0] <= TEMPLATE_SLAB_HALF - 1)
        & (d[..., 1] <= TEMPLATE_SLAB_HALF - 1)
    )
    vals = img_ops.separable_bilinear(regions, rel)
    data = jnp.where(valid, vals, 0.0).reshape(-1, n, n)
    bad = jnp.any(~valid, axis=-1)  # any pixel outside => template bad
    return data, bad


def make_templates_warped(
    source_imgs, source_kf, source_center, warp_inv, search_level,
    half_patch=5,
):
    """Batched MakeTemplateCoarseCont (PatchFinder.cc:79-125) for all points
    whose source patch lives in ONE pyramid level.

    source_imgs [K, H, W]: that level of every keyframe; source_kf [N];
    source_center [N, 2] source-level coords; warp_inv [N, 2, 2] from
    stage 1; search_level [N]. The warp applied is
    m2 = inv(warp_inv) * 2^search_level — source pixels per template pixel.

    Always regenerates (no reference-style warp cache: regenerating all
    templates is one batched slab resample on TPU; the cache existed to
    save serial CPU work, PatchFinder.cc:92-106). Sampling is slab-local:
    per-point dynamic_slice + separable-bilinear matmuls, never a
    per-element gather (see ops.image.extract_slabs).
    """
    m2 = _warp_m2(warp_inv, search_level)
    offs = img_ops.patch_grid(half_patch, m2.dtype)  # [n*n, 2]
    src = source_center[:, None, :] + jnp.einsum(
        "nij,pj->npi", m2, offs
    )  # [N, n*n, 2]
    H, W = source_imgs.shape[-2:]
    center_int = jnp.round(source_center).astype(jnp.int32)
    regions, base = img_ops.extract_regions(
        source_imgs, source_kf, center_int - TEMPLATE_SLAB_HALF,
        2 * TEMPLATE_SLAB_HALF + 1,
    )
    dims = jnp.asarray([W, H], src.dtype)[None, None, :]
    data, bad = _warped_template_data(
        regions, base, source_center, src, dims, half_patch
    )
    return _finalize_templates(data, bad)


class TemplateSlabs(NamedTuple):
    """Per-point source-image slabs: the ONLY data a warped template needs
    from its source keyframe. Point-major, so template generation (and
    everything downstream) can be sharded over points WITHOUT replicating
    the keyframe pyramid store — the memory axis that matters at scale."""

    regions: jnp.ndarray  # [N, G, G] source pixels around the center
    base: jnp.ndarray     # [N, 2] region origin in source-level coords
    dims: jnp.ndarray     # [N, 2] (W, H) of the source level


def extract_template_slabs(
    source_pyramids, source_kf, source_level, source_center,
) -> TemplateSlabs:
    """Slab extraction for points whose source patches live in DIFFERENT
    pyramid levels: one masked extraction pass per level.

    source_pyramids: tuple over levels of [K, H_l, W_l] keyframe stacks.
    """
    N = source_kf.shape[0]
    dtype = source_pyramids[0].dtype
    slab = 2 * TEMPLATE_SLAB_HALF + 1
    G = img_ops.region_size(slab)
    center_int = jnp.round(source_center).astype(jnp.int32)
    regions = jnp.zeros((N, G, G), dtype)
    base = jnp.zeros((N, 2), jnp.int32)
    dims = jnp.zeros((N, 2), dtype)
    for lvl, imgs in enumerate(source_pyramids):
        sel = source_level == lvl
        H, W = imgs.shape[-2:]
        rg, b = img_ops.extract_regions(
            imgs, source_kf, center_int - TEMPLATE_SLAB_HALF, slab
        )
        regions = jnp.where(sel[:, None, None], rg, regions)
        base = jnp.where(sel[:, None], b, base)
        dims = jnp.where(sel[:, None], jnp.asarray([W, H], dtype), dims)
    return TemplateSlabs(regions=regions, base=base, dims=dims)


def make_templates_from_slabs(
    slabs: TemplateSlabs, source_center, warp_inv, search_level,
    half_patch=5,
):
    """Warped templates from pre-extracted slabs: a single
    separable-bilinear resample for every point at once. Point-major in
    and out — safe to run inside a point-sharded region."""
    m2 = _warp_m2(warp_inv, search_level)
    offs = img_ops.patch_grid(half_patch, m2.dtype)
    src = source_center[:, None, :] + jnp.einsum("nij,pj->npi", m2, offs)
    data, bad = _warped_template_data(
        slabs.regions, slabs.base, source_center, src,
        slabs.dims[:, None, :], half_patch,
    )
    return _finalize_templates(data, bad)


def make_templates_warped_multilevel(
    source_pyramids, source_kf, source_level, source_center, warp_inv,
    search_level, half_patch=5,
):
    """Warped templates for points whose source patches live in DIFFERENT
    pyramid levels: extract_template_slabs + make_templates_from_slabs.
    Replaces four full make_templates_warped passes (4x the interpolation
    work) in the tracker's PVS template build."""
    slabs = extract_template_slabs(
        source_pyramids, source_kf, source_level, source_center
    )
    return make_templates_from_slabs(
        slabs, source_center, warp_inv, search_level, half_patch
    )


def make_templates_nowarp(source_imgs, source_kf, source_center, half_patch=5):
    """Batched MakeTemplateCoarseNoWarp (PatchFinder.cc:130-148): plain
    axis-aligned patch copy at integer source positions (epipolar search)."""
    n = 2 * half_patch + 1
    H, W = source_imgs.shape[-2:]
    cx = jnp.round(source_center[:, 0]).astype(jnp.int32)
    cy = jnp.round(source_center[:, 1]).astype(jnp.int32)
    bad = ~(
        (cx >= half_patch + 1)
        & (cy >= half_patch + 1)
        & (cx < W - half_patch - 1)
        & (cy < H - half_patch - 1)
    )
    offs = img_ops.patch_grid(half_patch, source_imgs.dtype)
    src = (
        jnp.stack([cx, cy], axis=-1).astype(source_imgs.dtype)[:, None, :]
        + offs
    )
    vals = _sample_from_stack(source_imgs, source_kf, src)
    data = vals.reshape(-1, n, n)
    return _finalize_templates(data, bad)


def _sample_from_stack(imgs, kf_idx, xy):
    """Bilinear sample imgs[K, H, W] at per-point (kf, xy[N, P, 2]) — a pure
    gather, no per-point image materialization."""
    H, W = imgs.shape[-2:]
    x, y = xy[..., 0], xy[..., 1]
    lx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    ly = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - lx, 0.0, 1.0)
    fy = jnp.clip(y - ly, 0.0, 1.0)
    k = kf_idx[:, None]
    i00 = imgs[k, ly, lx]
    i01 = imgs[k, ly, lx + 1]
    i10 = imgs[k, ly + 1, lx]
    i11 = imgs[k, ly + 1, lx + 1]
    return (1 - fy) * ((1 - fx) * i00 + fx * i01) + fy * (
        (1 - fx) * i10 + fx * i11
    )


# ---------------------------------------------------------------------------
# Stage 3: coarse ZMSSD search
# ---------------------------------------------------------------------------


class CoarseResult(NamedTuple):
    found: jnp.ndarray      # [N] bool
    pos_level: jnp.ndarray  # [N, 2] best corner position, search-level coords
    best_ssd: jnp.ndarray   # [N]


@functools.partial(
    jax.jit, static_argnames=("search_range", "half_patch", "max_ssd_per_px")
)
def find_patch_coarse(
    img, corner_mask, templates: Templates, pos_level, range_level, active,
    search_range: int, half_patch: int = 5, max_ssd_per_px: int = 500,
):
    """Batched FindPatchCoarse (PatchFinder.cc:170-235) on ONE pyramid
    level of the current frame.

    img [H, W]: the level image; corner_mask [H, W]: FAST corners of that
    level; pos_level [N, 2]: predicted positions in LEVEL coords;
    range_level [N]: per-point search radius in level coords (must be
    <= search_range, the static window radius); active [N]: evaluate mask.

    Candidates are every pixel within `search_range` of the prediction that
    (a) is a FAST corner, (b) lies within the per-point radius (circular,
    squaredNorm test as in :218-219), and (c) supports a full patch inside
    the image (border half_patch, ZMSSDAtPoint :353-354). ZMSSD for every
    candidate is computed with window sums + a grouped convolution.
    """
    N = templates.data.shape[0]
    P = 2 * half_patch + 1
    n_pix = P * P
    max_ssd = max_ssd_per_px * n_pix
    H, W = img.shape
    win_half = search_range + half_patch
    Wn = 2 * win_half + 1
    G = img_ops.region_size(Wn)
    n_off = G - P + 1

    origin = jnp.round(pos_level).astype(jnp.int32) - win_half
    windows, bases = img_ops.extract_regions(img, None, origin, Wn)
    mask_windows, _ = img_ops.extract_regions(
        corner_mask.astype(img.dtype), None, origin, Wn
    )

    # Patch sums over every candidate offset (VALID windows).
    sum_i = lax.reduce_window(
        windows, 0.0, lax.add, (1, P, P), (1, 1, 1), "VALID"
    )  # [N, n_off, n_off]
    sumsq_i = lax.reduce_window(
        windows * windows, 0.0, lax.add, (1, P, P), (1, 1, 1), "VALID"
    )
    # Cross-correlation with each point's own template: grouped conv.
    lhs = windows[None]  # [1, N, Wn, Wn]
    rhs = templates.data[:, None]  # [N, 1, P, P]
    cross = lax.conv_general_dilated(
        lhs, rhs, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=N,
        precision=lax.Precision.HIGHEST,
    )[0]  # [N, n_off, n_off]

    ssd = (
        sumsq_i
        + templates.t_sumsq[:, None, None]
        - 2.0 * cross
        - (templates.t_sum[:, None, None] - sum_i) ** 2 / n_pix
    )

    # Candidate validity.
    dys, dxs = jnp.mgrid[0:n_off, 0:n_off]
    cand_xy = (
        bases[:, None, None, :]
        + jnp.stack([dxs, dys], axis=-1)[None]
        + half_patch
    )  # [N, n_off, n_off, 2] absolute level coords
    is_corner = (
        mask_windows[:, half_patch : half_patch + n_off,
                     half_patch : half_patch + n_off]
        > 0.5
    )
    d = cand_xy.astype(img.dtype) - pos_level[:, None, None, :]
    in_radius = jnp.sum(d * d, axis=-1) <= (
        range_level.astype(img.dtype) ** 2
    )[:, None, None]
    in_img = (
        (cand_xy[..., 0] >= half_patch)
        & (cand_xy[..., 1] >= half_patch)
        & (cand_xy[..., 0] < W - half_patch)
        & (cand_xy[..., 1] < H - half_patch)
    )
    valid = (
        is_corner
        & in_radius
        & in_img
        & active[:, None, None]
        & ~templates.bad[:, None, None]
    )

    big = jnp.asarray(jnp.inf, img.dtype)
    ssd_m = jnp.where(valid, ssd, big)
    flat = ssd_m.reshape(N, -1)
    best = jnp.argmin(flat, axis=-1)
    best_ssd = jnp.take_along_axis(flat, best[:, None], axis=-1)[:, 0]
    bx = bases[:, 0] + best % n_off + half_patch
    by = bases[:, 1] + best // n_off + half_patch
    found = best_ssd < max_ssd
    return CoarseResult(
        found=found,
        pos_level=jnp.stack([bx, by], axis=-1).astype(img.dtype),
        best_ssd=best_ssd,
    )


@functools.partial(
    jax.jit, static_argnames=("max_range", "half_patch", "max_ssd_per_px")
)
def find_patch_coarse_multilevel(
    pyramid, corner_masks, templates: Templates, pred_zero, search_level,
    radius_zero, active, max_range: int, half_patch: int = 5,
    max_ssd_per_px: int = 500, kf_idx=None,
):
    """FindPatchCoarse over ALL search levels in one pass: per-level masked
    window extraction (dynamic_slice) into a unified static window, then a
    single ZMSSD computation for every point at once.

    pred_zero [N, 2]: predictions in LEVEL-0 coords; radius_zero [N]:
    per-point level-0 search radius (<= max_range); the per-point radius is
    scaled to the point's search level (ceil, like the reference's integer
    level ranges, Tracker.cc:635-641). Returns found + matched position in
    LEVEL-0 coords.

    Replaces four per-level find_patch_coarse calls (each evaluating all N
    points) with one: windows for each point come from its OWN level image,
    high-level images padded so the unified window always fits.

    With kf_idx [N], `pyramid`/`corner_masks` entries are KEYFRAME STACKS
    [K, H_l, W_l] and each point searches its own target frame — the
    (point, keyframe)-pair form mapmaker.refind_pairs runs on.
    """
    N = templates.data.shape[0]
    P = 2 * half_patch + 1
    n_pix = P * P
    max_ssd = max_ssd_per_px * n_pix
    dtype = pred_zero.dtype
    win_half = max_range + half_patch
    Wn = 2 * win_half + 1
    G = img_ops.region_size(Wn)
    n_off = G - P + 1

    windows = jnp.zeros((N, G, G), dtype)
    mask_windows = jnp.zeros((N, G, G), dtype)
    bases = jnp.zeros((N, 2), jnp.int32)
    dims = jnp.zeros((N, 2), dtype)
    pred_level = jnp.zeros((N, 2), dtype)
    scale_pt = (2.0 ** search_level.astype(dtype))

    for lvl in range(len(pyramid)):
        sel = active & (search_level == lvl)
        img = pyramid[lvl]
        msk = corner_masks[lvl].astype(dtype)
        H, W = img.shape[-2:]
        pred_l = level_n_pos(pred_zero, lvl)
        origin = jnp.round(pred_l).astype(jnp.int32) - win_half
        w, b = img_ops.extract_regions(img, kf_idx, origin, Wn)
        m, _ = img_ops.extract_regions(msk, kf_idx, origin, Wn)
        windows = jnp.where(sel[:, None, None], w, windows)
        mask_windows = jnp.where(sel[:, None, None], m, mask_windows)
        bases = jnp.where(sel[:, None], b, bases)
        dims = jnp.where(sel[:, None], jnp.asarray([W, H], dtype), dims)
        pred_level = jnp.where(sel[:, None], pred_l, pred_level)

    radius_level = jnp.ceil(radius_zero / scale_pt)

    sum_i = lax.reduce_window(
        windows, 0.0, lax.add, (1, P, P), (1, 1, 1), "VALID"
    )
    sumsq_i = lax.reduce_window(
        windows * windows, 0.0, lax.add, (1, P, P), (1, 1, 1), "VALID"
    )
    cross = lax.conv_general_dilated(
        windows[None], templates.data[:, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=N,
        precision=lax.Precision.HIGHEST,
    )[0]
    ssd = (
        sumsq_i
        + templates.t_sumsq[:, None, None]
        - 2.0 * cross
        - (templates.t_sum[:, None, None] - sum_i) ** 2 / n_pix
    )

    dys, dxs = jnp.mgrid[0:n_off, 0:n_off]
    cand_xy = (
        bases[:, None, None, :]
        + jnp.stack([dxs, dys], axis=-1)[None]
        + half_patch
    )
    is_corner = (
        mask_windows[:, half_patch : half_patch + n_off,
                     half_patch : half_patch + n_off]
        > 0.5
    )
    d = cand_xy.astype(dtype) - pred_level[:, None, None, :]
    in_radius = jnp.sum(d * d, axis=-1) <= (radius_level ** 2)[:, None, None]
    in_img = (
        (cand_xy[..., 0] >= half_patch)
        & (cand_xy[..., 1] >= half_patch)
        & (cand_xy[..., 0] < dims[:, None, None, 0] - half_patch)
        & (cand_xy[..., 1] < dims[:, None, None, 1] - half_patch)
    )
    valid = (
        is_corner
        & in_radius
        & in_img
        & active[:, None, None]
        & ~templates.bad[:, None, None]
    )

    ssd_m = jnp.where(valid, ssd, jnp.inf).reshape(N, -1)
    best = jnp.argmin(ssd_m, axis=-1)
    best_ssd = jnp.take_along_axis(ssd_m, best[:, None], axis=-1)[:, 0]
    bx = bases[:, 0] + best % n_off + half_patch
    by = bases[:, 1] + best // n_off + half_patch
    pos_level = jnp.stack([bx, by], axis=-1).astype(dtype)
    # LevelZeroPos with the per-point scale.
    pos_zero = (pos_level + 0.5) * scale_pt[:, None] - 0.5
    return CoarseResult(
        found=(best_ssd < max_ssd) & active,
        pos_level=pos_zero,
        best_ssd=best_ssd,
    )


# ---------------------------------------------------------------------------
# Stage 4+5: inverse-composition subpixel refinement
# ---------------------------------------------------------------------------


class SubpixResult(NamedTuple):
    converged: jnp.ndarray  # [N] bool
    pos_zero: jnp.ndarray   # [N, 2] refined position, LEVEL-0 coords


@functools.partial(
    jax.jit, static_argnames=("max_iters", "half_patch", "conv_limit")
)
def iterate_subpix(
    img, templates: Templates, pos_zero, search_level, active,
    max_iters: int = 10, half_patch: int = 5, conv_limit: float = 0.03,
):
    """Batched IterateSubPixToConvergence (PatchFinder.cc:272-350) on ONE
    pyramid level: fixed-iteration loop with per-point converged/failed
    masks. pos_zero [N, 2] is the coarse result in LEVEL-0 coords; updates
    are scaled back by the level scale exactly as in the reference (:339).
    Sampling runs inside per-point regions (tile row-gathers +
    separable-bilinear matmuls; see ops.image.extract_regions).
    """
    P = 2 * half_patch + 1
    H, W = img.shape
    dtype = img.dtype
    scale = (2.0 ** search_level.astype(dtype))[:, None]
    inner = img_ops.patch_grid(half_patch - 1, dtype)  # [(P-2)^2, 2]
    gx = templates.grad_x.reshape(-1, (P - 2) * (P - 2))
    gy = templates.grad_y.reshape(-1, (P - 2) * (P - 2))
    tmpl_inner = templates.data[:, 1:-1, 1:-1].reshape(-1, (P - 2) * (P - 2))

    slab_half = half_patch + SUBPIX_TRAVEL
    center0 = (pos_zero + 0.5) / scale - 0.5
    origin = jnp.round(center0).astype(jnp.int32) - slab_half
    slabs, bases = img_ops.extract_regions(
        img, None, origin, 2 * slab_half + 1
    )
    base_f = bases.astype(dtype)

    def body(_, state):
        pos, mean_diff, converged, failed = state
        center_l = (pos + 0.5) / scale - 0.5  # LevelNPos
        # Off-edge check with border half_patch+1 on the rounded center
        # (PatchFinder.cc:299-303), plus the region-travel bound.
        ci = jnp.round(center_l)
        travel = jnp.abs(center_l - center0)
        off_edge = ~(
            (ci[:, 0] >= half_patch + 1)
            & (ci[:, 1] >= half_patch + 1)
            & (ci[:, 0] < W - half_patch - 1)
            & (ci[:, 1] < H - half_patch - 1)
            & (travel[:, 0] <= SUBPIX_TRAVEL - 1)
            & (travel[:, 1] <= SUBPIX_TRAVEL - 1)
        )
        failed = failed | (off_edge & ~converged & active)

        rel = (center_l - base_f)[:, None, :] + inner[None]
        target = img_ops.separable_bilinear(slabs, rel)
        diff = target - tmpl_inner + mean_diff[:, None]
        acc = jnp.stack(
            [
                jnp.sum(diff * gx, axis=-1),
                jnp.sum(diff * gy, axis=-1),
                jnp.sum(diff, axis=-1),
            ],
            axis=-1,
        )  # [N, 3]
        update = jnp.einsum("nij,nj->ni", templates.h_inv, acc)
        live = active & ~converged & ~failed
        step = jnp.where(live[:, None], update[:, :2] * scale, 0.0)
        pos = pos - step
        mean_diff = jnp.where(live, mean_diff - update[:, 2], mean_diff)
        upd_sq = jnp.sum(update[:, :2] ** 2, axis=-1)
        converged = converged | (live & (upd_sq < conv_limit * conv_limit))
        return pos, mean_diff, converged, failed

    N = pos_zero.shape[0]
    init = (
        pos_zero.astype(dtype),
        jnp.zeros(N, dtype),
        jnp.zeros(N, bool),
        jnp.zeros(N, bool),
    )
    pos, _, converged, failed = lax.fori_loop(0, max_iters, body, init)
    return SubpixResult(converged=converged & ~failed, pos_zero=pos)


# Slab half-extent for subpixel iteration: inner-patch half (half_patch-1)
# + 1 bilinear tap + travel budget. The reference converges at 0.03 px and
# starts from an integer-corner match, so total travel is a few pixels;
# points that wander off the slab are marked failed (they would fail the
# reference's off-edge check soon after anyway).
SUBPIX_TRAVEL = 6


@functools.partial(
    jax.jit, static_argnames=("max_iters", "half_patch", "conv_limit")
)
def iterate_subpix_multilevel(
    pyramid, templates: Templates, pos_zero, search_level, active,
    max_iters: int = 10, half_patch: int = 5, conv_limit: float = 0.03,
    kf_idx=None,
):
    """IterateSubPixToConvergence over ALL search levels in one pass.

    Per-level masked slab extraction at the coarse match position, then a
    single fixed-iteration inverse-composition loop for every point at
    once, sampling with separable-bilinear matmuls inside each point's own
    slab (no per-element gathers, no per-level loop replays).

    With kf_idx [N], `pyramid` entries are keyframe stacks [K, H_l, W_l]
    and each point refines inside its own target frame.
    """
    P = 2 * half_patch + 1
    N = pos_zero.shape[0]
    dtype = pos_zero.dtype
    slab_half = (half_patch - 1) + 1 + SUBPIX_TRAVEL
    slab = 2 * slab_half + 1
    G = img_ops.region_size(slab)
    scale = (2.0 ** search_level.astype(dtype))[:, None]

    slabs = jnp.zeros((N, G, G), dtype)
    bases = jnp.zeros((N, 2), jnp.int32)
    dims = jnp.zeros((N, 2), dtype)
    center0 = jnp.zeros((N, 2), dtype)
    for lvl in range(len(pyramid)):
        sel = active & (search_level == lvl)
        img = pyramid[lvl]
        H, W = img.shape[-2:]
        center_l = (pos_zero + 0.5) / (1 << lvl) - 0.5  # LevelNPos
        origin = jnp.round(center_l).astype(jnp.int32) - slab_half
        sl, b = img_ops.extract_regions(img, kf_idx, origin, slab)
        slabs = jnp.where(sel[:, None, None], sl, slabs)
        bases = jnp.where(sel[:, None], b, bases)
        dims = jnp.where(sel[:, None], jnp.asarray([W, H], dtype), dims)
        center0 = jnp.where(sel[:, None], center_l, center0)

    inner = img_ops.patch_grid(half_patch - 1, dtype)  # [(P-2)^2, 2]
    gx = templates.grad_x.reshape(-1, (P - 2) * (P - 2))
    gy = templates.grad_y.reshape(-1, (P - 2) * (P - 2))
    tmpl_inner = templates.data[:, 1:-1, 1:-1].reshape(-1, (P - 2) * (P - 2))
    base_f = bases.astype(dtype)

    def body(_, state):
        pos, mean_diff, converged, failed = state
        center_l = (pos + 0.5) / scale - 0.5
        ci = jnp.round(center_l)
        # Off-edge check with border half_patch+1 (PatchFinder.cc:299-303)
        # against the point's own level dims, plus the slab-travel bound
        # (the extracted region only covers +-SUBPIX_TRAVEL of motion).
        travel = jnp.abs(center_l - center0)
        off_edge = ~(
            (ci[:, 0] >= half_patch + 1)
            & (ci[:, 1] >= half_patch + 1)
            & (ci[:, 0] < dims[:, 0] - half_patch - 1)
            & (ci[:, 1] < dims[:, 1] - half_patch - 1)
            & (travel[:, 0] <= SUBPIX_TRAVEL - 1)
            & (travel[:, 1] <= SUBPIX_TRAVEL - 1)
        )
        failed = failed | (off_edge & ~converged & active)

        rel = (center_l - base_f)[:, None, :] + inner[None]
        target = img_ops.separable_bilinear(slabs, rel)
        diff = target - tmpl_inner + mean_diff[:, None]
        acc = jnp.stack(
            [
                jnp.sum(diff * gx, axis=-1),
                jnp.sum(diff * gy, axis=-1),
                jnp.sum(diff, axis=-1),
            ],
            axis=-1,
        )
        update = jnp.einsum("nij,nj->ni", templates.h_inv, acc)
        live = active & ~converged & ~failed
        step = jnp.where(live[:, None], update[:, :2] * scale, 0.0)
        pos = pos - step
        mean_diff = jnp.where(live, mean_diff - update[:, 2], mean_diff)
        upd_sq = jnp.sum(update[:, :2] ** 2, axis=-1)
        converged = converged | (live & (upd_sq < conv_limit * conv_limit))
        return pos, mean_diff, converged, failed

    init = (
        pos_zero.astype(dtype),
        jnp.zeros(N, dtype),
        jnp.zeros(N, bool),
        jnp.zeros(N, bool),
    )
    pos, _, converged, failed = lax.fori_loop(0, max_iters, body, init)
    return SubpixResult(converged=converged & ~failed, pos_zero=pos)


# ---------------------------------------------------------------------------
# MiniPatch: unwarped 9x9 SSD tracker for init trails
# ---------------------------------------------------------------------------


class MiniPatchResult(NamedTuple):
    found: jnp.ndarray  # [N]
    pos: jnp.ndarray    # [N, 2]


@functools.partial(
    jax.jit, static_argnames=("search_range", "half_patch", "max_ssd")
)
def find_minipatch(
    img, corner_mask, patches, pos, active,
    search_range: int = 10, half_patch: int = 4, max_ssd: int = 100000,
):
    """Batched MiniPatch::FindPatch (jni/MiniPatch.cc:32-70): plain SSD
    over FAST corners in a SQUARE box (the reference uses a bounding box,
    not a circle) of radius search_range. patches [N, 9, 9]; pos [N, 2]
    level-0 coords. max_ssd default matches the tracker's trail override
    (jni/Tracker.cc:226-227)."""
    N = patches.shape[0]
    P = 2 * half_patch + 1
    H, W = img.shape
    win_half = search_range + half_patch
    Wn = 2 * win_half + 1
    G = img_ops.region_size(Wn)
    n_off = G - P + 1

    origin = jnp.round(pos).astype(jnp.int32) - win_half
    windows, bases = img_ops.extract_regions(img, None, origin, Wn)
    mask_windows, _ = img_ops.extract_regions(
        corner_mask.astype(img.dtype), None, origin, Wn
    )

    sumsq_i = lax.reduce_window(
        windows * windows, 0.0, lax.add, (1, P, P), (1, 1, 1), "VALID"
    )
    cross = lax.conv_general_dilated(
        windows[None], patches[:, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=N,
        precision=lax.Precision.HIGHEST,
    )[0]
    t_sumsq = jnp.sum(patches * patches, axis=(-2, -1))
    ssd = sumsq_i - 2.0 * cross + t_sumsq[:, None, None]

    dys, dxs = jnp.mgrid[0:n_off, 0:n_off]
    cand_xy = (
        bases[:, None, None, :]
        + jnp.stack([dxs, dys], axis=-1)[None]
        + half_patch
    )
    is_corner = (
        mask_windows[:, half_patch : half_patch + n_off,
                     half_patch : half_patch + n_off]
        > 0.5
    )
    d = jnp.abs(cand_xy.astype(img.dtype) - pos[:, None, None, :])
    in_box = jnp.max(d, axis=-1) <= search_range  # square box, not circle
    in_img = (
        (cand_xy[..., 0] >= half_patch)
        & (cand_xy[..., 1] >= half_patch)
        & (cand_xy[..., 0] < W - half_patch)
        & (cand_xy[..., 1] < H - half_patch)
    )
    valid = is_corner & in_box & in_img & active[:, None, None]

    ssd_m = jnp.where(valid, ssd, jnp.inf).reshape(N, -1)
    best = jnp.argmin(ssd_m, axis=-1)
    best_ssd = jnp.take_along_axis(ssd_m, best[:, None], axis=-1)[:, 0]
    bx = bases[:, 0] + best % n_off + half_patch
    by = bases[:, 1] + best // n_off + half_patch
    return MiniPatchResult(
        found=best_ssd < max_ssd,
        pos=jnp.stack([bx, by], axis=-1).astype(img.dtype),
    )


def sample_minipatches(img, pos, half_patch=4):
    """Batched MiniPatch::SampleFromImage (jni/MiniPatch.cc:73-83):
    integer-centered patches. pos [N, 2]."""
    return jax.vmap(
        lambda c: img_ops.extract_patch(img, c, half_patch)
    )(jnp.round(pos).astype(jnp.int32))
