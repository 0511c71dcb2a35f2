"""Dense FAST corner detection: segment test, score, non-max suppression,
and top-k candidate selection.

Capability parity with the reference's machine-generated detectors
(jni/vision/cvfast.{h,cpp}): ``cvCornerFast_10`` (cvfast.cpp:6088-9242, the
one the pipeline uses — jni/KeyFrame.cc:32-39), the FAST-9 variant
(cvfast.cpp:122-183), ``old_style_corner_score`` (cvfast.cpp:9337-9369:
score = max(sum of brightness excesses, sum of darkness excesses) over the
16-pixel Bresenham ring) and ``nonmax_suppression`` (cvfast.cpp:9243-9335:
a corner survives unless an 8-neighbor corner has strictly greater score —
we do not replicate its i-1/i+1 indexing typo at :9284, catalogued in
SURVEY.md §6).

TPU-native design: instead of a ~9k-line per-pixel decision tree, the
segment test runs as a dense vectorized computation over the whole image —
16 shifted views, threshold comparisons, and a circular AND-reduction for
the contiguous-arc test. Output is a dense corner mask + score map (the
TPU-friendly replacement for the reference's raster-ordered corner vectors
and row LUTs, KeyFrame.cc:43-49); sparse corner lists for host logic come
from `top_k_corners`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Bresenham circle of radius 3, clockwise; (dx, dy) order as in
# compute_fast_score_old's pointer_dir (cvfast.cpp:9374-9391).
RING_OFFSETS = (
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
)


def _ring_stack(img):
    """[16, H, W] of ring-shifted copies (edge-padded; the 3px border is
    masked out of detection anyway)."""
    H, W = img.shape[-2:]
    padded = jnp.pad(img, [(3, 3), (3, 3)], mode="edge")
    views = [
        lax.dynamic_slice(padded, (3 + dy, 3 + dx), (H, W))
        for dx, dy in RING_OFFSETS
    ]
    return jnp.stack(views, axis=0)


def detect(img, threshold: int, arc_length: int = 10):
    """FAST segment test: (corner_mask[H, W], score[H, W]).

    A pixel is a corner iff `arc_length` CONTIGUOUS ring pixels are all
    brighter than center + threshold or all darker than center - threshold
    (strict comparisons, as in cvCornerFast_10). arc_length=10 matches the
    detector the reference actually uses; 9 gives the FAST-9 variant.

    score is old_style_corner_score (cvfast.cpp:9337-9369) evaluated with
    the same threshold as the detection barrier.

    Dispatch is at LOWERING time (platform_dependent): on CPU the dense
    jnp formulation below runs; everywhere else the strip-mined Pallas
    kernel (ops/fast_pallas.py) does — one HBM read/write per pixel
    instead of 16 materialized ring shifts. Score values in the 3px ring
    border differ between the two (edge-pad vs wraparound); no consumer
    reads them (corners exclude the border).
    """
    from visualslam_android_tpu.ops import fast_pallas

    return jax.lax.platform_dependent(
        img,
        cpu=functools.partial(
            _detect_jnp, threshold=threshold, arc_length=arc_length
        ),
        default=functools.partial(
            fast_pallas.detect, threshold=threshold, arc_length=arc_length
        ),
    )


@functools.partial(jax.jit, static_argnames=("threshold", "arc_length"))
def _detect_jnp(img, threshold: int, arc_length: int = 10):
    ring = _ring_stack(img)  # [16, H, W]
    hi = img + threshold
    lo = img - threshold
    bright = ring > hi[None]
    dark = ring < lo[None]

    def has_arc(flags):
        # AND of arc_length circularly-consecutive flags, then OR over the
        # 16 possible arc start positions.
        acc = flags
        for k in range(1, arc_length):
            acc = acc & jnp.roll(flags, -k, axis=0)
        return jnp.any(acc, axis=0)

    corner = has_arc(bright) | has_arc(dark)
    # Exclude the 3px border where the ring leaves the image.
    corner = corner.at[:3, :].set(False).at[-3:, :].set(False)
    corner = corner.at[:, :3].set(False).at[:, -3:].set(False)

    sp = jnp.sum(jnp.maximum(ring - hi[None], 0.0), axis=0)
    sn = jnp.sum(jnp.maximum(lo[None] - ring, 0.0), axis=0)
    score = jnp.maximum(sp, sn)
    return corner, score


@jax.jit
def nonmax_3x3(corner_mask, score):
    """Non-max suppression over the 8-neighborhood, comparing only against
    other corners (nonmax_suppression semantics, cvfast.cpp:9243-9335:
    suppressed iff a neighboring corner's score is strictly greater)."""
    s = jnp.where(corner_mask, score, -1.0)
    neigh_max = lax.reduce_window(
        s, -jnp.inf, lax.max, (3, 3), (1, 1), [(1, 1), (1, 1)]
    )
    # s >= neigh_max means no strictly-greater neighbor (self included).
    return corner_mask & (s >= neigh_max)


@functools.partial(jax.jit, static_argnames=("k", "border"))
def top_k_corners(mask, score, k: int, border: int = 0):
    """Select up to k corners by score: returns (xy[k, 2] int32, valid[k]).

    The TPU replacement for dynamically-sized corner vectors: fixed-shape
    top-k over the masked dense score map. Corners closer than `border` to
    the edge are excluded (KeyFrame.cc:65 uses border 10 for candidates).
    """
    H, W = mask.shape
    s = jnp.where(mask, score, -jnp.inf)
    if border > 0:
        ys = jnp.arange(H)[:, None]
        xs = jnp.arange(W)[None, :]
        inb = (
            (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
        )
        s = jnp.where(inb, s, -jnp.inf)
    flat = s.reshape(-1)
    vals, idx = lax.top_k(flat, k)
    xy = jnp.stack([idx % W, idx // W], axis=-1).astype(jnp.int32)
    return xy, vals > -jnp.inf


def corner_count(mask):
    return jnp.sum(mask.astype(jnp.int32))
