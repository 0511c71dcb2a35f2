"""FAST segment-test corner detection as a Pallas TPU kernel.

The reference implements FAST-10 as ~9k lines of machine-generated
per-pixel decision trees (jni/vision/cvfast.cpp:6088-9242). The dense jnp
formulation (ops/fast.py) is already vectorized but materializes 16
ring-shifted image copies plus 16+16 comparison masks in HBM; this kernel
strip-mines the image through VMEM instead — each grid step DMAs one
row-strip (plus a 3-row halo) from HBM, forms the 16 ring views with
in-VMEM rolls, and emits the corner mask and old-style score
(cvfast.cpp:9337-9369) for that strip with a single HBM read and write per
pixel.

Semantics are identical to ops.fast.detect: a pixel is a corner iff
`arc_length` CONTIGUOUS ring pixels are all brighter than center+threshold
or all darker than center-threshold (strict), the 3px ring border is
excluded, and score = max(sum of brightness excesses, sum of darkness
excesses) over the 16-pixel Bresenham ring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visualslam_android_tpu.ops.fast import RING_OFFSETS

# Ring radius of the FAST Bresenham circle.
RING = 3
# Rows of halo DMA'd above/below each strip. 8 (not 3) keeps both the DMA
# offset and the slice height aligned to the f32 sublane tiling (8, 128).
HALO = 8
STRIP = 128


def _roll2(x, dy, dx):
    """view[y, x] = x[y+dy, x+dx] with wraparound (edges are excluded by
    the border mask downstream)."""
    out = x
    if dy:
        out = pltpu.roll(out, -dy % out.shape[0], 0)
    if dx:
        out = pltpu.roll(out, -dx % out.shape[1], 1)
    return out


def _fast_strip_kernel(img_hbm, mask_ref, score_ref, scratch, sem, *,
                       threshold, arc_length, H, W, n_strips):
    i = pl.program_id(0)
    row0 = i * STRIP
    Hp = n_strips * STRIP
    # Load the strip plus halo (clamped at image top/bottom; `local` is
    # where the strip's first row lands inside the scratch buffer).
    off = pl.multiple_of(
        jnp.clip(row0 - HALO, 0, Hp - (STRIP + 2 * HALO)), 8
    )
    local = row0 - off
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(off, STRIP + 2 * HALO), :], scratch, sem
    )
    dma.start()
    dma.wait()

    img = scratch[:]
    hi = img + threshold
    lo = img - threshold

    bright = []
    dark = []
    sp = jnp.zeros_like(img)
    sn = jnp.zeros_like(img)
    for dx, dy in RING_OFFSETS:
        v = _roll2(img, dy, dx)
        bright.append(v > hi)
        dark.append(v < lo)
        sp = sp + jnp.maximum(v - hi, 0.0)
        sn = sn + jnp.maximum(lo - v, 0.0)

    def has_arc(flags):
        # AND of arc_length circularly-consecutive flags via doubling
        # (a[k] & a[k+1], then stride-2, stride-4, ...), then OR over the
        # 16 possible start positions.
        acc = list(flags)
        span = 1
        while span * 2 <= arc_length:
            acc = [acc[k] & acc[(k + span) % 16] for k in range(16)]
            span *= 2
        rem = arc_length - span
        if rem:
            acc = [acc[k] & acc[(k + rem) % 16] for k in range(16)]
        out = acc[0]
        for k in range(1, 16):
            out = out | acc[k]
        return out

    corner = has_arc(bright) | has_arc(dark)

    # Exclude the ring border of the IMAGE (absolute coordinates; W is the
    # true width — the x test also masks the lane padding).
    Sh, Wp = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (Sh, Wp), 0) + off
    xs = jax.lax.broadcasted_iota(jnp.int32, (Sh, Wp), 1)
    inb = (
        (ys >= RING) & (ys < H - RING) & (xs >= RING) & (xs < W - RING)
    )
    corner = corner & inb
    score = jnp.maximum(sp, sn)

    # `local` (strip start inside the scratch buffer) is 0 for the first
    # strip, 2*HALO for the last, HALO otherwise — write with static
    # slices per case (Mosaic has no dynamic_slice on values).
    del local

    @pl.when(i == 0)
    def _():
        mask_ref[:] = corner[0:STRIP]
        score_ref[:] = score[0:STRIP]

    @pl.when((i > 0) & (i < n_strips - 1))
    def _():
        mask_ref[:] = corner[HALO:HALO + STRIP]
        score_ref[:] = score[HALO:HALO + STRIP]

    @pl.when((i == n_strips - 1) & (i > 0))
    def _():
        mask_ref[:] = corner[2 * HALO:2 * HALO + STRIP]
        score_ref[:] = score[2 * HALO:2 * HALO + STRIP]


def _detect_single(img, threshold: int, arc_length: int,
                   interpret: bool):
    H, W = img.shape
    n_strips = -(-max(H, STRIP + 2 * HALO) // STRIP)
    Hp = n_strips * STRIP
    Wp = 128 * -(-W // 128)  # lane tiling: DMA slices need W % 128 == 0
    if (Hp, Wp) != (H, W):
        imgp = jnp.pad(img, ((0, Hp - H), (0, Wp - W)))
    else:
        imgp = img

    kernel = functools.partial(
        _fast_strip_kernel,
        threshold=float(threshold), arc_length=arc_length,
        H=H, W=W, n_strips=n_strips,
    )
    mask, score = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((STRIP, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STRIP, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hp, Wp), jnp.bool_),
            jax.ShapeDtypeStruct((Hp, Wp), img.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((STRIP + 2 * HALO, Wp), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(imgp)
    return mask[:H, :W], score[:H, :W]


@functools.lru_cache(maxsize=None)
def _detect_vmappable(threshold: int, arc_length: int, interpret: bool):
    """Per-static-config detector with an explicit vmap rule. Mosaic
    cannot lower a batch dimension added to the strip grid by vmap (the
    HBM block would need a non-trivial index_map), so batching — e.g.
    multi-stream replicated tracking vmapping the whole frame front-end —
    is defined as a sequential lax.map over the batch: each stream still
    runs the full strip-mined kernel."""

    @jax.custom_batching.custom_vmap
    def f(img):
        return _detect_single(img, threshold, arc_length, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, img):  # noqa: ANN001
        (img_batched,) = in_batched
        if not img_batched:
            # vmap over some OTHER argument with a shared image: detect
            # once and broadcast the outputs across the batch.
            mask, score = f(img)
            out = (
                jnp.broadcast_to(mask[None], (axis_size, *mask.shape)),
                jnp.broadcast_to(score[None], (axis_size, *score.shape)),
            )
            return out, (True, True)
        out = jax.lax.map(f, img)
        return out, (True, True)

    return f


@functools.partial(
    jax.jit, static_argnames=("threshold", "arc_length", "interpret")
)
def detect(img, threshold: int, arc_length: int = 10,
           interpret: bool = False):
    """Pallas FAST detector; same contract as ops.fast.detect.

    interpret=True runs the kernel in the Pallas interpreter (for CPU
    tests); on TPU leave it False. vmap-safe: batched calls map the
    kernel over the leading axis (see _detect_vmappable).
    """
    return _detect_vmappable(int(threshold), arc_length, interpret)(img)
