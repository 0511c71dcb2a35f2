"""Fixed-shape struct-of-arrays map storage.

Capability parity with the reference's data model (SURVEY.md §2 #18):
``Map`` = points + keyframes + trash (jni/Map.{h,cc}), ``MapPoint`` = world
position + patch-source info + warp basis + inlier/outlier counts
(jni/MapPoint.h:22-69), ``KeyFrame`` = pose + 4-level pyramid with corners
and candidates + measurements + scene-depth stats + SBI
(jni/KeyFrame.h:74-97).

TPU-native design (SURVEY.md §7 "Design stance"): arrays, not object
graphs. Points and keyframes live in padded slots with validity masks; the
reference's trash-list memory discipline (Map.h:5-10 — never free, so stale
pointers stay valid) becomes simply clearing a slot's valid bit, since
nothing holds pointers. Measurements are stored point-major in a fixed
[N, O_max] table (replacing std::map<MapPoint*, Measurement>,
KeyFrame.h:86), which makes bundle-adjustment block structure and sharding
over point blocks natural.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from visualslam_android_tpu.config import SLAMConfig

# Measurement sources (KeyFrame.h:60 enum).
SRC_TRACKER = 0
SRC_REFIND = 1
SRC_ROOT = 2
SRC_TRAIL = 3
SRC_EPIPOLAR = 4


class FrameData(NamedTuple):
    """Per-frame products of the tracker's front-end
    (MakeKeyFrame_Lite, jni/KeyFrame.cc:5-51): pyramid + dense FAST corner
    masks/scores (replacing corner vectors + row LUTs)."""

    pyramid: Tuple[jnp.ndarray, ...]       # [H_l, W_l] f32, level 0..3
    corner_mask: Tuple[jnp.ndarray, ...]   # [H_l, W_l] bool
    corner_score: Tuple[jnp.ndarray, ...]  # [H_l, W_l] f32


class FrameExtras(NamedTuple):
    """Products of MakeKeyFrame_Rest (jni/KeyFrame.cc:53-101): nonmax
    corners, Shi-Tomasi candidate selections, SBI."""

    nonmax_mask: Tuple[jnp.ndarray, ...]  # [H_l, W_l] bool
    cand_xy: Tuple[jnp.ndarray, ...]      # [C_l, 2] int32 level coords
    cand_valid: Tuple[jnp.ndarray, ...]   # [C_l] bool
    cand_score: Tuple[jnp.ndarray, ...]   # [C_l] f32 Shi-Tomasi scores
    sbi_template: jnp.ndarray              # [h_sbi, w_sbi]
    sbi_jacs: jnp.ndarray                  # [h_sbi, w_sbi, 2]


class KeyFrameStore(NamedTuple):
    """K padded keyframe slots."""

    valid: jnp.ndarray        # [K] bool
    fixed: jnp.ndarray        # [K] bool (first stereo KF, KeyFrame.h:80)
    R: jnp.ndarray            # [K, 3, 3] camera-from-world rotation
    t: jnp.ndarray            # [K, 3]
    pyramid: Tuple[jnp.ndarray, ...]      # [K, H_l, W_l]
    corner_mask: Tuple[jnp.ndarray, ...]  # [K, H_l, W_l] bool (all corners)
    cand_xy: Tuple[jnp.ndarray, ...]      # [K, C_l, 2]
    cand_valid: Tuple[jnp.ndarray, ...]   # [K, C_l] (cleared when consumed)
    depth_mean: jnp.ndarray   # [K] scene depth stats (KeyFrame.h:92-93)
    depth_sigma: jnp.ndarray  # [K]
    sbi_template: jnp.ndarray  # [K, h_sbi, w_sbi]
    sbi_jacs: jnp.ndarray      # [K, h_sbi, w_sbi, 2]

    @property
    def n_slots(self):
        return self.valid.shape[0]

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


class PointStore(NamedTuple):
    """N padded map-point slots (MapPoint.h:22-69)."""

    valid: jnp.ndarray         # [N] slot in use
    bad: jnp.ndarray           # [N] flagged bad (trash-equivalent)
    pos_w: jnp.ndarray         # [N, 3]
    source_kf: jnp.ndarray     # [N] int32
    source_level: jnp.ndarray  # [N] int32
    center: jnp.ndarray        # [N, 2] source-level coords (irCenter)
    center_nc: jnp.ndarray     # [N, 3] unit ray to patch center
    right_nc: jnp.ndarray      # [N, 3] unit ray one pixel right
    down_nc: jnp.ndarray       # [N, 3] unit ray one pixel down
    normal_nc: jnp.ndarray     # [N, 3] patch plane normal (0,0,-1)
    pixel_right_w: jnp.ndarray  # [N, 3] world-frame one-pixel-right
    pixel_down_w: jnp.ndarray   # [N, 3] world-frame one-pixel-down
    inlier_count: jnp.ndarray   # [N] int32 (MapPoint.h:63-65)
    outlier_count: jnp.ndarray  # [N] int32
    # Per-point sampled source intensity (the reference samples per-point
    # RGB from the camera frame, KeyFrame.cc:82-93 / MapMaker.cc:661-663
    # — though its stored copies are uninitialized, a bug SURVEY.md §6
    # documents and this build does NOT replicate: we sample the source
    # pyramid level bilinearly at creation. The pipeline is grayscale, so
    # one channel).
    color_gray: jnp.ndarray     # [N] f32 0..255

    @property
    def n_slots(self):
        return self.valid.shape[0]

    def live(self):
        return self.valid & ~self.bad

    def count(self):
        return jnp.sum(self.live().astype(jnp.int32))


class MeasStore(NamedTuple):
    """Point-major measurement table: up to O_max observations per point
    (replaces per-KF std::map<MapPoint*, Measurement>, KeyFrame.h:86)."""

    kf: jnp.ndarray      # [N, O] int32 observing keyframe slot
    uv: jnp.ndarray      # [N, O, 2] level-0 pixel position (v2RootPos)
    level: jnp.ndarray   # [N, O] int32 pyramid level
    source: jnp.ndarray  # [N, O] int32 SRC_* enum
    subpix: jnp.ndarray  # [N, O] bool (Measurement::bSubPix)
    valid: jnp.ndarray   # [N, O] bool

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


class SLAMMap(NamedTuple):
    """The whole map (jni/Map.h:29-31) plus its measurement table."""

    points: PointStore
    keyframes: KeyFrameStore
    meas: MeasStore
    good: jnp.ndarray  # [] bool (Map::bGood)


def empty_map(config: SLAMConfig, dtype=jnp.float32) -> SLAMMap:
    tc, mc = config.tracker, config.mapmaker
    N = tc.max_map_points
    K = mc.max_keyframes
    O = config.bundle.max_obs_per_point
    shapes = tc.pyramid_shapes
    cand_caps = tc.max_corners_per_level
    sbi_h, sbi_w = shapes[-1][0] // 2, shapes[-1][1] // 2

    points = PointStore(
        valid=jnp.zeros(N, bool),
        bad=jnp.zeros(N, bool),
        pos_w=jnp.zeros((N, 3), dtype),
        source_kf=jnp.zeros(N, jnp.int32),
        source_level=jnp.zeros(N, jnp.int32),
        center=jnp.zeros((N, 2), dtype),
        center_nc=jnp.zeros((N, 3), dtype),
        right_nc=jnp.zeros((N, 3), dtype),
        down_nc=jnp.zeros((N, 3), dtype),
        normal_nc=jnp.zeros((N, 3), dtype),
        pixel_right_w=jnp.zeros((N, 3), dtype),
        pixel_down_w=jnp.zeros((N, 3), dtype),
        inlier_count=jnp.zeros(N, jnp.int32),
        outlier_count=jnp.zeros(N, jnp.int32),
        color_gray=jnp.zeros(N, dtype),
    )
    keyframes = KeyFrameStore(
        valid=jnp.zeros(K, bool),
        fixed=jnp.zeros(K, bool),
        R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (K, 3, 3)),
        t=jnp.zeros((K, 3), dtype),
        pyramid=tuple(jnp.zeros((K, h, w), dtype) for h, w in shapes),
        corner_mask=tuple(jnp.zeros((K, h, w), bool) for h, w in shapes),
        cand_xy=tuple(
            jnp.zeros((K, c, 2), jnp.int32) for c in cand_caps
        ),
        cand_valid=tuple(jnp.zeros((K, c), bool) for c in cand_caps),
        depth_mean=jnp.ones(K, dtype),
        depth_sigma=jnp.ones(K, dtype),
        sbi_template=jnp.zeros((K, sbi_h, sbi_w), dtype),
        sbi_jacs=jnp.zeros((K, sbi_h, sbi_w, 2), dtype),
    )
    meas = MeasStore(
        kf=jnp.zeros((N, O), jnp.int32),
        uv=jnp.zeros((N, O, 2), dtype),
        level=jnp.zeros((N, O), jnp.int32),
        source=jnp.zeros((N, O), jnp.int32),
        subpix=jnp.zeros((N, O), bool),
        valid=jnp.zeros((N, O), bool),
    )
    return SLAMMap(
        points=points, keyframes=keyframes, meas=meas,
        good=jnp.asarray(False),
    )


def refresh_pixel_vectors(points: PointStore, kfs: KeyFrameStore) -> PointStore:
    """Batched MapPoint::RefreshPixelVectors (jni/MapPoint.cc:4-29): world
    displacement vectors for one source pixel right/down, induced by the
    patch plane (normal assumed facing the source camera)."""
    R = kfs.R[points.source_kf]  # [N, 3, 3]
    t = kfs.t[points.source_kf]
    plane_c = jnp.einsum("nij,nj->ni", R, points.pos_w) + t
    cam_height = jnp.abs(jnp.sum(plane_c * points.normal_nc, axis=-1))

    def on_plane(ray):
        rate = jnp.abs(jnp.sum(ray * points.normal_nc, axis=-1))
        rate = jnp.maximum(rate, 1e-10)
        return ray * (cam_height / rate)[:, None]

    center_p = on_plane(points.center_nc)
    right_p = on_plane(points.right_nc)
    down_p = on_plane(points.down_nc)
    Rt = jnp.swapaxes(R, -1, -2)
    pixel_right_w = jnp.einsum("nij,nj->ni", Rt, right_p - center_p)
    pixel_down_w = jnp.einsum("nij,nj->ni", Rt, down_p - center_p)
    return points._replace(
        pixel_right_w=pixel_right_w, pixel_down_w=pixel_down_w
    )


def first_free_slot(valid):
    """Index of the first unused slot (or argmin over an all-True array —
    callers must check capacity via `valid.all()`)."""
    return jnp.argmin(valid.astype(jnp.int32))


def meas_kf_mask(meas: MeasStore, kf_idx):
    """[N, O] mask of measurements belonging to keyframe kf_idx."""
    return meas.valid & (meas.kf == kf_idx)


def point_observed_in(meas: MeasStore, kf_idx):
    """[N] mask of points with a valid measurement in keyframe kf_idx."""
    return jnp.any(meas_kf_mask(meas, kf_idx), axis=-1)


def add_measurement(meas: MeasStore, point_idx, kf_idx, uv, level, source,
                    subpix):
    """Insert one measurement into the first free observation slot of
    `point_idx` (no-op if the point's O_max slots are full)."""
    row_valid = meas.valid[point_idx]
    slot = jnp.argmin(row_valid.astype(jnp.int32))
    ok = ~jnp.all(row_valid)
    upd = lambda arr, val: arr.at[point_idx, slot].set(
        jnp.where(ok, val, arr[point_idx, slot])
    )
    return MeasStore(
        kf=upd(meas.kf, kf_idx),
        uv=upd(meas.uv, uv),
        level=upd(meas.level, level),
        source=upd(meas.source, source),
        subpix=upd(meas.subpix, subpix),
        valid=upd(meas.valid, ok),
    )
