"""Map construction and maintenance: stereo init, keyframe integration,
epipolar point creation, re-find, outlier handling, plane alignment, and
local/global BA orchestration.

Capability parity with jni/MapMaker.{h,cc} — including the parts the
reference DISABLES (its mapping pthread is commented out,
MapMaker.cc:55-56; here every maintenance stage actually runs, dispatched
by the host driver between frames):

- InitFromStereo (MapMaker.cc:204-376): homography bootstrap, wiggle-scale
  0.1 baseline, per-match subpixel alignment + triangulation, 5x global BA,
  scene-depth refresh, 4-level epipolar growth, BA to convergence,
  dominant-plane alignment;
- AddKeyFrameFromTopOfQueue (:481-506): measurement registration, refind,
  epipolar growth at levels 3,0,1,2;
- ThinCandidates (:393-422): 10px exclusion against busy positions at the
  same/next level;
- AddPointEpipolar (:525-703): depth-range-clamped epipolar line in the
  closest keyframe, ZMSSD over implane corners near the line, subpixel,
  triangulation, new point + SRC_ROOT/SRC_EPIPOLAR measurements;
- ReFind_Common / InSingleKeyFrame / NewlyMade / FromFailureQueue
  (:967-1095): tracker-like point search (radius 4) with a never-retry
  mask;
- NeedNewKeyFrame / closest-keyframe distances (:710-773, factor 0.2);
- HandleBadPoints (:140-164): outliers > 20 and > inliers;
- CalcPlaneAligner (:1104-1231): 100 RANSAC trials, 0.05 inlier band,
  min-variance eigenvector, z=0 alignment;
- BundleAdjustAll / Recent / BundleAdjust (:776-960): adjust-set
  selection (newest + 4 nearest, fixed observers), sigma^2 = level-scale^2
  measurement noise, outlier routing (kill point if <= 2 good measurements
  or the SRC_ROOT went bad; retry SRC_TRACKER/SRC_EPIPOLAR via the failure
  queue; never-retry otherwise, :917-959).

TPU-native design: every per-candidate / per-point / per-(point, KF) loop
is one batched fixed-shape jitted stage; the epipolar search evaluates all
candidates of a level against all corners of the target level at once;
point insertion packs successes into free slots with a rank/scatter.
Host-side control (queues, stage priorities) lives in slam.py.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from visualslam_android_tpu.config import SLAMConfig
from visualslam_android_tpu.models import bundle as bundle_mod
from visualslam_android_tpu.models import keyframe as kf_mod
from visualslam_android_tpu.models import map_store, triangulate
from visualslam_android_tpu.models.map_store import (
    SRC_EPIPOLAR,
    SRC_REFIND,
    SRC_ROOT,
    SRC_TRACKER,
    SRC_TRAIL,
    SLAMMap,
)
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import image as img_ops
from visualslam_android_tpu.ops import lie, match
from visualslam_android_tpu.ops.levels import level_scale, level_zero_pos

N_LEVELS = 4

# Per-row corner capacity of the epipolar search's target-corner list
# (the fixed-shape analog of the reference's vCornerRowLUT,
# jni/KeyFrame.cc:43-49): rows denser than this drop their rightmost
# corners. The epipolar band is only ~2-5 level-pixels wide, so a line
# crosses each row in a handful of pixels; 32 kept corners per row is
# ample for the argmin to see every plausible match.
EPI_CORNERS_PER_ROW = 32


# ---------------------------------------------------------------------------
# Keyframe geometry helpers (MapMaker.cc:705-773)
# ---------------------------------------------------------------------------


def keyframe_distances(kfs, R, t):
    """Linear distance from pose (R, t) to every keyframe's camera center
    (KeyFrameLinearDist, MapMaker.cc:705-710). Invalid slots -> +inf."""
    c = -jnp.einsum("kji,kj->ki", kfs.R, kfs.t)  # camera centers
    c0 = -R.T @ t
    d = jnp.linalg.norm(c - c0[None], axis=-1)
    return jnp.where(kfs.valid, d, jnp.inf)


def closest_keyframe(kfs, R, t, exclude=-1):
    d = keyframe_distances(kfs, R, t)
    if exclude >= 0:
        d = d.at[exclude].set(jnp.inf)
    return jnp.argmin(d), jnp.min(d)


def need_new_keyframe(kfs, R, t, scene_depth_mean, wiggle_depth_norm,
                      max_kf_dist_mult=0.2):
    """NeedNewKeyFrame (MapMaker.cc:763-773; the port's mult is 0.2)."""
    _, d = closest_keyframe(kfs, R, t)
    d = d / jnp.maximum(scene_depth_mean, 1e-6)
    return d > max_kf_dist_mult * wiggle_depth_norm


def dist_to_nearest_excessive(kfs, R, t, wiggle_scale, factor=10.0):
    """IsDistanceToNearestKeyFrameExcessive (MapMaker.cc:1098-1101);
    `factor` is MapMakerConfig.kf_distance_factor (the reference's 10x)."""
    _, d = closest_keyframe(kfs, R, t)
    return d > wiggle_scale * factor


# ---------------------------------------------------------------------------
# Batched measurement insertion
# ---------------------------------------------------------------------------


# Eviction value order for full measurement rows (higher = keep longer).
# SRC_ROOT is never evicted (losing it kills the point's template source,
# apply_ba_result semantics / MapMaker.cc:932-937); re-findable SRC_REFIND
# goes first. The reference's per-KF std::map never drops observations
# (jni/KeyFrame.h:86) — this policy is the fixed-capacity analog.
_EVICT_VALUE = (1, 0, 9, 3, 2)  # index = SRC_* enum


def add_measurements_batch(meas, point_mask, kf_idx, uv, level, source,
                           subpix):
    """Insert one measurement per selected point into that point's first
    free observation slot. kf_idx/level may be scalars or [N].

    When a point's row is FULL, evict the lowest-value oldest slot
    (value order ``_EVICT_VALUE``; slots fill in order, so the first
    minimum is the oldest) — unless the incoming measurement's value is
    lower than everything present, in which case the incoming one is
    dropped instead. SRC_ROOT slots are never evicted."""
    N, O = meas.valid.shape
    free_slot = jnp.argmin(meas.valid.astype(jnp.int32), axis=1)  # [N]
    full = jnp.all(meas.valid, axis=1)

    value_lut = jnp.asarray(_EVICT_VALUE, jnp.int32)
    slot_value = jnp.where(
        meas.valid & (meas.source != SRC_ROOT),
        value_lut[jnp.clip(meas.source, 0, len(_EVICT_VALUE) - 1)],
        jnp.iinfo(jnp.int32).max,
    )  # [N, O]
    evict_slot = jnp.argmin(slot_value, axis=1)  # first min = oldest
    min_value = jnp.min(slot_value, axis=1)
    incoming_value = value_lut[
        jnp.clip(jnp.asarray(source), 0, len(_EVICT_VALUE) - 1)
    ]
    can_evict = full & (incoming_value >= min_value)

    slot = jnp.where(full, evict_slot, free_slot)
    ok = point_mask & (~full | can_evict)
    rows = jnp.arange(N)

    def upd(arr, val):
        cur = arr[rows, slot]
        mask = ok if cur.ndim == 1 else ok[:, None]
        return arr.at[rows, slot].set(jnp.where(mask, val, cur))

    kf_b = jnp.broadcast_to(jnp.asarray(kf_idx), (N,))
    lvl_b = jnp.broadcast_to(jnp.asarray(level), (N,))
    src_b = jnp.broadcast_to(jnp.asarray(source), (N,))
    sp_b = jnp.broadcast_to(jnp.asarray(subpix), (N,))
    return map_store.MeasStore(
        kf=upd(meas.kf, kf_b),
        uv=upd(meas.uv, uv),
        level=upd(meas.level, lvl_b),
        source=upd(meas.source, src_b),
        subpix=upd(meas.subpix, sp_b),
        valid=upd(meas.valid, ok),
    )


# ---------------------------------------------------------------------------
# ThinCandidates (MapMaker.cc:393-422)
# ---------------------------------------------------------------------------


def thin_candidates(slam_map: SLAMMap, kf_idx, level, radius=10):
    """Clear candidate slots of `kf_idx` at `level` that lie within
    `radius` (level coords) of an existing measurement at the same or
    next-higher level.

    TPU design: instead of a candidates x measurements distance matrix
    ([C, N, O] — 268 MB at the default 800x480 capacities), scatter the
    busy positions into a dense level-sized mask, dilate it with a disk
    kernel of the exclusion radius (one small conv), and gather the
    candidate positions — O(H*W) memory, identical rounded
    circular-exclusion semantics."""
    kfs, meas = slam_map.keyframes, slam_map.meas
    scale = level_scale(level)
    H, W = kfs.pyramid[level].shape[-2:]
    # Busy positions: measurements of this KF at level or level+1.
    busy = (
        meas.valid
        & (meas.kf == kf_idx)
        & ((meas.level == level) | (meas.level == level + 1))
    )  # [N, O]
    busy_xy = jnp.round(meas.uv / scale).astype(jnp.int32)  # [N, O, 2]
    # Inactive slots scatter to W/H (unambiguously out of bounds for
    # mode="drop"; a negative sentinel could wrap).
    bx = jnp.where(busy, jnp.clip(busy_xy[..., 0], 0, W), W).reshape(-1)
    by = jnp.where(busy, jnp.clip(busy_xy[..., 1], 0, H), H).reshape(-1)
    busy_mask = (
        jnp.zeros((H, W), jnp.float32).at[by, bx].set(1.0, mode="drop")
    )
    r = int(radius)
    # Circular dilation as (2r-1) row-shifted 1-D max-windows: a dense
    # [2r+1, 2r+1] disk conv has ONE channel, which XLA:TPU cannot tile
    # onto the MXU (measured 131 ms at 480x800 vs ~3 ms for this form).
    # Strict d^2 < r^2 on integer offsets, exactly as the reference's
    # squared-distance test (MapMaker.cc:404-416).
    near = jnp.zeros((H, W), jnp.float32)
    for dy in range(-(r - 1), r):
        wd = math.isqrt(max(r * r - dy * dy - 1, 0))
        if dy > 0:
            shifted = jnp.concatenate(
                [busy_mask[dy:], jnp.zeros((dy, W), jnp.float32)], axis=0
            )
        elif dy < 0:
            shifted = jnp.concatenate(
                [jnp.zeros((-dy, W), jnp.float32), busy_mask[:dy]], axis=0
            )
        else:
            shifted = busy_mask
        row_dil = lax.reduce_window(
            shifted, 0.0, lax.max, (1, 2 * wd + 1), (1, 1), "SAME"
        )
        near = jnp.maximum(near, row_dil)
    cand = kfs.cand_xy[level][kf_idx]  # [C, 2] int32
    blocked = (
        near[jnp.clip(cand[:, 1], 0, H - 1),
             jnp.clip(cand[:, 0], 0, W - 1)] > 0.5
    )
    new_valid = kfs.cand_valid[level].at[kf_idx].set(
        kfs.cand_valid[level][kf_idx] & ~blocked
    )
    cv = list(kfs.cand_valid)
    cv[level] = new_valid
    return slam_map._replace(
        keyframes=kfs._replace(cand_valid=tuple(cv))
    )


# ---------------------------------------------------------------------------
# AddPointEpipolar, batched over all candidates of one level
# (MapMaker.cc:525-703)
# ---------------------------------------------------------------------------


class EpipolarResult(NamedTuple):
    success: jnp.ndarray     # [C]
    pos_w: jnp.ndarray       # [C, 3] triangulated world points
    src_uv: jnp.ndarray      # [C, 2] level-0 source positions
    target_uv: jnp.ndarray   # [C, 2] level-0 subpixel target positions


def select_top_candidates(cand_xy, cand_ok, max_n: int):
    """Compact the `max_n` best valid candidates into a fixed slab.

    Candidate slots are stored in descending Shi-Tomasi order
    (fast.top_k_corners), so a stable valid-first argsort keeps that
    ranking. Bounds the epipolar search's C axis BEFORE the search
    (insert_new_points can only take max_epi_candidates successes anyway
    — searching the full per-level candidate capacity was wasted work)."""
    if cand_ok.shape[0] <= max_n:
        return cand_xy, cand_ok
    order = jnp.argsort(~cand_ok, stable=True)[:max_n]
    return cand_xy[order], cand_ok[order]


@functools.partial(jax.jit, static_argnames=("level", "config"))
def epipolar_search(
    slam_map: SLAMMap, src_kf, target_kf, cam, level: int,
    config: SLAMConfig,
) -> EpipolarResult:
    """Batched epipolar point search: the best valid candidates of src_kf
    at `level` (bounded to max_epi_candidates) against the corners of
    target_kf at the same level."""
    kfs = slam_map.keyframes
    dtype = kfs.t.dtype
    cand_xy, cand_ok = select_top_candidates(
        kfs.cand_xy[level][src_kf].astype(dtype),
        kfs.cand_valid[level][src_kf],
        config.mapmaker.max_epi_candidates,
    )
    return epipolar_search_cands(
        slam_map, src_kf, target_kf, cam, level, config, cand_xy, cand_ok
    )


def epipolar_search_cands(
    slam_map: SLAMMap, src_kf, target_kf, cam, level: int,
    config: SLAMConfig, cand_xy, cand_ok,
) -> EpipolarResult:
    """epipolar_search over an explicit candidate slab [C, 2]/[C] — the
    entry point parallel/sharded_mapping.py shards over the candidate
    axis (each device takes a candidate block against the replicated
    target level)."""
    mc, pc_cfg = config.mapmaker, config.patch
    kfs = slam_map.keyframes
    dtype = kfs.t.dtype
    scale = level_scale(level)

    C = cand_xy.shape[0]
    root = level_zero_pos(cand_xy, level)  # [C, 2] level-0

    Rs, ts = kfs.R[src_kf], kfs.t[src_kf]
    Rt, tt = kfs.R[target_kf], kfs.t[target_kf]

    # Source rays (normalized) rotated into the target camera.
    m_src = cam_ops.unproject(cam, root)
    ray_sc = jnp.concatenate([m_src, jnp.ones((C, 1), dtype)], -1)
    ray_sc = ray_sc / jnp.linalg.norm(ray_sc, axis=-1, keepdims=True)
    line_dir = jnp.einsum("ij,jk,ck->ci", Rt, Rs.T, ray_sc)

    # Depth range clamp (MapMaker.cc:552-568).
    d_mean = kfs.depth_mean[src_kf]
    d_sigma = kfs.depth_sigma[src_kf]
    start_d = jnp.maximum(mc.wiggle_scale, d_mean - d_sigma)
    end_d = jnp.minimum(
        mc.epipolar_depth_max_factor * mc.wiggle_scale, d_mean + d_sigma
    )
    cam_center_tc = jnp.einsum("ij,j->i", Rt, -Rs.T @ ts) + tt
    ray_start = cam_center_tc[None] + start_d * line_dir
    ray_end = cam_center_tc[None] + end_d * line_dir

    ok = cand_ok
    ok &= ray_end[:, 2] > ray_start[:, 2]
    ok &= ray_end[:, 2] > 0.0
    # Nudge starts behind the camera (MapMaker.cc:577-579).
    need_nudge = ray_start[:, 2] <= 0.0
    safe_dz = jnp.where(
        jnp.abs(line_dir[:, 2]) < 1e-12, 1e-12, line_dir[:, 2]
    )
    nudge = (0.001 - ray_start[:, 2]) / safe_dz
    ray_start = jnp.where(
        need_nudge[:, None], ray_start + line_dir * nudge[:, None], ray_start
    )

    a2 = ray_start[:, :2] / ray_start[:, 2:3]
    b2 = ray_end[:, :2] / ray_end[:, 2:3]
    along = a2 - b2
    seg_len_sq = jnp.sum(along * along, axis=-1)
    ok &= seg_len_sq >= 1e-8
    along = along / jnp.sqrt(jnp.maximum(seg_len_sq, 1e-20))[:, None]
    normal = jnp.stack([along[:, 1], -along[:, 0]], -1)
    norm_dist = jnp.sum(a2 * normal, axis=-1)
    largest_r = cam_ops.largest_radius_in_image(cam)
    ok &= jnp.abs(norm_dist) <= largest_r
    proj_a = jnp.sum(along * a2, -1)
    proj_b = jnp.sum(along * b2, -1)
    min_len = jnp.clip(jnp.minimum(proj_a, proj_b) - 0.05, -2.0, 2.0)
    max_len = jnp.clip(jnp.maximum(proj_a, proj_b) + 0.05, -2.0, 2.0)

    # Templates: no-warp patches at the candidates (MapMaker.cc:604-609).
    tmpl = match.make_templates_nowarp(
        kfs.pyramid[level], jnp.full((C,), src_kf, jnp.int32), cand_xy,
        pc_cfg.half_patch_size,
    )
    ok &= ~tmpl.bad

    # Target corners: a capacity-bounded corner LIST from the dense mask,
    # scored segment-locally. The reference scans only corners near the
    # line (implane corner cache, MapMaker.cc:527-540, ZMSSD loop
    # :611-634); the r1-r3 design instead scored EVERY pixel of the level
    # for every candidate — a dense [C, H, W] ZMSSD needing ~6 GB per
    # buffer at the default 800x480 capacities, the structural blocker
    # for full SLAM at reference scale. Here: per-corner patch statistics
    # come from dense window sums (one gather each), the per-(candidate,
    # corner) cross term is ONE [C, P^2] x [P^2, M] matmul on the MXU,
    # and the epipolar band is a [C, M] mask — same argmin semantics,
    # ~1000x less compute and O(C*M) memory.
    img_t = kfs.pyramid[level][target_kf]
    corner_mask = kfs.corner_mask[level][target_kf]
    H, W = img_t.shape
    hp = pc_cfg.half_patch_size
    n = 2 * hp + 1
    n_pix = n * n
    ys_g = jnp.arange(H)[:, None]
    xs_g = jnp.arange(W)[None, :]
    inb = (
        (ys_g >= hp) & (ys_g < H - hp) & (xs_g >= hp) & (xs_g < W - hp)
    )
    cm = corner_mask & inb  # ZMSSD patch border (as the old border_ok)
    # Per-ROW compaction (the fixed-capacity analog of the reference's
    # vCornerRowLUT, KeyFrame.cc:43-49): up to EPI_CORNERS_PER_ROW corner
    # x-positions per image row, so capacity overflow in dense texture
    # drops corners uniformly instead of biasing one image region.
    B = min(EPI_CORNERS_PER_ROW, W)
    order = jnp.argsort(~cm, axis=1, stable=True)[:, :B]  # [H, B]
    row_count = jnp.sum(cm, axis=1)  # [H]
    cx = order.reshape(-1)
    cy = jnp.broadcast_to(
        jnp.arange(H)[:, None], (H, B)
    ).reshape(-1)
    corner_ok = (
        jnp.arange(B)[None] < row_count[:, None]
    ).reshape(-1)
    M = H * B

    czero = level_zero_pos(
        jnp.stack([cx, cy], -1).astype(dtype), level
    )  # [M, 2]
    implane_m = cam_ops.unproject(cam, czero)  # [M, 2]
    dist_diff = norm_dist[:, None] - jnp.einsum(
        "mi,ci->cm", implane_m, normal
    )
    one_px = cam_ops.one_pixel_dist(cam)
    max_dd = one_px * (4.0 + 1.0 * scale)
    along_proj = jnp.einsum("mi,ci->cm", implane_m, along)
    band = (
        (dist_diff * dist_diff <= max_dd * max_dd)
        & (along_proj >= min_len[:, None])
        & (along_proj <= max_len[:, None])
        & corner_ok[None]
    )  # [C, M]

    # Per-corner patch sums (dense window sums -> one scalar gather each)
    # and patch pixels (integer-centered gather, as make_templates_nowarp).
    sum_i = lax.reduce_window(
        img_t, 0.0, lax.add, (n, n), (1, 1), "SAME"
    )
    sumsq_i = lax.reduce_window(
        img_t * img_t, 0.0, lax.add, (n, n), (1, 1), "SAME"
    )
    sum_m = sum_i[cy, cx]      # [M]
    sumsq_m = sumsq_i[cy, cx]  # [M]
    oy, ox = jnp.mgrid[-hp:hp + 1, -hp:hp + 1]
    py = jnp.clip(cy[:, None] + oy.reshape(-1)[None], 0, H - 1)
    px_ = jnp.clip(cx[:, None] + ox.reshape(-1)[None], 0, W - 1)
    patches = img_t[py, px_]  # [M, P^2]
    cross = jnp.einsum(
        "cp,mp->cm", tmpl.data.reshape(C, -1), patches,
        precision=lax.Precision.HIGHEST,
    )
    ssd = (
        sumsq_m[None]
        + tmpl.t_sumsq[:, None]
        - 2.0 * cross
        - (tmpl.t_sum[:, None] - sum_m[None]) ** 2 / n_pix
    )
    max_ssd = pc_cfg.max_ssd_per_pixel * n_pix
    ssd = jnp.where(band & ok[:, None], ssd, jnp.inf)
    best = jnp.argmin(ssd, axis=1)  # [C]
    best_ssd = jnp.take_along_axis(ssd, best[:, None], 1)[:, 0]
    ok &= best_ssd < max_ssd
    best_zero = level_zero_pos(
        jnp.stack([cx[best], cy[best]], -1).astype(dtype), level
    )

    # Subpixel refinement in the target (MapMaker.cc:636-646).
    sp = match.iterate_subpix(
        img_t, tmpl, best_zero,
        jnp.full((C,), level, jnp.int32), ok,
        max_iters=pc_cfg.subpix_max_iters, half_patch=hp,
        conv_limit=pc_cfg.subpix_converged,
    )
    ok &= sp.converged

    # Triangulate in the SOURCE frame then lift to world
    # (ReprojectPoint in frame of A=src: MapMaker.cc:648-650 triangulates
    # in target frame with se3 src-from-target; equivalently use both
    # world poses directly).
    m_t = cam_ops.unproject(cam, sp.pos_zero)
    Rs_b = jnp.broadcast_to(Rs, (C, 3, 3))
    ts_b = jnp.broadcast_to(ts, (C, 3))
    Rt_b = jnp.broadcast_to(Rt, (C, 3, 3))
    tt_b = jnp.broadcast_to(tt, (C, 3))
    pos_w = triangulate.triangulate(Rs_b, ts_b, Rt_b, tt_b, m_src, m_t)
    # Behind-camera check in the source frame (MapMaker.cc:313-316 does
    # this for stereo init; same sanity here).
    z_src = triangulate.depth_in_camera(Rs_b, ts_b, pos_w)
    z_tgt = triangulate.depth_in_camera(Rt_b, tt_b, pos_w)
    ok &= (z_src > 0) & (z_tgt > 0)

    return EpipolarResult(
        success=ok, pos_w=pos_w, src_uv=root, target_uv=sp.pos_zero
    )


def insert_new_points(
    slam_map: SLAMMap, cam, res: EpipolarResult, src_kf, target_kf,
    level: int, max_new: int,
):
    """Pack successful epipolar candidates into free point slots with
    SRC_ROOT (source) + SRC_EPIPOLAR (target) measurements. Returns
    (map, new_point_mask[N])."""
    pts, meas = slam_map.points, slam_map.meas
    N = pts.n_slots
    C = res.success.shape[0]
    dtype = pts.pos_w.dtype

    free = ~pts.valid  # [N]
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free
    n_free = jnp.sum(free)
    # Rank successes; candidate i goes to the free slot with its rank.
    succ_rank = jnp.cumsum(res.success.astype(jnp.int32)) - 1
    take = res.success & (succ_rank < jnp.minimum(n_free, max_new))

    # slot_of_rank[r] = index of the r-th free slot. Candidates that are
    # not taken scatter to index N, dropped out of range — duplicate
    # in-range indices would make the scatter order-dependent.
    slot_of_rank = jnp.argsort(~free)  # free slots first, stable
    cand_slot = jnp.where(
        take, slot_of_rank[jnp.clip(succ_rank, 0, N - 1)], N
    )  # [C]

    scale = level_scale(level)
    cand_lvl_xy = (res.src_uv + 0.5) / scale - 0.5
    c_nc, r_nc, d_nc, n_nc = kf_mod.candidate_rays(
        cam, cand_lvl_xy, level
    )

    def scat(arr, val):
        return arr.at[cand_slot].set(val, mode="drop")

    pts = pts._replace(
        valid=scat(pts.valid, jnp.ones(C, bool)),
        bad=scat(pts.bad, jnp.zeros(C, bool)),
        pos_w=scat(pts.pos_w, res.pos_w),
        source_kf=scat(pts.source_kf, jnp.full((C,), src_kf, jnp.int32)),
        source_level=scat(
            pts.source_level, jnp.full((C,), level, jnp.int32)
        ),
        center=scat(pts.center, cand_lvl_xy),
        center_nc=scat(pts.center_nc, c_nc),
        right_nc=scat(pts.right_nc, r_nc),
        down_nc=scat(pts.down_nc, d_nc),
        normal_nc=scat(pts.normal_nc, n_nc),
        inlier_count=scat(pts.inlier_count, jnp.zeros(C, jnp.int32)),
        outlier_count=scat(pts.outlier_count, jnp.zeros(C, jnp.int32)),
        # Per-point sampled color at creation (the capability of
        # KeyFrame.cc:82-93 / MapMaker.cc:661-663, minus their
        # uninitialized-copy bug): bilinear source-level intensity.
        color_gray=scat(
            pts.color_gray,
            img_ops.bilinear_sample(
                slam_map.keyframes.pyramid[level][src_kf], cand_lvl_xy
            ),
        ),
    )
    new_mask = (
        jnp.zeros(N, bool).at[cand_slot].set(True, mode="drop") & pts.valid
    )

    # Clear meas rows of the new points, then add the two measurements.
    clear = new_mask[:, None]
    meas = meas._replace(valid=meas.valid & ~clear)
    src_uv_n = jnp.zeros((N, 2), dtype).at[cand_slot].set(
        res.src_uv, mode="drop"
    )
    tgt_uv_n = jnp.zeros((N, 2), dtype).at[cand_slot].set(
        res.target_uv, mode="drop"
    )
    meas = add_measurements_batch(
        meas, new_mask, src_kf, src_uv_n, level, SRC_ROOT, True
    )
    meas = add_measurements_batch(
        meas, new_mask, target_kf, tgt_uv_n, level, SRC_EPIPOLAR, True
    )
    sm = slam_map._replace(points=pts, meas=meas)
    sm = sm._replace(
        points=map_store.refresh_pixel_vectors(sm.points, sm.keyframes)
    )
    return sm, new_mask


# ---------------------------------------------------------------------------
# ReFind (MapMaker.cc:967-1095)
# ---------------------------------------------------------------------------


def _refind_search_core(
    pts, slabs, R, t, target_pyramid, target_corner_mask, cam, active,
    config,
):
    """The pure search half of ReFind_Common against ONE target keyframe,
    expressed purely in point-major arrays + the single target frame:
    project the `active` points at pose (R, t), warp templates from the
    pre-extracted source slabs, coarse search radius 4, subpixel if
    level > 0 (8 iterations). Returns (found [N], pos_zero [N, 2],
    search_level [N], did_subpix [N]).

    Every input is either per-point (pts fields, slabs, active) or
    O(one frame) (pose, target pyramid/corner masks) — so this core can
    run inside a point-sharded region without replicating the keyframe
    store (parallel/sharded_mapping.sharded_refind_scalable)."""
    N = pts.n_slots
    dtype = pts.pos_w.dtype
    tc = config.tracker

    image_size = jnp.asarray([tc.width, tc.height], dtype)
    pc = jnp.einsum("ij,nj->ni", R, pts.pos_w) + t
    z_ok = pc[:, 2] > 0.001
    safe_z = jnp.where(z_ok, pc[:, 2], 1.0)
    m = pc[:, :2] / safe_z[:, None]
    radius = cam_ops.largest_radius_in_image(cam)
    r_ok = jnp.sum(m * m, -1) <= radius * radius
    px, derivs = cam_ops.project_derivs(cam, m)
    in_img = (
        (px[:, 0] >= 0) & (px[:, 1] >= 0)
        & (px[:, 0] <= image_size[0]) & (px[:, 1] <= image_size[1])
    )
    proj_ok = z_ok & r_ok & in_img

    motion_right = jnp.einsum("ij,nj->ni", R, pts.pixel_right_w)
    motion_down = jnp.einsum("ij,nj->ni", R, pts.pixel_down_w)
    warp_inv, search_level, warp_ok = match.calc_search_level_and_warp(
        pc, motion_right, motion_down, derivs,
        det_lo=config.patch.warp_det_lo, det_hi=config.patch.warp_det_hi,
    )
    active_t = active & proj_ok & warp_ok

    # Warped templates from the pre-extracted source slabs.
    hp = config.patch.half_patch_size
    tmpl = match.make_templates_from_slabs(
        slabs, pts.center, warp_inv, search_level, hp
    )
    active_t = active_t & ~tmpl.bad

    # Coarse search radius 4 (MapMaker.cc:1014), per search level.
    found = jnp.zeros(N, bool)
    pos_zero = px
    for lvl in range(N_LEVELS):
        sel = active_t & (search_level == lvl)
        scale = 1 << lvl
        pred_l = (px + 0.5) / scale - 0.5
        res = match.find_patch_coarse(
            target_pyramid[lvl], target_corner_mask[lvl], tmpl,
            pred_l, jnp.ceil(jnp.full((N,), 4.0) / scale), sel,
            search_range=4,
        )
        found = jnp.where(sel, res.found, found)
        pz = (res.pos_level + 0.5) * scale - 0.5
        pos_zero = jnp.where(sel[:, None], pz, pos_zero)

    # Subpixel only when level > 0 (MapMaker.cc:1026-1035).
    did_subpix = jnp.zeros(N, bool)
    for lvl in range(1, N_LEVELS):
        sel = active_t & found & (search_level == lvl)
        res = match.iterate_subpix(
            target_pyramid[lvl], tmpl, pos_zero, search_level, sel,
            max_iters=8,  # refind uses 8, not subpix_max_iters (:1022)
            half_patch=hp, conv_limit=config.patch.subpix_converged,
        )
        # NB reference keeps the measurement even if subpix fails to
        # converge here (it doesn't check the return, MapMaker.cc:1028).
        pos_zero = jnp.where(
            (sel & res.converged)[:, None], res.pos_zero, pos_zero
        )
        did_subpix = did_subpix | sel

    found = found & active_t
    return found, pos_zero, search_level, did_subpix


def _refind_search(slam_map: SLAMMap, kf_idx, cam, active, config,
                   slabs=None):
    """ReFind search against keyframe `kf_idx` of the map: extract source
    slabs (unless the caller pre-extracted them — they are kf_idx
    independent), slice out the target frame, run the point-major core.
    vmap-able over kf_idx/active with slabs closed over —
    refind_in_keyframes_batched does exactly that."""
    pts, kfs = slam_map.points, slam_map.keyframes
    if slabs is None:
        slabs = match.extract_template_slabs(
            kfs.pyramid, pts.source_kf, pts.source_level, pts.center
        )
    target_pyramid = tuple(p[kf_idx] for p in kfs.pyramid)
    target_corner_mask = tuple(c[kf_idx] for c in kfs.corner_mask)
    return _refind_search_core(
        pts, slabs, kfs.R[kf_idx], kfs.t[kf_idx], target_pyramid,
        target_corner_mask, cam, active, config,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def refind_in_keyframe(
    slam_map: SLAMMap, kf_idx, cam, point_mask, config: SLAMConfig,
):
    """Batched ReFind_Common over `point_mask` points in one keyframe:
    project at the KF pose, warped template, coarse search radius 4,
    subpixel if level > 0 (8 iterations). Returns
    (slam_map, found_mask, never_retry_new): measurements are added for
    found points; never_retry_new marks (point, this-KF) failures."""
    pts, meas = slam_map.points, slam_map.meas
    already = map_store.point_observed_in(meas, kf_idx)
    active = point_mask & pts.live() & ~already
    found, pos_zero, search_level, did_subpix = _refind_search(
        slam_map, kf_idx, cam, active, config
    )
    meas = add_measurements_batch(
        meas, found, kf_idx, pos_zero, search_level, SRC_REFIND, did_subpix
    )
    never_retry_new = active & ~found
    return slam_map._replace(meas=meas), found, never_retry_new


@functools.partial(jax.jit, static_argnames=("config",))
def refind_in_keyframes_batched(
    slam_map: SLAMMap, cam, point_mask_kn, config: SLAMConfig,
):
    """ReFindNewlyMade / ReFindFromFailureQueue over ALL keyframes in ONE
    dispatch (the SURVEY §7.7 points x KFs stage; replaces the host loop
    of one jitted call per keyframe — jni/MapMaker.cc:1061-1095):

    - the pure search half is vmapped over the keyframe axis (each lane
      matches the full point set against its own keyframe's pyramid);
    - measurement insertion then replays sequentially over keyframes in a
      lax.scan so slot allocation/eviction semantics are identical to the
      per-keyframe loop.

    point_mask_kn [K, N]: per-keyframe point selection (the caller folds
    in keyframe validity and its never-retry bookkeeping). Returns
    (slam_map, found_kn [K, N], never_retry_new_kn [K, N])."""
    pts, kfs, meas = slam_map.points, slam_map.keyframes, slam_map.meas
    K = kfs.n_slots
    kf_idxs = jnp.arange(K)
    already = jax.vmap(
        lambda k: map_store.point_observed_in(meas, k)
    )(kf_idxs)  # [K, N]
    active = (
        point_mask_kn & pts.live()[None] & ~already
        & kfs.valid[:, None]
    )
    # Source slabs are kf-independent: extract ONCE, close over the vmap.
    slabs = match.extract_template_slabs(
        kfs.pyramid, pts.source_kf, pts.source_level, pts.center
    )
    # Chunked vmap over the keyframe axis: a flat K-lane vmap
    # materializes [K, N, ...] search intermediates (~GBs at the default
    # 800x480 capacities); lax.map's batch_size bounds that to 4 lanes
    # at a time. (frame_step's scheduler tasks use the Q-bounded
    # refind_pairs instead; this full K x N form remains the oracle the
    # parity tests and the sharded path check against.)
    found, pos_zero, search_level, did_subpix = lax.map(
        lambda ka: _refind_search(
            slam_map, ka[0], cam, ka[1], config, slabs
        ),
        (kf_idxs, active), batch_size=min(4, K),
    )

    def body(m, xs):
        k, f, p, lvl, sp = xs
        return add_measurements_batch(m, f, k, p, lvl, SRC_REFIND, sp), None

    meas, _ = lax.scan(
        body, meas, (kf_idxs, found, pos_zero, search_level, did_subpix)
    )
    never_retry_new = active & ~found
    return slam_map._replace(meas=meas), found, never_retry_new


def refind_pairs(slam_map: SLAMMap, pair_pt, pair_kf, pair_ok, cam,
                 config: SLAMConfig):
    """ReFind_Common over an EXPLICIT (point, keyframe) pair list [Q]:
    project point pair_pt[q] into keyframe pair_kf[q], warp its template,
    coarse-search radius 4, subpixel (8 iters) when level > 0.

    This is the budgeted form of the points x keyframes re-find
    (MapMaker.cc:1061-1095): the pending set is sparse (new points, or
    failure-queue entries), so compacting it to Q pairs bounds one
    dispatch's work to ~one tracking frame's search cost — instead of the
    K-lane vmap of the full point set, whose [K, N, P, P] intermediates
    exhaust HBM at the default 800x480 capacities (K=64, N=4096).

    Returns (found, pos_zero, search_level, did_subpix), each [Q]."""
    pts, kfs = slam_map.points, slam_map.keyframes
    dtype = pts.pos_w.dtype
    tc = config.tracker
    hp = config.patch.half_patch_size
    Q = pair_pt.shape[0]

    pos_w = pts.pos_w[pair_pt]
    R = kfs.R[pair_kf]   # [Q, 3, 3]
    t = kfs.t[pair_kf]   # [Q, 3]
    pc = jnp.einsum("qij,qj->qi", R, pos_w) + t
    z_ok = pc[:, 2] > 0.001
    safe_z = jnp.where(z_ok, pc[:, 2], 1.0)
    m = pc[:, :2] / safe_z[:, None]
    radius = cam_ops.largest_radius_in_image(cam)
    r_ok = jnp.sum(m * m, -1) <= radius * radius
    px, derivs = cam_ops.project_derivs(cam, m)
    image_size = jnp.asarray([tc.width, tc.height], dtype)
    in_img = (
        (px[:, 0] >= 0) & (px[:, 1] >= 0)
        & (px[:, 0] <= image_size[0]) & (px[:, 1] <= image_size[1])
    )
    proj_ok = z_ok & r_ok & in_img

    motion_right = jnp.einsum("qij,qj->qi", R, pts.pixel_right_w[pair_pt])
    motion_down = jnp.einsum("qij,qj->qi", R, pts.pixel_down_w[pair_pt])
    warp_inv, search_level, warp_ok = match.calc_search_level_and_warp(
        pc, motion_right, motion_down, derivs,
        det_lo=config.patch.warp_det_lo, det_hi=config.patch.warp_det_hi,
    )
    active = pair_ok & proj_ok & warp_ok

    slabs = match.extract_template_slabs(
        kfs.pyramid, pts.source_kf[pair_pt], pts.source_level[pair_pt],
        pts.center[pair_pt],
    )
    tmpl = match.make_templates_from_slabs(
        slabs, pts.center[pair_pt], warp_inv, search_level, hp
    )
    active = active & ~tmpl.bad

    # Coarse search radius 4 (MapMaker.cc:1014), each pair against its
    # own target keyframe's level image.
    res = match.find_patch_coarse_multilevel(
        kfs.pyramid, kfs.corner_mask, tmpl, px, search_level,
        jnp.full((Q,), 4.0, dtype), active, max_range=4, half_patch=hp,
        kf_idx=pair_kf,
    )
    found = res.found & active
    pos_zero = jnp.where(found[:, None], res.pos_level, px)

    # Subpixel only when level > 0 (MapMaker.cc:1026-1035); the reference
    # keeps the measurement even if subpix fails to converge (:1028).
    sub_sel = found & (search_level > 0)
    sp = match.iterate_subpix_multilevel(
        kfs.pyramid, tmpl, pos_zero, search_level, sub_sel,
        max_iters=8, half_patch=hp,
        conv_limit=config.patch.subpix_converged, kf_idx=pair_kf,
    )
    pos_zero = jnp.where(
        (sub_sel & sp.converged)[:, None], sp.pos_zero, pos_zero
    )
    return found, pos_zero, search_level, sub_sel


# ---------------------------------------------------------------------------
# HandleBadPoints (MapMaker.cc:140-164)
# ---------------------------------------------------------------------------


def handle_bad_points(slam_map: SLAMMap, config: SLAMConfig):
    pts, meas = slam_map.points, slam_map.meas
    newly_bad = (
        pts.valid
        & (pts.outlier_count > config.mapmaker.max_outliers)
        & (pts.outlier_count > pts.inlier_count)
    )
    bad = pts.bad | newly_bad
    meas = meas._replace(valid=meas.valid & ~bad[:, None])
    # Trash-equivalent: clear the slot entirely so it can be reused.
    pts = pts._replace(bad=jnp.zeros_like(bad), valid=pts.valid & ~bad)
    return slam_map._replace(points=pts, meas=meas), newly_bad


# ---------------------------------------------------------------------------
# Global map transforms (MapMaker.cc:440-467)
# ---------------------------------------------------------------------------


def apply_global_transformation(slam_map: SLAMMap, R_new, t_new):
    """ApplyGlobalTransformationToMap: KF poses right-multiplied by the
    inverse, points transformed forward."""
    kfs, pts = slam_map.keyframes, slam_map.points
    Ri, ti = lie.se3_inverse(R_new, t_new)
    R2, t2 = lie.se3_mul(kfs.R, kfs.t, jnp.broadcast_to(Ri, kfs.R.shape),
                         jnp.broadcast_to(ti, kfs.t.shape))
    kfs = kfs._replace(R=R2, t=t2)
    pts = pts._replace(
        pos_w=lie.se3_apply(R_new, t_new, pts.pos_w)
    )
    sm = slam_map._replace(keyframes=kfs, points=pts)
    return sm._replace(
        points=map_store.refresh_pixel_vectors(sm.points, sm.keyframes)
    )


def apply_global_scale(slam_map: SLAMMap, scale):
    kfs, pts = slam_map.keyframes, slam_map.points
    kfs = kfs._replace(t=kfs.t * scale)
    pts = pts._replace(pos_w=pts.pos_w * scale)
    sm = slam_map._replace(keyframes=kfs, points=pts)
    return sm._replace(
        points=map_store.refresh_pixel_vectors(sm.points, sm.keyframes)
    )


# ---------------------------------------------------------------------------
# CalcPlaneAligner (MapMaker.cc:1104-1231)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config",))
def calc_plane_aligner(slam_map: SLAMMap, key, config: SLAMConfig):
    """RANSAC dominant plane -> SE3 putting it at z=0. Returns (R, t,
    valid): valid False when fewer than 10 points (reference returns
    identity then). Jitted: one dispatch instead of an eager ~200-op
    chain (remote-link latency)."""
    mc = config.mapmaker
    pts = slam_map.points
    live = pts.live()
    N = pts.n_slots
    dtype = pts.pos_w.dtype
    n_live = jnp.sum(live)

    p = live.astype(dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(
        key, N, shape=(mc.plane_ransac_trials, 3), p=p
    )
    tri = pts.pos_w[idx]  # [T, 3, 3]
    mean = jnp.mean(tri, axis=1)
    nrm = jnp.cross(tri[:, 2] - tri[:, 0], tri[:, 1] - tri[:, 0])
    nlen = jnp.linalg.norm(nrm, axis=-1)
    nrm = nrm / jnp.maximum(nlen, 1e-12)[:, None]
    degenerate = nlen < 1e-12

    diff = pts.pos_w[None] - mean[:, None]  # [T, N, 3]
    nd = jnp.abs(jnp.einsum("tnc,tc->tn", diff, nrm))
    nd = jnp.minimum(nd, mc.plane_inlier_threshold)
    score = jnp.sum(jnp.where(live[None], nd, 0.0), axis=-1)
    score = jnp.where(degenerate, jnp.inf, score)
    best = jnp.argmin(score)
    bmean, bnorm = mean[best], nrm[best]

    d = jnp.abs(jnp.einsum("nc,c->n", pts.pos_w - bmean, bnorm))
    inlier = live & (d < mc.plane_inlier_threshold)
    w = inlier.astype(dtype)
    nin = jnp.maximum(jnp.sum(w), 1.0)
    mean_in = jnp.sum(pts.pos_w * w[:, None], 0) / nin
    centered = (pts.pos_w - mean_in) * w[:, None]
    cov = jnp.einsum("ni,nj->ij", centered, centered)
    evals, evecs = jnp.linalg.eigh(cov)
    normal = evecs[:, 0]  # min-variance direction
    normal = jnp.where(normal[2] > 0, -normal, normal)

    # Build rotation with z-row = normal (MapMaker.cc:1210-1224).
    row0 = jnp.asarray([1.0, 0.0, 0.0], dtype)
    row0 = row0 - normal * jnp.dot(row0, normal)
    row0 = row0 / jnp.maximum(jnp.linalg.norm(row0), 1e-12)
    row1 = jnp.cross(normal, row0)
    R = jnp.stack([row0, row1, normal])
    t = -(R @ mean_in)
    return R, t, n_live >= 10


# ---------------------------------------------------------------------------
# BA set selection + problem construction (MapMaker.cc:776-960)
# ---------------------------------------------------------------------------


def build_ba_problem(slam_map: SLAMMap, adjust_mask, config: SLAMConfig):
    """BAProblem over keyframes in `adjust_mask` (free) with every other
    observing keyframe fixed; points are those observed by the adjust set
    (all other points are excluded via point_valid)."""
    pts, kfs, meas = slam_map.points, slam_map.keyframes, slam_map.meas
    # Points observed by any adjust keyframe.
    obs_in_adjust = meas.valid & adjust_mask[meas.kf]
    pt_in = jnp.any(obs_in_adjust, axis=1) & pts.live()
    # Fixed set: valid KFs not in the adjust set (observers or not —
    # including non-observers only adds empty rows of S, masked anyway),
    # plus the permanently-fixed first KF.
    fixed = kfs.valid & (~adjust_mask | kfs.fixed)
    noise = 2.0 ** meas.level.astype(pts.pos_w.dtype)
    return bundle_mod.BAProblem(
        cam_R=kfs.R, cam_t=kfs.t,
        cam_fixed=fixed | ~kfs.valid,
        cam_valid=kfs.valid,
        points=pts.pos_w,
        point_valid=pt_in,
        meas_kf=meas.kf,
        meas_uv=meas.uv,
        meas_sqrt_inv_noise=jnp.where(meas.valid, 1.0 / noise, 1.0),
        meas_valid=meas.valid & pt_in[:, None],
    )


def local_ba_adjust_mask(slam_map: SLAMMap, newest_kf, config: SLAMConfig):
    """BundleAdjustRecent's adjust set: newest KF + its 4 nearest
    neighbors (MapMaker.cc:801-824); caller should skip local BA entirely
    when the map has < 8 keyframes (the reference bails)."""
    kfs = slam_map.keyframes
    d = keyframe_distances(kfs, kfs.R[newest_kf], kfs.t[newest_kf])
    d = d.at[newest_kf].set(jnp.inf)
    _, nearest = lax.top_k(-d, config.mapmaker.local_ba_neighbors)
    mask = jnp.zeros(kfs.n_slots, bool).at[newest_kf].set(True)
    mask = mask.at[nearest].set(True)
    return mask & kfs.valid & ~kfs.fixed


def apply_ba_result(slam_map: SLAMMap, prob, res, config: SLAMConfig):
    """Write a BAResult back into the map and route outliers
    (MapMaker.cc:906-959): a point dies if it has <= 2 remaining good
    measurements or its SRC_ROOT measurement was ejected; SRC_TRACKER /
    SRC_EPIPOLAR ejections go to the failure queue (returned as a mask);
    others are never retried (also returned)."""
    pts, kfs, meas = slam_map.points, slam_map.keyframes, slam_map.meas
    kfs = kfs._replace(R=res.cam_R, t=res.cam_t)
    pts = pts._replace(pos_w=res.points)

    ej = res.outlier_meas  # [N, O]
    remaining = jnp.sum(res.meas_valid.astype(jnp.int32), axis=1)
    root_ejected = jnp.any(ej & (meas.source == SRC_ROOT), axis=1)
    point_dies = pts.valid & (
        (jnp.any(ej, axis=1) & (remaining <= 2)) | root_ejected
    )
    retry = ej & (
        (meas.source == SRC_TRACKER) | (meas.source == SRC_EPIPOLAR)
    ) & ~point_dies[:, None]
    never = ej & ~retry & ~point_dies[:, None]

    meas = meas._replace(valid=res.meas_valid & ~point_dies[:, None])
    pts = pts._replace(valid=pts.valid & ~point_dies)
    sm = slam_map._replace(points=pts, keyframes=kfs, meas=meas)
    sm = sm._replace(
        points=map_store.refresh_pixel_vectors(sm.points, sm.keyframes)
    )
    # (kf indices of the ejected slots for the queues)
    return sm, retry, never, point_dies
