"""Per-frame tracking: PVS projection, coarse/fine patch search, robust
Gauss-Newton pose update, motion model, SBI rotation prior, quality
assessment.

Capability parity with the reference Tracker (jni/Tracker.cc):

- PVS construction: project every map point, check z > 0.001 / largest
  radius / image bounds (TrackerData::Project, jni/TrackerData.h:69-95),
  camera derivatives, warp matrix + search level
  (Tracker::TrackMap PVS loop, Tracker.cc:369-392);
- coarse stage: up to 60 level-3/level-2 points (level 3 preferred, random
  subset), search radius 30, 8 subpixel iterations, 10 GN updates with
  reprojection each iteration, sigma override 1.0 after iteration 5
  (Tracker.cc:404-490; doubled budget/range after recovery :427-432);
- fine stage: all level-3 points (8 subpix its) + up to
  (1000 - so-far) random others (no subpix), radius 10 (5 after coarse),
  10 GN iterations, nonlinear reprojection at iterations {0, 4, 9} and
  linearized updates otherwise, sigma override 16.0 after iteration 5,
  outlier marking on the last iteration (Tracker.cc:495-577);
- pose update: Tukey M-estimator with MAD sigma, WLS with prior 100,
  level-scaled sqrt-inverse-noise (CalcPoseUpdate, Tracker.cc:683-774 —
  without the reference's (int) residual-quantization bug, SURVEY.md §6);
- decaying-velocity motion model with SBI rotation override
  (ApplyMotionModel / UpdateMotionModel, Tracker.cc:781-820, decay
  0.9 * (0.5 motion + 0.5 old));
- tracking-quality assessment (found/attempted fractions, 0.3 / 0.13,
  Tracker.cc:832-878);
- SBI rotation prior: ESM-align this frame's SBI to the last frame's and
  lift to SO(3) (CalcSBIRotation, Tracker.cc:885-893).

TPU-native design: the whole of TrackMap is ONE jitted fixed-shape program
over all N point slots. Dynamic sets (PVS, coarse subset, random 1000-patch
budget) are boolean masks with random-priority top-k selection; per-level
dispatch is four masked passes; the GN loop is unrolled (10 iterations)
with reprojection/linear-update selected per iteration exactly as in the
reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from visualslam_android_tpu.config import SLAMConfig
from visualslam_android_tpu.models.map_store import FrameData, SLAMMap
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import image as img_ops
from visualslam_android_tpu.ops import lie, match
from visualslam_android_tpu.ops import mestimator as me
from visualslam_android_tpu.ops import sbi as sbi_ops
from visualslam_android_tpu.ops.levels import level_n_pos

N_LEVELS = 4


class TrackOutputs(NamedTuple):
    R: jnp.ndarray              # [3, 3] updated camera-from-world
    t: jnp.ndarray              # [3]
    found: jnp.ndarray          # [N] measurement success per point slot
    found_pos: jnp.ndarray      # [N, 2] level-0 positions (v2Found)
    search_level: jnp.ndarray   # [N]
    did_subpix: jnp.ndarray     # [N]
    attempted_per_level: jnp.ndarray  # [4] int32
    found_per_level: jnp.ndarray      # [4] int32
    inlier_inc: jnp.ndarray     # [N] int32 (nMEstimatorInlierCount deltas)
    outlier_inc: jnp.ndarray    # [N] int32
    scene_depth_mean: jnp.ndarray
    scene_depth_sigma: jnp.ndarray
    depth_stats_valid: jnp.ndarray  # [] bool (>20 found, Tracker.cc:619)
    did_coarse: jnp.ndarray     # [] bool


# ---------------------------------------------------------------------------
# PVS: project all points and compute warp/search levels
# ---------------------------------------------------------------------------


def project_points(cam, pts_w, R, t, image_size):
    """Batched TrackerData::Project (jni/TrackerData.h:69-95)."""
    pc = jnp.einsum("ij,nj->ni", R, pts_w) + t
    z_ok = pc[:, 2] > 0.001
    safe_z = jnp.where(z_ok, pc[:, 2], 1.0)
    m = pc[:, :2] / safe_z[:, None]
    radius = cam_ops.largest_radius_in_image(cam)
    r_ok = jnp.sum(m * m, axis=-1) <= radius * radius
    px, derivs = cam_ops.project_derivs(cam, m)
    in_img = (
        (px[:, 0] >= 0)
        & (px[:, 1] >= 0)
        & (px[:, 0] <= image_size[0])
        & (px[:, 1] <= image_size[1])
    )
    return pc, px, derivs, z_ok & r_ok & in_img


def _point_jacobian(pc, derivs):
    """Batched TrackerData::CalcJacobian (jni/TrackerData.h:104-132):
    d pixel / d mu for mu = [trans(3), rot(3)] left-multiplied motion.
    z is guarded: empty point slots can sit at the camera center, and an
    inf Jacobian would turn weight-0 products into NaN."""
    safe_z = jnp.where(jnp.abs(pc[:, 2]) > 1e-6, pc[:, 2], 1.0)
    inv_z = 1.0 / safe_z
    x, y, z = pc[:, 0], pc[:, 1], safe_z
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # Generator fields applied to (pc, 1): translations then rotations.
    motions = [
        (one, zero, zero),
        (zero, one, zero),
        (zero, zero, one),
        (zero, -z, y),
        (z, zero, -x),
        (-y, x, zero),
    ]
    cols = []
    for mx, my, mz in motions:
        dm = jnp.stack(
            [(mx - x * mz * inv_z) * inv_z, (my - y * mz * inv_z) * inv_z],
            axis=-1,
        )
        cols.append(jnp.einsum("nab,nb->na", derivs, dm))
    return jnp.stack(cols, axis=-1)  # [N, 2, 6]


# ---------------------------------------------------------------------------
# Multi-level search (SearchForPoints, Tracker.cc:629-674)
# ---------------------------------------------------------------------------


def _search_multi_level(
    frame: FrameData, templates, pred_zero, search_level, active,
    radius_zero, max_range: int, subpix_mask, subpix_iters: int,
    subpix_conv: float = 0.03,
):
    """Coarse ZMSSD + optional subpixel over all four search levels in one
    fused pass each. radius_zero [N] is the per-point level-0 radius
    (traced); max_range bounds the static window."""
    res = match.find_patch_coarse_multilevel(
        frame.pyramid, frame.corner_mask, templates, pred_zero,
        search_level, radius_zero, active, max_range=max_range,
    )
    found = res.found
    pos_zero = jnp.where(active[:, None], res.pos_level, pred_zero)

    did_subpix = jnp.zeros(found.shape, bool)
    if subpix_iters > 0:
        sel = active & found & subpix_mask
        sres = match.iterate_subpix_multilevel(
            frame.pyramid, templates, pos_zero, search_level, sel,
            max_iters=subpix_iters, conv_limit=subpix_conv,
        )
        # Subpix failure voids the measurement (Tracker.cc:661-666).
        attempted_subpix = found & subpix_mask
        found = jnp.where(attempted_subpix, sres.converged, found)
        pos_zero = jnp.where(
            (attempted_subpix & sres.converged)[:, None],
            sres.pos_zero, pos_zero,
        )
        did_subpix = attempted_subpix & sres.converged
    return found, pos_zero, did_subpix


# ---------------------------------------------------------------------------
# Pose update (CalcPoseUpdate, Tracker.cc:683-774)
# ---------------------------------------------------------------------------


def _calc_pose_update(err, jac, sqrt_inv_noise, found, override_sigma,
                      prior=100.0):
    """err [N, 2] = v2Found - v2Image; jac [N, 2, 6]; returns (update[6],
    weights[N]). Tukey with MAD sigma unless override_sigma > 0. `prior`
    is TrackerConfig.pose_prior (WLS diagonal prior, Tracker.cc:736)."""
    dtype = err.dtype
    e_scaled = err * sqrt_inv_noise[:, None]
    err_sq = jnp.sum(e_scaled * e_scaled, axis=-1)
    sigma_sq = me.find_sigma_squared(err_sq, found, me.TUKEY)
    sigma_sq = jnp.where(override_sigma > 0, override_sigma, sigma_sq)
    w = me.weight(err_sq, jnp.maximum(sigma_sq, 1e-12), me.TUKEY)
    w = jnp.where(found, w, 0.0)
    Js = jac * sqrt_inv_noise[:, None, None]  # [N, 2, 6]
    A = jnp.einsum("nri,nrj,n->ij", Js, Js, w)
    b = jnp.einsum("nri,nr,n->i", Js, e_scaled, w)
    A = A + prior * jnp.eye(6, dtype=dtype)  # prior (Tracker.cc:736)
    update = jnp.linalg.solve(A, b)
    n_found = jnp.sum(found)
    update = jnp.where(n_found > 0, update, jnp.zeros_like(update))
    return update, w


# ---------------------------------------------------------------------------
# The full TrackMap as one jitted program
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config", "recovered"))
def track_map(
    frame: FrameData,
    slam_map: SLAMMap,
    cam: cam_ops.Camera,
    R, t,
    velocity_msd_mag,
    key,
    config: SLAMConfig,
    recovered: bool = False,
) -> TrackOutputs:
    tc = config.tracker
    pts = slam_map.points
    N = pts.n_slots
    dtype = R.dtype
    image_size = jnp.asarray([tc.width, tc.height], dtype)

    live = pts.live()

    # ---- PVS (Tracker.cc:369-392) ----
    # Cheap per-slot math ([N] einsums) runs over the full capacity; every
    # EXPENSIVE stage below (slab extraction, warped templates, window
    # ZMSSD, subpixel, GN reprojection) runs on a COMPACTED lane block of
    # C coarse + F fine slots, so tracking cost follows the reference's
    # own <=1000-patch budget (Tracker.cc:516-527) instead of the map
    # capacity. The searched set was always <= that budget — the masks
    # just used to carry N-C-F dead lanes through the heavy stages.
    pc, px, derivs, proj_ok = project_points(cam, pts.pos_w, R, t, image_size)
    motion_right = jnp.einsum("ij,nj->ni", R, pts.pixel_right_w)
    motion_down = jnp.einsum("ij,nj->ni", R, pts.pixel_down_w)
    warp_inv, search_level, warp_ok = match.calc_search_level_and_warp(
        pc, motion_right, motion_down, derivs,
        det_lo=config.patch.warp_det_lo, det_hi=config.patch.warp_det_hi,
    )
    pvs = live & proj_ok & warp_ok
    sqrt_inv_noise = 1.0 / (2.0 ** search_level.astype(dtype))

    # ---- Coarse set selection (Tracker.cc:423-466) ----
    key, k1, k2 = jax.random.split(key, 3)
    rand_pri = jax.random.uniform(k1, (N,), dtype)
    coarse_max = tc.coarse_max * (2 if recovered else 1)
    coarse_range = tc.coarse_range * (2 if recovered else 1)
    high = pvs & (search_level >= N_LEVELS - 2)
    n_high = jnp.sum(high)
    # Rank: level 3 before level 2, then random (Tracker.cc:437-460).
    rank_key = jnp.where(
        high,
        (search_level == N_LEVELS - 1).astype(dtype) + rand_pri * 0.999,
        -1.0,
    )
    C = min(coarse_max, N)
    _, top_idx = jax.lax.top_k(rank_key, C)
    try_coarse = (
        (not tc.disable_coarse)
        & (velocity_msd_mag >= tc.coarse_min_velocity)
        | jnp.asarray(bool(recovered))
    ) & (n_high > tc.coarse_min)
    coarse_sel = jnp.zeros(N, bool).at[top_idx].set(True) & high & try_coarse

    # ---- Fine set selection (Tracker.cc:495-538) ----
    # Selection happens BEFORE template generation (as in the reference,
    # where MakeTemplate runs inside SearchForPoints on the already-chosen
    # points); bad-template lanes are dropped from `found`/`attempted`
    # afterwards.
    top_level = pvs & (search_level == N_LEVELS - 1) & ~coarse_sel
    rest = pvs & (search_level < N_LEVELS - 1) & ~coarse_sel
    n_so_far = jnp.sum(coarse_sel) + jnp.sum(top_level)
    budget = jnp.maximum(tc.max_patches_per_frame - n_so_far, 0)
    rand2 = jax.random.uniform(k2, (N,), dtype)
    rest_key = jnp.where(rest, rand2, -1.0)
    order = jnp.argsort(-rest_key)
    rank_of = jnp.zeros(N, jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32)
    )
    rest_sel = rest & (rank_of < budget)
    f_active = top_level | rest_sel

    # Compact the fine set into F lanes (actives first, random order).
    F = min(N, -(-(tc.max_patches_per_frame + 256) // 256) * 256)
    fine_lane_key = jnp.where(f_active, 1.0 + rand2, rand2 - 2.0)
    _, fine_idx = jax.lax.top_k(fine_lane_key, F)
    f_lane_on = f_active[fine_idx]  # [F]

    # ---- Templates for the C + F searched lanes only ----
    u_idx = jnp.concatenate([top_idx, fine_idx])  # [U]; blocks may only
    # overlap when try_coarse is False (then the coarse block is inactive)
    templates_u = match.make_templates_warped_multilevel(
        slam_map.keyframes.pyramid, pts.source_kf[u_idx],
        pts.source_level[u_idx], pts.center[u_idx],
        warp_inv[u_idx], search_level[u_idx], 5,
    )
    c_templates = match.Templates(*(f[:C] for f in templates_u))
    f_templates = match.Templates(*(f[C:] for f in templates_u))

    # ---- Coarse search + 10 GN iterations (Tracker.cc:462-490) ----
    take = functools.partial(jnp.take, indices=top_idx, axis=0)
    c_lane_sel = take(coarse_sel)  # = take(high) & try_coarse
    cc_found, cc_pos, cc_subpix = _search_multi_level(
        frame, c_templates, take(px), take(search_level),
        c_lane_sel,
        jnp.full((C,), float(coarse_range), dtype),
        coarse_range, jnp.ones(C, bool), tc.coarse_sub_pix_its,
        subpix_conv=config.patch.subpix_converged,
    )
    cc_found = cc_found & c_lane_sel & ~c_templates.bad
    n_coarse_found = jnp.sum(cc_found)
    did_coarse = try_coarse & (n_coarse_found >= tc.coarse_min)

    pos_w_c = take(pts.pos_w)
    sin_c = take(sqrt_inv_noise)

    def coarse_gn(i, Rt):
        Rc, tcur = Rt
        pc_i = jnp.einsum("ij,nj->ni", Rc, pos_w_c) + tcur
        safe_z = jnp.where(pc_i[:, 2] > 1e-6, pc_i[:, 2], 1.0)
        m = pc_i[:, :2] / safe_z[:, None]
        px_i, derivs_i = cam_ops.project_derivs(cam, m)
        jac = _point_jacobian(pc_i, derivs_i)
        err = cc_pos - px_i
        override = jnp.where(i > 5, jnp.asarray(1.0, dtype), 0.0)
        upd, _ = _calc_pose_update(
            err, jac, sin_c, cc_found & did_coarse, override,
            prior=tc.pose_prior,
        )
        dR, dt = lie.se3_exp(upd)
        return lie.se3_mul(dR, dt, Rc, tcur)

    R1, t1 = jax.lax.fori_loop(0, tc.pose_update_iters, coarse_gn, (R, t))

    # ---- Fine search on the F lanes (Tracker.cc:495-538) ----
    fine_range = jnp.where(did_coarse, float(tc.fine_range_rest),
                           float(tc.fine_range_top))
    pos_w_u = pts.pos_w[u_idx]
    sin_u = sqrt_inv_noise[u_idx]
    level_u = search_level[u_idx]

    # Re-project the searched lanes at the post-coarse pose (reference
    # reprojects fine points if coarse ran; L3 always, Tracker.cc:497-534).
    pc2_u = jnp.einsum("ij,nj->ni", R1, pos_w_u) + t1
    safe_z2 = jnp.where(pc2_u[:, 2] > 1e-6, pc2_u[:, 2], 1.0)
    m2 = pc2_u[:, :2] / safe_z2[:, None]
    px2_u, derivs2_u = cam_ops.project_derivs(cam, m2)

    subpix_lane = (
        f_lane_on if tc.subpix_all_levels
        else f_lane_on & (level_u[C:] == N_LEVELS - 1)
    )
    f_found, f_pos, f_subpix = _search_multi_level(
        frame, f_templates, px2_u[C:], level_u[C:], f_lane_on,
        jnp.where(f_lane_on, fine_range, 0.0),
        tc.fine_range_top, subpix_lane, 8,  # 8 its (Tracker.cc:505)
        subpix_conv=config.patch.subpix_converged,
    )
    f_found = f_found & f_lane_on & ~f_templates.bad

    # ---- Combined iteration set over the U lanes ----
    in_set_u = jnp.concatenate([c_lane_sel, f_lane_on])
    found_u = jnp.concatenate([cc_found, f_found])
    found_pos_u = jnp.concatenate([cc_pos, f_pos], axis=0)
    did_subpix_u = jnp.concatenate([cc_subpix & cc_found, f_subpix])

    # ---- Fine 10 GN iterations with linear updates (Tracker.cc:543-577) --
    Rf, tf = R1, t1
    v_image = px2_u
    jac = _point_jacobian(pc2_u, derivs2_u)
    last_update = jnp.zeros(6, dtype)
    inlier_inc_u = jnp.zeros(C + F, jnp.int32)
    outlier_inc_u = jnp.zeros(C + F, jnp.int32)
    for it in range(tc.pose_update_iters):
        nonlinear = it in (0, 4, tc.pose_update_iters - 1)
        if it != 0:
            if nonlinear:
                pc_i = jnp.einsum("ij,nj->ni", Rf, pos_w_u) + tf
                safe_z = jnp.where(pc_i[:, 2] > 1e-6, pc_i[:, 2], 1.0)
                m_i = pc_i[:, :2] / safe_z[:, None]
                v_image, derivs_i = cam_ops.project_derivs(cam, m_i)
                jac = _point_jacobian(pc_i, derivs_i)
            else:
                v_image = v_image + jnp.einsum("nrj,j->nr", jac, last_update)
        err = found_pos_u - v_image
        override = 16.0 if it > 5 else 0.0
        mark = it == tc.pose_update_iters - 1
        upd, w = _calc_pose_update(
            err, jac, sin_u, found_u, jnp.asarray(override, dtype),
            prior=tc.pose_prior,
        )
        if mark:
            outlier_inc_u = jnp.where(found_u & (w == 0.0), 1, 0)
            inlier_inc_u = jnp.where(found_u & (w > 0.0), 1, 0)
        dR, dt = lie.se3_exp(upd)
        Rf, tf = lie.se3_mul(dR, dt, Rf, tf)
        last_update = upd

    # ---- Accounting (attempted/found per level; Tracker.cc:645-656) ----
    attempted_u = in_set_u & ~templates_u.bad
    att_l = jnp.stack(
        [jnp.sum((attempted_u & (level_u == l)).astype(jnp.int32))
         for l in range(N_LEVELS)]
    )
    fnd_l = jnp.stack(
        [jnp.sum((found_u & (level_u == l)).astype(jnp.int32))
         for l in range(N_LEVELS)]
    )

    # ---- Scene depth from tracked features (Tracker.cc:609-625) ----
    pc_f = jnp.einsum("ij,nj->ni", Rf, pos_w_u) + tf
    zf = pc_f[:, 2]
    wf = found_u.astype(dtype)
    nf = jnp.sum(wf)
    mean = jnp.sum(wf * zf) / jnp.maximum(nf, 1.0)
    sq = jnp.sum(wf * zf * zf) / jnp.maximum(nf, 1.0)
    sigma = jnp.sqrt(jnp.maximum(sq - mean * mean, 1e-12))

    # ---- Scatter lane results back to the N point slots ----
    # The two blocks' active sets are disjoint ON POINTS (fine excludes
    # coarse_sel; when try_coarse is False the coarse block is inactive),
    # so per-block masked scatters compose in either order.
    def scatter(base, idx, val, lane_on):
        cur = base[idx]
        m = lane_on if cur.ndim == 1 else lane_on[:, None]
        return base.at[idx].set(jnp.where(m, val, cur))

    found = jnp.zeros(N, bool)
    found = scatter(found, fine_idx, f_found, f_lane_on)
    found = scatter(found, top_idx, cc_found, c_lane_sel)
    found_pos = px
    found_pos = scatter(found_pos, fine_idx, f_pos, f_lane_on)
    found_pos = scatter(found_pos, top_idx, cc_pos, c_lane_sel)
    did_subpix = jnp.zeros(N, bool)
    did_subpix = scatter(did_subpix, fine_idx, f_subpix, f_lane_on)
    did_subpix = scatter(
        did_subpix, top_idx, cc_subpix & cc_found, c_lane_sel
    )
    inlier_inc = jnp.zeros(N, jnp.int32)
    inlier_inc = scatter(inlier_inc, fine_idx, inlier_inc_u[C:], f_lane_on)
    inlier_inc = scatter(inlier_inc, top_idx, inlier_inc_u[:C], c_lane_sel)
    outlier_inc = jnp.zeros(N, jnp.int32)
    outlier_inc = scatter(
        outlier_inc, fine_idx, outlier_inc_u[C:], f_lane_on
    )
    outlier_inc = scatter(
        outlier_inc, top_idx, outlier_inc_u[:C], c_lane_sel
    )

    return TrackOutputs(
        R=Rf, t=tf,
        found=found, found_pos=found_pos, search_level=search_level,
        did_subpix=did_subpix,
        attempted_per_level=att_l, found_per_level=fnd_l,
        inlier_inc=inlier_inc, outlier_inc=outlier_inc,
        scene_depth_mean=mean, scene_depth_sigma=sigma,
        depth_stats_valid=nf > 20,
        did_coarse=did_coarse,
    )


# ---------------------------------------------------------------------------
# Motion model + SBI prior + quality (host-light helpers, still jittable)
# ---------------------------------------------------------------------------


def apply_motion_model(R, t, velocity, sbi_rot, use_sbi):
    """ApplyMotionModel (Tracker.cc:781-798): pose <- exp(v) * pose with
    the SBI rotation overriding the rotational velocity (and zeroing the
    in-plane translation) when available."""
    v = jnp.where(
        use_sbi,
        jnp.concatenate([jnp.zeros(2, velocity.dtype), velocity[2:3],
                         sbi_rot[3:]]),
        velocity,
    )
    dR, dt = lie.se3_exp(v)
    R2, t2 = lie.se3_mul(dR, dt, R, t)
    return R2, t2


def update_motion_model(R_new, t_new, R_start, t_start, velocity,
                        scene_depth_mean, decay=0.9):
    """UpdateMotionModel (Tracker.cc:802-820): v <- 0.9*(0.5 motion +
    0.5 v); returns (velocity, |v|, scene-depth-scaled |v|)."""
    Ri, ti = lie.se3_inverse(R_start, t_start)
    Rm, tm = lie.se3_mul(R_new, t_new, Ri, ti)
    motion = lie.se3_ln(Rm, tm)
    v = decay * (0.5 * motion + 0.5 * velocity)
    mag = jnp.linalg.norm(v)
    v_scaled = v.at[:3].multiply(1.0 / jnp.maximum(scene_depth_mean, 1e-6))
    return v, mag, jnp.linalg.norm(v_scaled)


def calc_sbi_rotation(sbi_cur_template, sbi_last: sbi_ops.SBI,
                      cam: cam_ops.Camera, n_iters=6):
    """CalcSBIRotation (Tracker.cc:885-893): ESM-align this frame's SBI to
    the LAST frame's, lift the SE2 to a camera rotation; returns mu[6]
    (rotation-only twist)."""
    se2, _ = sbi_ops.esm_align(sbi_cur_template, sbi_last, n_iters)
    Rr, tr = sbi_ops.se3_from_se2(se2, cam, sbi_cur_template.shape)
    return lie.se3_ln(Rr, tr)


QUALITY_GOOD = 2
QUALITY_DODGY = 1
QUALITY_BAD = 0


def assess_tracking_quality(attempted_per_level, found_per_level,
                            quality_good=0.3, quality_lost=0.13):
    """AssessTrackingQuality (Tracker.cc:832-878), sans the distance-to-map
    check (applied by the caller). Returns int quality code."""
    ta = jnp.sum(attempted_per_level)
    tf = jnp.sum(found_per_level)
    la = jnp.sum(attempted_per_level[2:])
    lf = jnp.sum(found_per_level[2:])
    frac = tf / jnp.maximum(ta, 1)
    lfrac = jnp.where(la > 10, lf / jnp.maximum(la, 1), frac)
    good = frac > quality_good
    bad = (tf == 0) | (ta == 0) | (lfrac < quality_lost)
    return jnp.where(bad, QUALITY_BAD,
                     jnp.where(good, QUALITY_GOOD, QUALITY_DODGY))
