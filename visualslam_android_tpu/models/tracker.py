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


def _make_all_templates(slam_map: SLAMMap, warp_inv, search_level, half_patch):
    """Warped templates for every point in one fused pass: per-source-level
    slab extraction, a single separable-bilinear resample (see
    match.make_templates_warped_multilevel)."""
    pts = slam_map.points
    return match.make_templates_warped_multilevel(
        slam_map.keyframes.pyramid, pts.source_kf, pts.source_level,
        pts.center, warp_inv, search_level, half_patch,
    )


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
    pc, px, derivs, proj_ok = project_points(cam, pts.pos_w, R, t, image_size)
    motion_right = jnp.einsum("ij,nj->ni", R, pts.pixel_right_w)
    motion_down = jnp.einsum("ij,nj->ni", R, pts.pixel_down_w)
    warp_inv, search_level, warp_ok = match.calc_search_level_and_warp(
        pc, motion_right, motion_down, derivs,
        det_lo=config.patch.warp_det_lo, det_hi=config.patch.warp_det_hi,
    )
    pvs = live & proj_ok & warp_ok
    sqrt_inv_noise = 1.0 / (2.0 ** search_level.astype(dtype))

    # ---- Templates for all PVS points ----
    templates = _make_all_templates(slam_map, warp_inv, search_level, 5)
    pvs = pvs & ~templates.bad

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

    # ---- Coarse search + 10 GN iterations (Tracker.cc:462-490) ----
    # The wide-range (30 px) search only ever runs on <= coarse_max points,
    # so compact the selected subset into a dense [C] block (row gathers),
    # search there, and scatter results back to the full point set.
    take = functools.partial(jnp.take, indices=top_idx, axis=0)
    c_templates = match.Templates(*(take(f) for f in templates))
    c_active = take(high) & try_coarse
    cc_found, cc_pos, cc_subpix = _search_multi_level(
        frame, c_templates, take(px), take(search_level), c_active,
        jnp.full((C,), float(coarse_range), dtype),
        coarse_range, jnp.ones(C, bool), tc.coarse_sub_pix_its,
        subpix_conv=config.patch.subpix_converged,
    )
    c_found = jnp.zeros(N, bool).at[top_idx].set(cc_found) & coarse_sel
    c_pos = px.at[top_idx].set(cc_pos)
    c_subpix = jnp.zeros(N, bool).at[top_idx].set(cc_subpix) & coarse_sel
    n_coarse_found = jnp.sum(c_found)
    did_coarse = try_coarse & (n_coarse_found >= tc.coarse_min)

    def coarse_gn(i, Rt):
        Rc, tcur = Rt
        pc_i = jnp.einsum("ij,nj->ni", Rc, pts.pos_w) + tcur
        safe_z = jnp.where(pc_i[:, 2] > 1e-6, pc_i[:, 2], 1.0)
        m = pc_i[:, :2] / safe_z[:, None]
        px_i, derivs_i = cam_ops.project_derivs(cam, m)
        jac = _point_jacobian(pc_i, derivs_i)
        err = c_pos - px_i
        override = jnp.where(i > 5, jnp.asarray(1.0, dtype), 0.0)
        upd, _ = _calc_pose_update(
            err, jac, sqrt_inv_noise, c_found & did_coarse, override,
            prior=tc.pose_prior,
        )
        dR, dt = lie.se3_exp(upd)
        return lie.se3_mul(dR, dt, Rc, tcur)

    R1, t1 = jax.lax.fori_loop(0, tc.pose_update_iters, coarse_gn, (R, t))

    # ---- Fine stage selection (Tracker.cc:495-538) ----
    fine_range = jnp.where(did_coarse, float(tc.fine_range_rest),
                           float(tc.fine_range_top))
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

    # Re-project everything at the post-coarse pose (reference reprojects
    # fine points if coarse ran; and L3 points always, Tracker.cc:497-534).
    pc2 = jnp.einsum("ij,nj->ni", R1, pts.pos_w) + t1
    safe_z2 = jnp.where(pc2[:, 2] > 1e-6, pc2[:, 2], 1.0)
    m2 = pc2[:, :2] / safe_z2[:, None]
    px2, derivs2 = cam_ops.project_derivs(cam, m2)

    f_active = top_level | rest_sel
    subpix_mask = f_active if tc.subpix_all_levels else top_level
    f_found, f_pos, f_subpix = _search_multi_level(
        frame, templates, px2, search_level, f_active,
        jnp.where(f_active, fine_range, 0.0),
        tc.fine_range_top, subpix_mask, 8,  # 8 its (Tracker.cc:505)
        subpix_conv=config.patch.subpix_converged,
    )

    # ---- Combined iteration set ----
    in_set = coarse_sel | f_active
    found = jnp.where(coarse_sel, c_found, f_found) & in_set
    found_pos = jnp.where(coarse_sel[:, None], c_pos, f_pos)
    did_subpix = jnp.where(coarse_sel, c_subpix, f_subpix)

    # ---- Fine 10 GN iterations with linear updates (Tracker.cc:543-577) --
    Rf, tf = R1, t1
    v_image = px2
    jac = _point_jacobian(pc2, derivs2)
    last_update = jnp.zeros(6, dtype)
    inlier_inc = jnp.zeros(N, jnp.int32)
    outlier_inc = jnp.zeros(N, jnp.int32)
    for it in range(tc.pose_update_iters):
        nonlinear = it in (0, 4, tc.pose_update_iters - 1)
        if it != 0:
            if nonlinear:
                pc_i = jnp.einsum("ij,nj->ni", Rf, pts.pos_w) + tf
                safe_z = jnp.where(pc_i[:, 2] > 1e-6, pc_i[:, 2], 1.0)
                m_i = pc_i[:, :2] / safe_z[:, None]
                v_image, derivs_i = cam_ops.project_derivs(cam, m_i)
                jac = _point_jacobian(pc_i, derivs_i)
            else:
                v_image = v_image + jnp.einsum("nrj,j->nr", jac, last_update)
        err = found_pos - v_image
        override = 16.0 if it > 5 else 0.0
        mark = it == tc.pose_update_iters - 1
        upd, w = _calc_pose_update(
            err, jac, sqrt_inv_noise, found, jnp.asarray(override, dtype),
            prior=tc.pose_prior,
        )
        if mark:
            outlier_inc = jnp.where(found & (w == 0.0), 1, 0)
            inlier_inc = jnp.where(found & (w > 0.0), 1, 0)
        dR, dt = lie.se3_exp(upd)
        Rf, tf = lie.se3_mul(dR, dt, Rf, tf)
        last_update = upd

    # ---- Accounting (attempted/found per level; Tracker.cc:645-656) ----
    attempted = in_set & ~templates.bad
    att_l = jnp.stack(
        [jnp.sum((attempted & (search_level == l)).astype(jnp.int32))
         for l in range(N_LEVELS)]
    )
    fnd_l = jnp.stack(
        [jnp.sum((found & (search_level == l)).astype(jnp.int32))
         for l in range(N_LEVELS)]
    )

    # ---- Scene depth from tracked features (Tracker.cc:609-625) ----
    pc_f = jnp.einsum("ij,nj->ni", Rf, pts.pos_w) + tf
    zf = pc_f[:, 2]
    wf = found.astype(dtype)
    nf = jnp.sum(wf)
    mean = jnp.sum(wf * zf) / jnp.maximum(nf, 1.0)
    sq = jnp.sum(wf * zf * zf) / jnp.maximum(nf, 1.0)
    sigma = jnp.sqrt(jnp.maximum(sq - mean * mean, 1e-12))

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
