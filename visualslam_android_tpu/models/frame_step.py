"""Fused per-frame and per-mapping-task jitted stages.

On any deployment where the host drives the chip through a network link
(here: a remote-TPU tunnel where one synchronous host<->device transfer
costs ~30 ms while an async dispatch costs ~0.3 ms), the SLAM frame
loop's wall-clock is dominated by (a) synchronous scalar pulls and
(b) the count of separate dispatches — not by compute. These stages fuse
each logical unit of the reference's loop into ONE jitted program:

- ``frame_step``: the complete TrackFrame hot path
  (jni/Tracker.cc:76-146) — pyramid+FAST front-end, SBI build, ESM
  rotation prior, motion model, TrackMap, motion-model update, quality
  assessment, inlier/outlier bookkeeping and HandleBadPoints
  (jni/MapMaker.cc:140-164) — plus a packed ``stats`` vector carrying
  every scalar the host control loop reads, so the host pulls exactly
  once per frame (or asynchronously, one frame late, in pipelined mode).
- ``ba_round``: adjust-set selection + bundle adjustment + result
  write-back + ejected-measurement routing (MapMaker.cc:776-960) as one
  dispatch.
- ``integrate_keyframe``: AddKeyFrameFromTopOfQueue (MapMaker.cc:481-506)
  — MakeKeyFrame_Rest, measurement registration, scene-depth refresh,
  ReFindInSingleKeyFrame, and epipolar growth at levels 3,0,1,2 — as one
  dispatch.
- ``add_map_points_step``: ThinCandidates + AddPointEpipolar for one
  (source keyframe, level), with the closest-keyframe target selection
  done ON DEVICE (MapMaker.cc:427-437) so no index is pulled to the host.
- ``refind_newly`` / ``refind_failures``: the batched points x keyframes
  re-find stages with their queue bookkeeping folded in
  (MapMaker.cc:1061-1095).

The host side (models/slam.py) keeps only control state: phase, frame
counters, the keyframe queue, and one-frame-stale mirrors of the device
queue flags carried back in ``stats``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from visualslam_android_tpu.config import SLAMConfig
from visualslam_android_tpu.models import bundle as bundle_mod
from visualslam_android_tpu.models import keyframe as kf_mod
from visualslam_android_tpu.models import mapmaker
from visualslam_android_tpu.models import tracker as tracker_mod
from visualslam_android_tpu.models.map_store import (
    SRC_REFIND,
    SRC_TRACKER,
    SLAMMap,
)
from visualslam_android_tpu.ops import sbi as sbi_ops

N_LEVELS = 4

# ---------------------------------------------------------------------------
# Packed per-frame stats vector layout (everything the host control loop
# reads, in ONE transfer). Indices into FrameStepOut.stats:
# ---------------------------------------------------------------------------
STAT_QUALITY = 0          # assess_tracking_quality code (0/1/2)
STAT_DIST_EXCESSIVE = 1   # IsDistanceToNearestKeyFrameExcessive
STAT_NEED_KF = 2          # NeedNewKeyFrame
STAT_DID_COARSE = 3
STAT_DEPTH = 4            # scene depth mean after this frame
STAT_VEL_MAG = 5
STAT_VEL_MSD = 6
STAT_N_FOUND = 7
STAT_N_POINTS = 8         # post-HandleBadPoints
STAT_N_KEYFRAMES = 9
STAT_N_MEAS = 10
STAT_ANY_FAILURE = 11     # failure queue nonempty (as of frame start)
STAT_ANY_NEW = 12         # new-point queue nonempty (post bad-point cull)
STAT_ANY_NEWLY_BAD = 13
STAT_PENDING_CONV = 14    # passthrough of last BA's convergence scalar
STAT_PENDING_OK = 15      # passthrough of last BA's finite-map scalar
STAT_FOUND_L0 = 16        # .. STAT_FOUND_L0 + N_LEVELS
STAT_POSE_R = STAT_FOUND_L0 + N_LEVELS   # 9 floats, row-major
STAT_POSE_T = STAT_POSE_R + 9            # 3 floats
STATS_LEN = STAT_POSE_T + 3


class FrameStepOut(NamedTuple):
    slam_map: SLAMMap          # inlier/outlier counts updated, bad culled
    R: jnp.ndarray             # [3,3] tracked pose
    t: jnp.ndarray             # [3]
    velocity: jnp.ndarray      # [6] updated motion model
    msd: jnp.ndarray           # [] scene-depth-scaled |v|
    depth: jnp.ndarray         # [] scene depth mean
    sbi: sbi_ops.SBI           # this frame's SBI (next frame's prior)
    key: jnp.ndarray           # advanced PRNG key
    frame: object              # FrameData (kept for the keyframe queue)
    found: jnp.ndarray         # [N]
    found_pos: jnp.ndarray     # [N,2]
    search_level: jnp.ndarray  # [N]
    did_subpix: jnp.ndarray    # [N]
    new_points: jnp.ndarray    # [N] new-point queue, bad-culled
    stats: jnp.ndarray         # [STATS_LEN] f32 — the host's one pull


@functools.partial(
    jax.jit, static_argnames=("config", "use_prior", "forced_coarse"),
    donate_argnums=(1,),  # slam_map: alias the (mostly passthrough)
                          # keyframe store instead of copying it per frame
)
def frame_step(
    img, slam_map: SLAMMap, cam, R, t, velocity, msd, depth_mean,
    wiggle_depth_norm, sbi_last: sbi_ops.SBI, new_points, failure_mask,
    pending, key, config: SLAMConfig,
    use_prior: bool = True, forced_coarse: bool = False,
) -> FrameStepOut:
    """The complete per-frame hot path as ONE program.

    use_prior=False on the relocalization frame itself (pose comes from
    the relocalizer, velocity is zero — Tracker.cc:169-174);
    forced_coarse=True on that frame and the just-recovered one
    (track_map's `recovered`)."""
    tc = config.tracker
    f32 = jnp.float32
    key_out, sub = jax.random.split(key)

    frame = kf_mod.make_frame(img, config)
    sbi_cur = sbi_ops.make_sbi(frame.pyramid[-1], tc.sbi_blur)

    if use_prior:
        sbi_rot = tracker_mod.calc_sbi_rotation(
            sbi_cur.template, sbi_last, cam, tc.sbi_esm_iters
        )
        R1, t1 = tracker_mod.apply_motion_model(
            R, t, velocity, sbi_rot, jnp.asarray(True)
        )
    else:
        R1, t1 = R, t

    out = tracker_mod.track_map(
        frame, slam_map, cam, R1, t1, msd, sub, config,
        recovered=forced_coarse,
    )

    depth_new = jnp.where(
        out.depth_stats_valid, out.scene_depth_mean, depth_mean
    )
    velocity2, mag, msd2 = tracker_mod.update_motion_model(
        out.R, out.t, R1, t1, velocity, depth_new, tc.motion_decay
    )

    # Inlier/outlier bookkeeping + HandleBadPoints (runs every frame, as
    # in every pass of the reference's run() loop — MapMaker.cc:116).
    pts = slam_map.points
    pts = pts._replace(
        inlier_count=pts.inlier_count + out.inlier_inc,
        outlier_count=pts.outlier_count + out.outlier_inc,
    )
    sm = slam_map._replace(points=pts)
    sm, newly_bad = mapmaker.handle_bad_points(sm, config)
    new_points2 = new_points & ~newly_bad

    quality = tracker_mod.assess_tracking_quality(
        out.attempted_per_level, out.found_per_level,
        tc.quality_good, tc.quality_lost,
    )
    dist_exc = mapmaker.dist_to_nearest_excessive(
        sm.keyframes, out.R, out.t,
        config.mapmaker.wiggle_scale, config.mapmaker.kf_distance_factor,
    )
    need_kf = mapmaker.need_new_keyframe(
        sm.keyframes, out.R, out.t, depth_new, wiggle_depth_norm,
        config.mapmaker.max_kf_dist_mult,
    )

    stats = jnp.concatenate([
        jnp.stack([
            quality.astype(f32), dist_exc.astype(f32), need_kf.astype(f32),
            out.did_coarse.astype(f32), depth_new, mag, msd2,
            jnp.sum(out.found).astype(f32),
            sm.points.count().astype(f32),
            sm.keyframes.count().astype(f32),
            sm.meas.count().astype(f32),
            jnp.any(failure_mask).astype(f32),
            jnp.any(new_points2).astype(f32),
            jnp.any(newly_bad).astype(f32),
            pending[0], pending[1],
        ]),
        out.found_per_level.astype(f32),
        out.R.reshape(-1), out.t,
    ])

    return FrameStepOut(
        slam_map=sm, R=out.R, t=out.t, velocity=velocity2, msd=msd2,
        depth=depth_new, sbi=sbi_cur, key=key_out, frame=frame,
        found=out.found, found_pos=out.found_pos,
        search_level=out.search_level, did_subpix=out.did_subpix,
        new_points=new_points2, stats=stats,
    )


# ---------------------------------------------------------------------------
# Bootstrap-phase front-end (MakeKeyFrame_Lite + SBI) as one dispatch
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config",))
def bootstrap_frontend(img, config: SLAMConfig):
    """make_frame + make_sbi fused — the bootstrap frames run outside
    frame_step, and the eager make_sbi chain alone costs ~20 ms of
    dispatch latency per frame over the remote-TPU link."""
    frame = kf_mod.make_frame(img, config)
    sbi_cur = sbi_ops.make_sbi(
        frame.pyramid[-1], config.tracker.sbi_blur
    )
    return frame, sbi_cur


# ---------------------------------------------------------------------------
# InitFromStereo point building (MapMaker.cc:262-339) as one dispatch
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def init_points_step(slam_map: SLAMMap, frame_second, m_a, a, b, valid,
                     R2, t2, cam, config: SLAMConfig):
    """Per-trail subpixel alignment in the second view, two-view
    triangulation, and packing of the survivors into point slots with
    SRC_ROOT + SRC_TRAIL measurements — the eager version of this chain
    cost ~0.4 s of dispatch latency on the one-time init frame. Returns
    (slam_map, n_ok) with only n_ok pulled by the host (the <10 abort,
    MapMaker.cc:313-316)."""
    from visualslam_android_tpu.models import triangulate
    from visualslam_android_tpu.models.map_store import SRC_TRAIL
    from visualslam_android_tpu.ops import camera as cam_ops
    from visualslam_android_tpu.ops import match

    cfg = config
    T = a.shape[0]
    kfs = slam_map.keyframes
    tmpl = match.make_templates_nowarp(
        kfs.pyramid[0], jnp.zeros(T, jnp.int32), a,
        cfg.patch.half_patch_size,
    )
    sp = match.iterate_subpix(
        frame_second.pyramid[0], tmpl, b,
        jnp.zeros(T, jnp.int32), valid & ~tmpl.bad,
        max_iters=cfg.patch.subpix_max_iters,
        half_patch=cfg.patch.half_patch_size,
        conv_limit=cfg.patch.subpix_converged,
    )
    ok = valid & ~tmpl.bad & sp.converged
    m_b2 = cam_ops.unproject(cam, sp.pos_zero)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (T, 3, 3))
    z3 = jnp.zeros((T, 3), jnp.float32)
    pos_w = triangulate.triangulate(
        I3, z3,
        jnp.broadcast_to(R2, (T, 3, 3)), jnp.broadcast_to(t2, (T, 3)),
        m_a, m_b2,
    )
    ok &= pos_w[:, 2] > 0.0  # (MapMaker.cc:313-316)

    # Pack into point slots 0..T (capacity permitting).
    epi_like = mapmaker.EpipolarResult(
        success=ok, pos_w=pos_w, src_uv=a, target_uv=sp.pos_zero
    )
    sm, new_mask = mapmaker.insert_new_points(
        slam_map, cam, epi_like, 0, 1, 0, cfg.tracker.max_map_points,
    )
    # First measurement source is SRC_ROOT (set by insert), second
    # should be SRC_TRAIL rather than SRC_EPIPOLAR (MapMaker.cc:331).
    meas = sm.meas
    fix = new_mask[:, None] & (meas.kf == 1) & meas.valid
    meas = meas._replace(source=jnp.where(fix, SRC_TRAIL, meas.source))
    sm = sm._replace(meas=meas)
    return sm, jnp.sum(ok.astype(jnp.int32))


# ---------------------------------------------------------------------------
# TrailTracking_Advance (Tracker.cc:294-346) as one dispatch
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config",))
def trail_advance_step(frame, prev_frame, patches, cur_pos, valid,
                       config: SLAMConfig):
    """Forward MiniPatch search in `frame` + backwards married-match in
    `prev_frame` (tolerance 2 px^2) as ONE program. Returns
    (new_pos [T,2], good [T], count []) — the host pulls only `count`
    (the <min_trails reset decision, Tracker.cc:245-248)."""
    from visualslam_android_tpu.ops import match

    tc = config.tracker
    fwd = match.find_minipatch(
        frame.pyramid[0], frame.corner_mask[0], patches, cur_pos, valid,
        search_range=tc.trail_search_range,
        half_patch=config.patch.mini_half_patch,
        max_ssd=tc.trail_max_ssd,
    )
    back_patches = match.sample_minipatches(
        frame.pyramid[0], fwd.pos, config.patch.mini_half_patch
    )
    bwd = match.find_minipatch(
        prev_frame.pyramid[0], prev_frame.corner_mask[0], back_patches,
        fwd.pos, valid & fwd.found,
        search_range=tc.trail_search_range,
        half_patch=config.patch.mini_half_patch,
        max_ssd=tc.trail_max_ssd,
    )
    d = bwd.pos - cur_pos
    married = jnp.sum(d * d, axis=-1) <= 2.0
    good = valid & fwd.found & bwd.found & married
    new_pos = jnp.where(good[:, None], fwd.pos, cur_pos)
    return new_pos, good, jnp.sum(good.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Bundle adjustment round (MapMaker.cc:776-960) as one dispatch
# ---------------------------------------------------------------------------


def _obs_mask_to_point_kf(obs_mask, meas_kf, K):
    """[N, O] measurement mask -> [N, K] point-keyframe mask."""
    oh = jax.nn.one_hot(meas_kf, K, dtype=jnp.float32)
    return (
        jnp.einsum("no,nok->nk", obs_mask.astype(jnp.float32), oh) > 0.5
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_iters", "assembly", "solver", "mode",
                     "cap"),
    donate_argnums=(0,),
)
def ba_round(
    slam_map: SLAMMap, newest_kf, never_retry, failure_mask, cam,
    config: SLAMConfig, max_iters: int, assembly: str, solver: str,
    mode: str, cap: tuple = (),
):
    """One BundleAdjustRecent/All: adjust-set selection, LM bundle
    adjustment, write-back, and ejected-measurement routing
    (MapMaker.cc:801-851, 917-959). Returns
    (slam_map, failure_mask, never_retry, converged, map_ok) — the two
    scalars stay ON DEVICE; callers that tolerate a one-frame lag thread
    them through the next frame_step's `pending` input instead of
    blocking.

    cap=(n_points, n_cams): run the LM loop on a PREFIX SLICE of the
    problem (bootstrap only, where the map provably occupies the first
    slots: trails + 4 epipolar growths over 2 keyframes — point slots
    allocate lowest-free-first, mapmaker.insert_new_points). Each LM
    step is a long sequential chain of small kernels, so its device
    latency scales with the padded capacity; slicing the init problem
    from [4096 pts, 64 cams] to [2048, 2] cuts the ~130-iteration init
    BA from seconds to fractions (the reference's InitFromStereo is
    equally synchronous but its vectors hold only live elements)."""
    kfs = slam_map.keyframes
    if mode == "local":
        adjust = mapmaker.local_ba_adjust_mask(slam_map, newest_kf, config)
    else:
        adjust = kfs.valid & ~kfs.fixed
    prob = mapmaker.build_ba_problem(slam_map, adjust, config)
    bc = config.bundle
    prob_run = prob
    if cap:
        cap_n, cap_k = cap
        prob_run = bundle_mod.BAProblem(
            cam_R=prob.cam_R[:cap_k], cam_t=prob.cam_t[:cap_k],
            cam_fixed=prob.cam_fixed[:cap_k],
            cam_valid=prob.cam_valid[:cap_k],
            points=prob.points[:cap_n],
            point_valid=prob.point_valid[:cap_n],
            meas_kf=jnp.minimum(prob.meas_kf[:cap_n], cap_k - 1),
            meas_uv=prob.meas_uv[:cap_n],
            meas_sqrt_inv_noise=prob.meas_sqrt_inv_noise[:cap_n],
            meas_valid=prob.meas_valid[:cap_n],
        )
    res = bundle_mod.bundle_adjust(
        prob_run, cam, max_iters=max_iters,
        point_block=bc.point_block,
        assembly=assembly, solver=solver,
        band_halfwidth=bc.band_halfwidth,
        cg_iters=bc.cg_iters, cg_tol=bc.cg_tol,
        update_conv=bc.update_convergence,
        min_sigma_sq=bc.min_tukey_sigma ** 2,
        lambda_init=bc.lambda_init, lambda_good=bc.lambda_good,
        lambda_factor_init=bc.lambda_factor_init,
    )
    if cap:
        # Expand back to full shapes: untouched suffix slots keep their
        # problem values; nothing outside the prefix was valid.
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        res = bundle_mod.BAResult(
            cam_R=cat(res.cam_R, prob.cam_R[cap_k:]),
            cam_t=cat(res.cam_t, prob.cam_t[cap_k:]),
            points=cat(res.points, prob.points[cap_n:]),
            meas_valid=cat(res.meas_valid, prob.meas_valid[cap_n:]),
            outlier_meas=cat(
                res.outlier_meas,
                jnp.zeros_like(prob.meas_valid[cap_n:]),
            ),
            point_outliers=cat(
                res.point_outliers,
                jnp.zeros(
                    prob.points.shape[0] - cap_n, res.point_outliers.dtype
                ),
            ),
            accepted=res.accepted, converged=res.converged,
            sigma_squared=res.sigma_squared,
        )
    sm, retry, never, _died = mapmaker.apply_ba_result(
        slam_map, prob, res, config
    )
    K = kfs.n_slots
    failure_mask = failure_mask | _obs_mask_to_point_kf(
        retry, prob.meas_kf, K
    )
    never_retry = never_retry | _obs_mask_to_point_kf(
        never, prob.meas_kf, K
    )
    map_ok = jnp.all(jnp.isfinite(res.cam_t)) & jnp.all(
        jnp.isfinite(res.points)
    )
    return sm, failure_mask, never_retry, res.converged, map_ok


# ---------------------------------------------------------------------------
# AddSomeMapPoints (MapMaker.cc:427-437) with on-device target selection
# ---------------------------------------------------------------------------


def _add_map_points_body(slam_map: SLAMMap, new_points, cam, src_kf,
                         level: int, config: SLAMConfig):
    kfs = slam_map.keyframes
    d = mapmaker.keyframe_distances(kfs, kfs.R[src_kf], kfs.t[src_kf])
    d = jnp.where(jnp.arange(kfs.n_slots) == src_kf, jnp.inf, d)
    target = jnp.argmin(d)
    # Gate everything off when there is no distinct valid target
    # (the host used to pull `target` and bail; the mask is free).
    enabled = (target != src_kf) & kfs.valid[target] & jnp.isfinite(d[target])

    sm = mapmaker.thin_candidates(
        slam_map, src_kf, level, config.mapmaker.thin_candidates_radius
    )
    dtype = kfs.t.dtype
    cand_xy, cand_ok = mapmaker.select_top_candidates(
        sm.keyframes.cand_xy[level][src_kf].astype(dtype),
        sm.keyframes.cand_valid[level][src_kf] & enabled,
        config.mapmaker.max_epi_candidates,
    )
    res = mapmaker.epipolar_search_cands(
        sm, src_kf, target, cam, level, config, cand_xy, cand_ok
    )
    sm, new_mask = mapmaker.insert_new_points(
        sm, cam, res, src_kf, target, level,
        config.mapmaker.max_epi_candidates,
    )
    return sm, new_points | new_mask


@functools.partial(jax.jit, static_argnames=("level", "config"),
                   donate_argnums=(0,))
def add_map_points_step(slam_map: SLAMMap, new_points, cam, src_kf,
                        level: int, config: SLAMConfig):
    return _add_map_points_body(
        slam_map, new_points, cam, src_kf, level, config
    )


# ---------------------------------------------------------------------------
# AddKeyFrameFromTopOfQueue (MapMaker.cc:481-506) as one dispatch
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config", "grow_levels"),
                   donate_argnums=(0,))
def integrate_keyframe(
    slam_map: SLAMMap, new_points, never_retry, failure_mask,
    frame, R, t, found, found_pos, level, subpix, slot, cam,
    config: SLAMConfig, grow_levels: tuple = (),
):
    """MakeKeyFrame_Rest + insert + SRC_TRACKER measurement registration +
    RefreshSceneDepth + ReFindInSingleKeyFrame — the first stage of the
    reference's keyframe-integration chain (MapMaker.cc:481-506).

    Epipolar growth (AddSomeMapPoints at levels 3,0,1,2) runs here only
    for the levels in `grow_levels`; the scheduler (models/slam.py)
    instead dispatches the four levels as four FOLLOW-UP mapping tasks,
    so no single frame absorbs the whole integration's device time (the
    frame-budget slicing of VERDICT r3 item 2 — the reference's analog is
    its mapmaker thread owning a separate core)."""
    extras = kf_mod.make_frame_extras(frame, config)
    kfs = kf_mod.insert_keyframe(
        slam_map.keyframes, slot, frame, extras, R, t, fixed=False
    )
    sm = slam_map._replace(keyframes=kfs)
    meas = mapmaker.add_measurements_batch(
        sm.meas, found, slot, found_pos, level, SRC_TRACKER, subpix
    )
    sm = sm._replace(meas=meas)
    sm = kf_mod.refresh_scene_depth(sm, slot)

    # ReFindInSingleKeyFrame (MapMaker.cc:497).
    mask = sm.points.valid & ~never_retry[:, slot]
    sm, found_rf, never_new = mapmaker.refind_in_keyframe(
        sm, slot, cam, mask, config
    )
    never_retry = never_retry.at[:, slot].set(
        never_retry[:, slot] | never_new
    )
    failure_mask = failure_mask.at[:, slot].set(
        failure_mask[:, slot] & ~found_rf
    )

    # Optional fused epipolar growth (MapMaker.cc:499-502).
    for lvl in grow_levels:
        sm, new_points = _add_map_points_body(
            sm, new_points, cam, slot, lvl, config
        )
    return sm, new_points, never_retry, failure_mask


# ---------------------------------------------------------------------------
# ReFindNewlyMade / ReFindFromFailureQueue (MapMaker.cc:1061-1095),
# budgeted: the sparse [K, N] pending set is compacted to at most
# refind_pair_budget (point, keyframe) pairs per dispatch, so one mapping
# task costs ~one tracking frame's search (leftovers stay queued). The
# K-lane vmapped form (mapmaker.refind_in_keyframes_batched) OOMs at the
# default 800x480 capacities and remains only as the parity oracle.
# ---------------------------------------------------------------------------


def _pending_pairs(slam_map: SLAMMap, point_mask_kn):
    """Fold point/keyframe validity and existing observations into the
    [K, N] pending mask (the checks refind_in_keyframes_batched applies
    internally)."""
    pts, kfs, meas = slam_map.points, slam_map.keyframes, slam_map.meas
    K = kfs.n_slots
    already = jax.vmap(
        lambda k: mapmaker.map_store.point_observed_in(meas, k)
    )(jnp.arange(K))
    return (
        point_mask_kn & pts.live()[None] & ~already & kfs.valid[:, None]
    )


def _refind_pending_step(slam_map: SLAMMap, pending, cam, config):
    """Search up to refind_pair_budget pairs of `pending` and insert the
    found measurements (per-KF scan, same slot semantics as the batched
    oracle). Returns (slam_map, processed_kn, found_kn)."""
    K, N = pending.shape
    Q = min(config.mapmaker.refind_pair_budget, K * N)
    pk, pn = jnp.nonzero(pending, size=Q, fill_value=0)
    pair_ok = jnp.arange(Q) < jnp.sum(pending)
    found_q, pos_q, lvl_q, sp_q = mapmaker.refind_pairs(
        slam_map, pn, pk, pair_ok, cam, config
    )
    pk_s = jnp.where(pair_ok, pk, K)  # invalid pairs scatter out of range

    def scat(val, zero):
        return zero.at[pk_s, pn].set(val, mode="drop")

    processed = scat(pair_ok, jnp.zeros((K, N), bool))
    found_kn = scat(found_q, jnp.zeros((K, N), bool))
    pos_kn = scat(pos_q, jnp.zeros((K, N, 2), pos_q.dtype))
    lvl_kn = scat(lvl_q, jnp.zeros((K, N), lvl_q.dtype))
    sp_kn = scat(sp_q, jnp.zeros((K, N), bool))

    def body(m, xs):
        k, f, p, lvl, sp = xs
        return mapmaker.add_measurements_batch(
            m, f, k, p, lvl, SRC_REFIND, sp
        ), None

    meas, _ = jax.lax.scan(
        body, slam_map.meas,
        (jnp.arange(K), found_kn, pos_kn, lvl_kn, sp_kn),
    )
    return slam_map._replace(meas=meas), processed, found_kn


@functools.partial(jax.jit, static_argnames=("config",),
                   donate_argnums=(0,))
def refind_newly(slam_map: SLAMMap, new_points, never_retry, failure_mask,
                 cam, config: SLAMConfig):
    K = slam_map.keyframes.n_slots
    pending = _pending_pairs(
        slam_map,
        jnp.broadcast_to(new_points[None], (K, new_points.shape[0]))
        & ~never_retry.T,
    )
    sm, processed, found_kn = _refind_pending_step(
        slam_map, pending, cam, config
    )
    # A point leaves the new-queue once no processable pair remains.
    remaining = pending & ~processed
    return (
        sm,
        new_points & jnp.any(remaining, axis=0),
        never_retry | (processed & ~found_kn).T,
        failure_mask & ~found_kn.T,
    )


@functools.partial(jax.jit, static_argnames=("config",),
                   donate_argnums=(0,))
def refind_failures(slam_map: SLAMMap, never_retry, failure_mask, cam,
                    config: SLAMConfig):
    pending = _pending_pairs(
        slam_map, failure_mask.T & ~never_retry.T
    )
    sm, processed, found_kn = _refind_pending_step(
        slam_map, pending, cam, config
    )
    # Processed entries are consumed whatever the outcome (BA ejections
    # repopulate the queue); unprocessable entries (dead point, already
    # observed, never-retry) are dropped as the wholesale-clearing
    # oracle would; only over-budget leftovers stay queued.
    return (
        sm,
        never_retry | (processed & ~found_kn).T,
        (pending & ~processed).T,
    )
