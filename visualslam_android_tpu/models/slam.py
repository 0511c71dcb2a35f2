"""The SLAM system facade: per-frame entry point, map bootstrap state
machine, and the mapping-stage scheduler.

Capability parity with three reference layers:

- the engine facade ``SystemPTAM`` (jni/jni_part.cpp:16-75): construct
  camera/map/mapmaker/tracker, per-frame update, touch = spacebar;
- the tracker's frame loop and init flow (Tracker::TrackFrame,
  jni/Tracker.cc:76-146; TrackForInitialMap :223-261; TrailTracking_*
  :264-346; AttemptRecovery :163-175);
- the MapMaker priority loop (MapMaker::run, jni/MapMaker.cc:80-123) —
  DISABLED in the reference (pthread_create commented out,
  MapMaker.cc:55-56); here it actually runs, one prioritized work unit
  scheduled after each tracked frame (local BA chunk / refind / global BA
  chunk / failure-queue retry / bad-point handling / keyframe
  integration), realizing the async mapping stage the port dropped.

Host-side Python holds only control state (phase, counters, queues);
all array work happens in the jitted stages of the other modules.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu import native_runtime
from visualslam_android_tpu.config import SLAMConfig
from visualslam_android_tpu.models import bundle as bundle_mod
from visualslam_android_tpu.models import homography
from visualslam_android_tpu.models import keyframe as kf_mod
from visualslam_android_tpu.models import map_store, mapmaker
from visualslam_android_tpu.models import relocalizer
from visualslam_android_tpu.models import tracker as tracker_mod
from visualslam_android_tpu.models import triangulate
from visualslam_android_tpu.models.map_store import (
    SRC_ROOT,
    SRC_TRACKER,
    SRC_TRAIL,
)
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import lie, match
from visualslam_android_tpu.ops import sbi as sbi_ops
from visualslam_android_tpu.utils import profiling

# Bootstrap phases (TrackForInitialMap states, Tracker.cc:218-261).
PHASE_NOT_STARTED = 0
PHASE_TRAILS = 1
PHASE_TRACKING = 2


@dataclasses.dataclass
class FrameResult:
    pose_R: np.ndarray
    pose_t: np.ndarray
    quality: int
    n_found: int
    n_points: int
    n_keyframes: int
    phase: int
    lost: bool
    did_coarse: bool
    added_keyframe: bool
    message: str


class SLAMSystem:
    """Create once, call `track_frame(gray_f32_image)` per frame and
    `on_touch()` for the two bootstrap presses (SystemPTAM semantics,
    jni/jni_part.cpp:49-71)."""

    def __init__(self, config: Optional[SLAMConfig] = None, seed: int = 0):
        self.config = config or SLAMConfig()
        tc = self.config.tracker
        self.cam = cam_ops.make_camera(
            self.config.camera.params(), tc.width, tc.height
        )
        self.key = jax.random.PRNGKey(seed)
        # Per-stage wall-clock profiling (off by default; run_slam
        # --profile enables it). SURVEY.md §5: the reference has no
        # tracing subsystem — this is the capability added in its place.
        self.timer = profiling.StageTimer(enabled=False)
        self.reset()

    # ---- control -----------------------------------------------------

    def reset(self):
        """Tracker::Reset + MapMaker::Reset (Tracker.cc:45-70,
        MapMaker.cc:60-74)."""
        cfg = self.config
        self.slam_map = map_store.empty_map(cfg)
        self.phase = PHASE_NOT_STARTED
        self.R = jnp.eye(3, dtype=jnp.float32)
        self.t = jnp.zeros(3, jnp.float32)
        self.velocity = jnp.zeros(6, jnp.float32)
        self.vel_mag = 0.0
        self.vel_msd_mag = 0.0
        self.sbi_last: Optional[sbi_ops.SBI] = None
        self.lost_frames = 0
        self.just_recovered = False
        self.frame_idx = 0
        self.last_kf_frame = -100
        self.scene_depth_mean = 1.0
        self.wiggle_depth_norm = 1.0
        self.pressed = False
        # Trail state.
        self._trail_first = None   # (frame, extras)
        self._trail_patches = None
        self._trail_init_pos = None
        self._trail_cur_pos = None
        self._trail_valid = None
        self._trail_count = 0
        self._prev_frame = None
        # Mapping-stage state.
        N = cfg.tracker.max_map_points
        K = cfg.mapmaker.max_keyframes
        self.never_retry = jnp.zeros((N, K), bool)
        self.failure_mask = jnp.zeros((N, K), bool)
        self.new_points = jnp.zeros(N, bool)   # mqNewQueue equivalent
        self.kf_queue: List[dict] = []
        self.recent_converged = True
        self.full_converged = True
        self.reset_requested = False
        self._mm_rng = np.random.default_rng(1234)
        # Deferred BA convergence (kind, device scalar) — resolved on the
        # next frame's scheduler flag pull instead of blocking the frame.
        self._pending_ba = None
        # Host-side keyframe bookkeeping (keyframes are never deleted, so
        # count/newest need no device readbacks).
        self._kf_count_host = 0
        self._newest_kf_host = -1

    def on_touch(self):
        """Touch = PTAM spacebar (jni_part.cpp:49-51)."""
        self.pressed = True

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    # ---- per-frame ---------------------------------------------------

    def track_frame(self, img) -> FrameResult:
        """TrackFrame (Tracker.cc:76-146)."""
        cfg = self.config
        with self.timer.stage("frontend"):
            img = jnp.asarray(img, jnp.float32)
            frame = kf_mod.make_frame(img, cfg)
            sbi_cur = sbi_ops.make_sbi(
                frame.pyramid[-1], cfg.tracker.sbi_blur
            )
            self.timer.sync(frame, sbi_cur)
        self.frame_idx += 1
        added_kf = False
        message = ""

        if self.phase == PHASE_TRACKING:
            with self.timer.stage("track"):
                out, message, added_kf, host = self._track(frame, sbi_cur)
                self.timer.sync(self.R, self.t)
            if host is not None:
                quality = host["quality"]
                n_found = host["n_found"]
                did_coarse = host["did_coarse"]
            else:  # relocalization attempt failed this frame
                quality = tracker_mod.QUALITY_BAD
                n_found = 0
                did_coarse = False
            # One unit of mapping work per frame (the restored MapMaker
            # run() loop).
            with self.timer.stage("mapmaker"):
                map_changed = self._mapmaker_step()
        else:
            with self.timer.stage("bootstrap"):
                self._bootstrap(frame, sbi_cur, img)
            host = None
            map_changed = True
            quality = tracker_mod.QUALITY_GOOD
            n_found = self._trail_count
            did_coarse = False
            message = {
                PHASE_NOT_STARTED: "Touch to start map initialization",
                PHASE_TRAILS: f"Trail tracking: {n_found} trails; "
                              "touch again to build map",
                PHASE_TRACKING: "Map built",
            }[self.phase]

        self.sbi_last = sbi_cur
        self._prev_frame = frame
        if self.reset_requested:
            self.reset()
        # Pose and counts come from the batched _track transfer when the
        # map was not touched since; one extra [2] pull otherwise.
        if host is not None and not map_changed:
            pose_R, pose_t = host["pose_R"], host["pose_t"]
            n_points, n_keyframes = host["n_points"], host["n_keyframes"]
        else:
            pose_R = np.asarray(self.R)
            pose_t = np.asarray(self.t)
            counts = np.asarray(jnp.stack([
                self.slam_map.points.count(),
                self.slam_map.keyframes.count(),
            ]))
            n_points, n_keyframes = int(counts[0]), int(counts[1])
        return FrameResult(
            pose_R=pose_R,
            pose_t=pose_t,
            quality=quality,
            n_found=n_found,
            n_points=n_points,
            n_keyframes=n_keyframes,
            phase=self.phase,
            lost=self.lost_frames >= cfg.tracker.max_lost_frames,
            did_coarse=did_coarse,
            added_keyframe=added_kf,
            message=message,
        )

    # ---- normal tracking --------------------------------------------

    def _track(self, frame, sbi_cur):
        cfg = self.config
        tc = cfg.tracker
        lost = self.lost_frames >= tc.max_lost_frames
        recovered = False
        if lost:
            res = relocalizer.attempt_recovery(
                self.slam_map, sbi_cur.template, self.cam,
                cfg.mapmaker.reloc_max_score,
            )
            if not bool(res.success):
                return None, "Lost; attempting relocalization", False, None
            self.R, self.t = res.R, res.t
            self.velocity = jnp.zeros(6, jnp.float32)
            recovered = True
            self.just_recovered = False
        else:
            R_start, t_start = self.R, self.t
            use_sbi = self.sbi_last is not None
            sbi_rot = (
                tracker_mod.calc_sbi_rotation(
                    sbi_cur.template, self.sbi_last, self.cam,
                    tc.sbi_esm_iters,
                )
                if use_sbi
                else jnp.zeros(6, jnp.float32)
            )
            self.R, self.t = tracker_mod.apply_motion_model(
                self.R, self.t, self.velocity, sbi_rot,
                jnp.asarray(use_sbi),
            )

        out = tracker_mod.track_map(
            frame, self.slam_map, self.cam, self.R, self.t,
            jnp.asarray(self.vel_msd_mag, jnp.float32),
            self._next_key(), cfg,
            recovered=recovered or self.just_recovered,
        )
        self.just_recovered = False
        if recovered:
            R_start, t_start = self.R, self.t
        self.R, self.t = out.R, out.t

        # Motion model update (skipped right after recovery: velocity 0).
        f32 = jnp.float32
        depth_new = jnp.where(
            out.depth_stats_valid, out.scene_depth_mean,
            jnp.asarray(self.scene_depth_mean, f32),
        )
        self.velocity, mag, msd = tracker_mod.update_motion_model(
            self.R, self.t, R_start, t_start, self.velocity, depth_new,
            tc.motion_decay,
        )

        # Inlier/outlier bookkeeping for HandleBadPoints.
        pts = self.slam_map.points
        pts = pts._replace(
            inlier_count=pts.inlier_count + out.inlier_inc,
            outlier_count=pts.outlier_count + out.outlier_inc,
        )
        self.slam_map = self.slam_map._replace(points=pts)

        quality_dev = tracker_mod.assess_tracking_quality(
            out.attempted_per_level, out.found_per_level,
            tc.quality_good, tc.quality_lost,
        )
        dist_exc_dev = mapmaker.dist_to_nearest_excessive(
            self.slam_map.keyframes, self.R, self.t,
            cfg.mapmaker.wiggle_scale, cfg.mapmaker.kf_distance_factor,
        )
        need_kf_dev = mapmaker.need_new_keyframe(
            self.slam_map.keyframes, self.R, self.t, depth_new,
            jnp.asarray(self.wiggle_depth_norm, f32),
        )

        # ONE host transfer for every per-frame scalar. Each separate
        # int()/bool()/float() is a device round-trip; over a remote-TPU
        # link those round-trips, not compute, dominated the frame loop.
        n_lvl = out.found_per_level.shape[0]
        stats = np.asarray(jnp.concatenate([
            jnp.stack([
                quality_dev.astype(f32), dist_exc_dev.astype(f32),
                need_kf_dev.astype(f32),
                out.did_coarse.astype(f32), depth_new, mag, msd,
                jnp.sum(out.found).astype(f32),
                self.slam_map.points.count().astype(f32),
                self.slam_map.keyframes.count().astype(f32),
            ]),
            out.found_per_level.astype(f32),
            self.R.reshape(-1), self.t,
        ]))
        quality = int(stats[0])
        self.vel_mag = float(stats[5])
        self.vel_msd_mag = float(stats[6])
        self.scene_depth_mean = float(stats[4])
        found_l = [int(x) for x in stats[10:10 + n_lvl]]
        host = dict(
            quality=quality, did_coarse=bool(stats[3]),
            n_found=int(stats[7]),
            n_points=int(stats[8]), n_keyframes=int(stats[9]),
            pose_R=stats[10 + n_lvl:19 + n_lvl].reshape(3, 3).copy(),
            pose_t=stats[19 + n_lvl:22 + n_lvl].copy(),
        )

        # Distance-to-map sanity demotion (Tracker.cc:867-872).
        if quality == tracker_mod.QUALITY_DODGY and bool(stats[1]):
            quality = tracker_mod.QUALITY_BAD
            host["quality"] = quality
        if quality == tracker_mod.QUALITY_BAD:
            self.lost_frames += 1
        else:
            self.lost_frames = 0
        if recovered:
            self.just_recovered = True  # force coarse next frame

        # Keyframe-add heuristic (Tracker.cc:127-132).
        added = False
        if (
            quality == tracker_mod.QUALITY_GOOD
            and self.frame_idx - self.last_kf_frame
            > tc.min_frames_between_kfs
            and len(self.kf_queue) < tc.max_kf_queue
            and bool(stats[2])
        ):
            self.kf_queue.append(
                dict(
                    frame=frame, R=self.R, t=self.t,
                    found=out.found, found_pos=out.found_pos,
                    level=out.search_level, subpix=out.did_subpix,
                )
            )
            self.last_kf_frame = self.frame_idx
            added = True

        msg = (
            f"Tracking Map, quality {['BAD','DODGY','GOOD'][quality]}. "
            f"Found: {found_l} Map: {host['n_points']}P, "
            f"{host['n_keyframes']}KF"
            + (" Adding key-frame." if added else "")
        )
        return out, msg, added, host

    # ---- bootstrap (TrackForInitialMap) ------------------------------

    def _bootstrap(self, frame, sbi_cur, img):
        cfg = self.config
        tc = cfg.tracker
        if self.phase == PHASE_NOT_STARTED:
            if self.pressed:
                self.pressed = False
                self._trail_start(frame, img)
                self.phase = PHASE_TRAILS
            return
        # PHASE_TRAILS: advance trails each frame.
        n_good = self._trail_advance(frame)
        if n_good < tc.min_trails_to_continue:
            # Reset init (Tracker.cc:245-248).
            self.phase = PHASE_NOT_STARTED
            self._trail_first = None
            return
        if self.pressed:
            self.pressed = False
            ok = self._init_from_stereo(frame)
            if ok:
                self.phase = PHASE_TRACKING
            else:
                self.phase = PHASE_NOT_STARTED

    def _trail_start(self, frame, img):
        """TrailTracking_Start (Tracker.cc:264-291): sample MiniPatches at
        the best Shi-Tomasi candidates of level 0."""
        cfg = self.config
        extras = kf_mod.make_frame_extras(frame, cfg)
        self._trail_first = (frame, extras)
        xy = extras.cand_xy[0]
        valid = extras.cand_valid[0]
        n = min(cfg.tracker.max_trails, xy.shape[0])
        pos = xy[:n].astype(jnp.float32)
        self._trail_patches = match.sample_minipatches(
            frame.pyramid[0], pos, cfg.patch.mini_half_patch
        )
        self._trail_init_pos = pos
        self._trail_cur_pos = pos
        self._trail_valid = valid[:n]
        self._trail_count = int(self._trail_valid.sum())

    def _trail_advance(self, frame):
        """TrailTracking_Advance (Tracker.cc:294-346): forward MiniPatch
        search + backwards married-match (tolerance 2 px^2)."""
        cfg = self.config
        tc = cfg.tracker
        prev = self._prev_frame
        fwd = match.find_minipatch(
            frame.pyramid[0], frame.corner_mask[0], self._trail_patches,
            self._trail_cur_pos, self._trail_valid,
            search_range=tc.trail_search_range,
            half_patch=cfg.patch.mini_half_patch,
            max_ssd=tc.trail_max_ssd,
        )
        # Backwards check: sample patches at the found positions and
        # search back in the previous frame.
        back_patches = match.sample_minipatches(
            frame.pyramid[0], fwd.pos, cfg.patch.mini_half_patch
        )
        bwd = match.find_minipatch(
            prev.pyramid[0], prev.corner_mask[0], back_patches, fwd.pos,
            self._trail_valid & fwd.found,
            search_range=tc.trail_search_range,
            half_patch=cfg.patch.mini_half_patch,
            max_ssd=tc.trail_max_ssd,
        )
        d = bwd.pos - self._trail_cur_pos
        married = jnp.sum(d * d, axis=-1) <= 2.0
        good = self._trail_valid & fwd.found & bwd.found & married
        self._trail_cur_pos = jnp.where(
            good[:, None], fwd.pos, self._trail_cur_pos
        )
        self._trail_valid = good
        self._trail_count = int(good.sum())
        return self._trail_count

    def _init_from_stereo(self, frame_second) -> bool:
        """InitFromStereo (MapMaker.cc:204-376), synchronous as in the
        reference."""
        cfg = self.config
        mc = cfg.mapmaker
        frame_first, extras_first = self._trail_first
        extras_second = kf_mod.make_frame_extras(frame_second, cfg)

        a = self._trail_init_pos
        b = self._trail_cur_pos
        valid = self._trail_valid
        m_a = cam_ops.unproject(self.cam, a)
        m_b = cam_ops.unproject(self.cam, b)
        _, jac = cam_ops.project_derivs(self.cam, m_b)
        res = homography.compute(
            m_a, m_b, jac, valid, self._next_key(),
            max_pixel_error=mc.max_pixel_error, n_trials=mc.mlesac_trials,
            refine_iters=mc.homography_refine_iters,
        )
        if not bool(res.success):
            return False
        t_mag = float(jnp.linalg.norm(res.t))
        if t_mag == 0.0:
            return False
        R2 = res.R
        t2 = res.t * (mc.wiggle_scale / t_mag)

        # Insert the two keyframes.
        sm = map_store.empty_map(cfg)
        kfs = kf_mod.insert_keyframe(
            sm.keyframes, 0, frame_first, extras_first,
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            fixed=True,
        )
        kfs = kf_mod.insert_keyframe(
            kfs, 1, frame_second, extras_second, R2, t2, fixed=False
        )
        sm = sm._replace(keyframes=kfs)

        # Build points from the trail matches (MapMaker.cc:262-339).
        T = a.shape[0]
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
        m_b2 = cam_ops.unproject(self.cam, sp.pos_zero)
        I3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (T, 3, 3))
        z3 = jnp.zeros((T, 3), jnp.float32)
        pos_w = triangulate.triangulate(
            I3, z3,
            jnp.broadcast_to(R2, (T, 3, 3)), jnp.broadcast_to(t2, (T, 3)),
            m_a, m_b2,
        )
        ok &= pos_w[:, 2] > 0.0  # (MapMaker.cc:313-316)
        n_ok = int(ok.sum())
        if n_ok < 10:
            return False

        # Pack into point slots 0..T (capacity permitting).
        epi_like = mapmaker.EpipolarResult(
            success=ok, pos_w=pos_w, src_uv=a, target_uv=sp.pos_zero
        )
        sm, new_mask = mapmaker.insert_new_points(
            sm, self.cam, epi_like, 0, 1, 0,
            cfg.tracker.max_map_points,
        )
        # First measurement source is SRC_ROOT (set by insert), second
        # should be SRC_TRAIL rather than SRC_EPIPOLAR (MapMaker.cc:331).
        meas = sm.meas
        fix = new_mask[:, None] & (meas.kf == 1) & meas.valid
        meas = meas._replace(
            source=jnp.where(fix, SRC_TRAIL, meas.source)
        )
        sm = sm._replace(meas=meas)

        # 5x BundleAdjustAll (MapMaker.cc:346-347).
        self.slam_map = sm
        self._kf_count_host = 2
        self._newest_kf_host = 1
        for _ in range(5):
            self._run_global_ba(max_iters=10)
        self.slam_map = kf_mod.refresh_scene_depth(self.slam_map, 0)
        self.slam_map = kf_mod.refresh_scene_depth(self.slam_map, 1)
        self.scene_depth_mean = float(
            self.slam_map.keyframes.depth_mean[0]
        )
        self.wiggle_depth_norm = mc.wiggle_scale / max(
            self.scene_depth_mean, 1e-6
        )

        # Epipolar growth at levels 0,3,1,2 (MapMaker.cc:355-358).
        for lvl in (0, 3, 1, 2):
            self._add_some_map_points(1, lvl)

        # BA until converged (MapMaker.cc:363-367).
        for _ in range(8):
            if self._run_global_ba(max_iters=10):
                break
        if self.reset_requested:
            return False

        # Dominant-plane alignment (MapMaker.cc:369-372).
        Rp, tp, plane_ok = mapmaker.calc_plane_aligner(
            self.slam_map, self._next_key(), cfg
        )
        if bool(plane_ok):
            self.slam_map = mapmaker.apply_global_transformation(
                self.slam_map, Rp, tp
            )
        self.slam_map = self.slam_map._replace(good=jnp.asarray(True))
        self.R = self.slam_map.keyframes.R[1]
        self.t = self.slam_map.keyframes.t[1]
        self.velocity = jnp.zeros(6, jnp.float32)
        self.last_kf_frame = self.frame_idx
        return True

    # ---- mapping stage (MapMaker::run priorities) --------------------

    def _next_mapmaker_task(self) -> int:
        """Ask the scheduler (native C++ when built, Python mirror
        otherwise — both encode the MapMaker.cc:80-123 ladder) which ONE
        unit of mapping work to dispatch next."""
        sched = (
            native_runtime.scheduler_next
            if native_runtime.available()
            else native_runtime.scheduler_next_py
        )
        # One batched pull for the queue flags AND last frame's deferred
        # BA convergence (separate bool() casts would each be a device
        # round-trip per frame).
        vals = [jnp.any(self.failure_mask), jnp.any(self.new_points)]
        pend = self._pending_ba
        if pend is not None:
            vals.extend([pend[1], pend[2]])
        flags = np.asarray(jnp.stack([
            jnp.asarray(v, jnp.bool_) for v in vals
        ]))
        if pend is not None:
            self._pending_ba = None
            conv = bool(flags[2])
            if not bool(flags[3]):
                # Corrupt adjustment: request the full map reset
                # (MapMaker.cc:906-915); track_frame performs it.
                self.reset_requested = True
            elif pend[0] == "recent":
                self.recent_converged = conv
                if not conv:
                    self.full_converged = False
            else:  # "full"
                self.full_converged = conv
                if conv:
                    self.recent_converged = True
        return sched(
            len(self.kf_queue),
            self.recent_converged,
            self.full_converged,
            bool(flags[0]),
            bool(flags[1]),
            self._mm_rng.integers(20) == 0,
        )

    def _mapmaker_step(self):
        """One prioritized unit of mapping work (MapMaker.cc:80-123),
        chosen by the scheduler; HandleBadPoints then runs unconditionally
        as in every pass of the reference's run() loop (MapMaker.cc:116)."""
        task = self._next_mapmaker_task()
        if task == native_runtime.TASK_ADD_KEYFRAME:
            self._add_keyframe_from_queue()
        elif task == native_runtime.TASK_BA_RECENT:
            self._run_local_ba()
        elif task == native_runtime.TASK_REFIND_NEWLY:
            self._refind_newly_made()
        elif task == native_runtime.TASK_BA_ALL:
            self._run_global_ba(max_iters=6, sync=False)
        elif task == native_runtime.TASK_REFIND_FAILURES:
            self._refind_from_failure_queue()
        points_trashed = self._handle_bad_points()
        # Whether point/keyframe counts may have moved this step (lets the
        # caller reuse the tracking step's batched count transfer).
        return task != native_runtime.TASK_NONE or points_trashed

    def _free_kf_slot(self) -> Optional[int]:
        valid = np.asarray(self.slam_map.keyframes.valid)
        free = np.nonzero(~valid)[0]
        return int(free[0]) if len(free) else None

    def _add_keyframe_from_queue(self):
        """AddKeyFrameFromTopOfQueue (MapMaker.cc:481-506)."""
        cfg = self.config
        entry = self.kf_queue.pop(0)
        slot = self._free_kf_slot()
        if slot is None:
            return  # capacity full: drop (reference never hits this)
        extras = kf_mod.make_frame_extras(entry["frame"], cfg)
        kfs = kf_mod.insert_keyframe(
            self.slam_map.keyframes, slot, entry["frame"], extras,
            entry["R"], entry["t"], fixed=False,
        )
        self.slam_map = self.slam_map._replace(keyframes=kfs)
        self._kf_count_host += 1
        self._newest_kf_host = slot
        # Register the tracker's measurements (SRC_TRACKER).
        meas = mapmaker.add_measurements_batch(
            self.slam_map.meas, entry["found"], slot, entry["found_pos"],
            entry["level"], SRC_TRACKER, entry["subpix"],
        )
        self.slam_map = self.slam_map._replace(meas=meas)
        self.slam_map = kf_mod.refresh_scene_depth(self.slam_map, slot)
        # ReFindInSingleKeyFrame (MapMaker.cc:497).
        self._refind_in_kf(slot, self.slam_map.points.valid)
        # Epipolar growth, levels 3,0,1,2 (MapMaker.cc:499-502).
        for lvl in (3, 0, 1, 2):
            self._add_some_map_points(slot, lvl)
        self.recent_converged = False
        self.full_converged = False

    def _add_some_map_points(self, src_kf: int, level: int):
        """AddSomeMapPoints (MapMaker.cc:427-437): thin candidates, then
        epipolar-search all of them against the closest keyframe."""
        cfg = self.config
        target, _ = mapmaker.closest_keyframe(
            self.slam_map.keyframes,
            self.slam_map.keyframes.R[src_kf],
            self.slam_map.keyframes.t[src_kf],
            exclude=src_kf,
        )
        target = int(target)
        if target == src_kf or not bool(
            self.slam_map.keyframes.valid[target]
        ):
            return
        self.slam_map = mapmaker.thin_candidates(
            self.slam_map, src_kf, level, cfg.mapmaker.thin_candidates_radius
        )
        res = mapmaker.epipolar_search(
            self.slam_map, src_kf, target, self.cam, level, cfg
        )
        self.slam_map, new_mask = mapmaker.insert_new_points(
            self.slam_map, self.cam, res, src_kf, target, level,
            cfg.mapmaker.max_epi_candidates,
        )
        self.new_points = self.new_points | new_mask

    def _refind_in_kf(self, kf_idx: int, point_mask):
        cfg = self.config
        mask = point_mask & ~self.never_retry[:, kf_idx]
        self.slam_map, found, never_new = mapmaker.refind_in_keyframe(
            self.slam_map, kf_idx, self.cam, mask, cfg
        )
        self.never_retry = self.never_retry.at[:, kf_idx].set(
            self.never_retry[:, kf_idx] | never_new
        )
        self.failure_mask = self.failure_mask.at[:, kf_idx].set(
            self.failure_mask[:, kf_idx] & ~found
        )
        return found

    def _refind_batched(self, point_mask_kn):
        """One points x keyframes refind dispatch + queue bookkeeping."""
        mask_kn = point_mask_kn & ~self.never_retry.T
        sm, found_kn, never_kn = mapmaker.refind_in_keyframes_batched(
            self.slam_map, self.cam, mask_kn, self.config
        )
        self.slam_map = sm
        self.never_retry = self.never_retry | never_kn.T
        self.failure_mask = self.failure_mask & ~found_kn.T

    def _refind_newly_made(self):
        """ReFindNewlyMade (MapMaker.cc:1061-1080): all new points against
        ALL keyframes in one jitted points x KFs stage (SURVEY §7.7) —
        the per-keyframe host loop would be O(K) dispatches."""
        new = self.new_points
        self.new_points = jnp.zeros_like(new)
        K = self.slam_map.keyframes.n_slots
        self._refind_batched(jnp.broadcast_to(new[None], (K, new.shape[0])))

    def _refind_from_failure_queue(self):
        """ReFindFromFailureQueue (MapMaker.cc:1083-1095), same batched
        stage with the per-keyframe pending masks."""
        pending = self.failure_mask
        self.failure_mask = jnp.zeros_like(self.failure_mask)
        self._refind_batched(pending.T & self.slam_map.points.valid[None])

    def _handle_bad_points(self) -> bool:
        self.slam_map, newly_bad = mapmaker.handle_bad_points(
            self.slam_map, self.config
        )
        trashed = bool(jnp.any(newly_bad))
        if trashed:
            self.new_points = self.new_points & ~newly_bad
        return trashed

    def _run_local_ba(self):
        """BundleAdjustRecent (MapMaker.cc:801-851). Convergence is read
        back one frame later (_pending_ba) — the reference's mapmaker
        thread is equally asynchronous relative to the tracker."""
        cfg = self.config
        if self._kf_count_host < cfg.mapmaker.local_ba_min_kfs:
            self.recent_converged = True
            return
        adjust = mapmaker.local_ba_adjust_mask(
            self.slam_map, self._newest_kf_host, cfg
        )
        conv, ok = self._run_ba(adjust, max_iters=8)
        self._pending_ba = ("recent", conv, ok)

    def _run_global_ba(self, max_iters=10, sync=True) -> bool:
        """BundleAdjustAll. sync=True (bootstrap) blocks on the result,
        matching the reference's synchronous InitFromStereo BA; the
        scheduler path passes sync=False and resolves convergence on the
        next frame's flag pull."""
        kfs = self.slam_map.keyframes
        adjust = kfs.valid & ~kfs.fixed
        conv, okd = self._run_ba(adjust, max_iters=max_iters)
        if sync:
            pulled = np.asarray(jnp.stack([conv, okd]))
            if not bool(pulled[1]):
                self.reset_requested = True
                return False
            converged = bool(pulled[0])
            self.full_converged = converged
            if converged:
                self.recent_converged = True
            return converged
        self._pending_ba = ("full", conv, okd)
        return False

    def _run_ba(self, adjust_mask, max_iters) -> bool:
        cfg = self.config
        prob = mapmaker.build_ba_problem(self.slam_map, adjust_mask, cfg)
        # Above dense_solver_max_cams camera slots, switch to a
        # KITTI-scale path: band Schur assembly + local CG on the block
        # band when every co-observing pair fits the band (odometry maps
        # — the mesh-friendly choice, one small psum per inner iteration
        # and zero in-loop collectives), otherwise matrix-free PCG.
        bc = cfg.bundle
        large = prob.cam_R.shape[0] > bc.dense_solver_max_cams
        if large:
            offset = bundle_mod.max_pair_offset(
                prob.meas_kf, prob.meas_valid
            )
            banded = offset <= bc.band_halfwidth
            assembly = "band" if banded else "scatter"
            solver = "band_pcg" if banded else "pcg"
        else:
            assembly, solver = "onehot", "chol"
        res = bundle_mod.bundle_adjust(
            prob, self.cam, max_iters=max_iters,
            point_block=bc.point_block,
            assembly=assembly, solver=solver,
            band_halfwidth=bc.band_halfwidth,
            cg_iters=bc.cg_iters, cg_tol=bc.cg_tol,
            update_conv=bc.update_convergence,
            min_sigma_sq=bc.min_tukey_sigma ** 2,
            lambda_init=bc.lambda_init, lambda_good=bc.lambda_good,
            lambda_factor_init=bc.lambda_factor_init,
        )
        sm, retry, never, died = mapmaker.apply_ba_result(
            self.slam_map, prob, res, cfg
        )
        self.slam_map = sm
        # Route ejected measurements (MapMaker.cc:917-959).
        K = self.never_retry.shape[1]
        retry_nk = _obs_mask_to_point_kf(retry, res, prob, K)
        never_nk = _obs_mask_to_point_kf(never, res, prob, K)
        self.failure_mask = self.failure_mask | retry_nk
        self.never_retry = self.never_retry | never_nk
        # DEVICE scalars — callers that can tolerate a one-frame lag queue
        # them as _pending_ba instead of blocking on the transfer. `ok`
        # False means the adjustment corrupted the map (non-finite pose or
        # point) — the reference's negative-return reset tier
        # (MapMaker.cc:906-915).
        ok = jnp.all(jnp.isfinite(res.cam_t)) & jnp.all(
            jnp.isfinite(res.points)
        )
        return res.converged, ok


def _obs_mask_to_point_kf(obs_mask, res, prob, K):
    """[N, O] measurement mask -> [N, K] point-keyframe mask."""
    oh = jax.nn.one_hot(prob.meas_kf, K, dtype=jnp.float32)
    return (
        jnp.einsum("no,nok->nk", obs_mask.astype(jnp.float32), oh) > 0.5
    )
