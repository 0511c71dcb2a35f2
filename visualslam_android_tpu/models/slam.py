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
  chunk / failure-queue retry / keyframe integration), realizing the
  async mapping stage the port dropped.

Dispatch discipline (the TPU-native replacement for the reference's
two-thread design): every per-frame array computation is ONE jitted
program (models/frame_step.frame_step — front-end, SBI prior, motion
model, TrackMap, quality, bad-point handling), every mapping task is ONE
jitted program, and every scalar the host control loop needs rides back
in frame_step's packed ``stats`` vector, so steady-state tracking costs
exactly one synchronous device->host transfer per frame — or zero with
``pipelined=True``, where each frame's stats transfer starts on a worker
thread at dispatch and is resolved ``pipeline_depth`` frames later
(depth 1: results lag one frame, bit-identical to sync mode; depth d>=2:
the full d2h round-trip hides behind later frames' work — the remote-TPU
throughput mode; ``FrameResult.frame_id`` says which frame a result
belongs to, and ``flush()`` drains the in-flight tail). Over a
remote-TPU link one synchronous pull costs ~30 ms, which is why the
reference-style blocking loop (3-4 pulls/frame plus dozens of eager
dispatches) ran at ~1 fps while the same math as fused programs runs at
tracking rate.

Host-side Python holds only control state (phase, counters, queues, and
one-frame-stale mirrors of the device queue flags).
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu import native_runtime
from visualslam_android_tpu.config import SLAMConfig
from visualslam_android_tpu.models import bundle as bundle_mod
from visualslam_android_tpu.models import frame_step as fstep
from visualslam_android_tpu.models import homography
from visualslam_android_tpu.models import keyframe as kf_mod
from visualslam_android_tpu.models import map_store, mapmaker
from visualslam_android_tpu.models import relocalizer
from visualslam_android_tpu.models import tracker as tracker_mod
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import match
from visualslam_android_tpu.ops import sbi as sbi_ops
from visualslam_android_tpu.utils import profiling

# Bootstrap phases (TrackForInitialMap states, Tracker.cc:218-261).
PHASE_NOT_STARTED = 0
PHASE_TRAILS = 1
PHASE_TRACKING = 2


@dataclasses.dataclass
class FrameResult:
    """Per-frame output of :meth:`SLAMSystem.track_frame`.

    ``valid`` is False ONLY for the pipelined warm-up placeholder (the
    first tracked frame's real result is still in flight; it arrives at
    the next call or via ``flush()``). Placeholders also carry
    ``frame_id=-1`` and identity pose — consumers must skip them when
    counting tracked frames or accumulating trajectories."""

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
    frame_id: int = -1  # which track_frame call this result belongs to
    valid: bool = True  # False: warm-up placeholder, not a real frame


class SLAMSystem:
    """Create once, call `track_frame(gray_f32_image)` per frame and
    `on_touch()` for the two bootstrap presses (SystemPTAM semantics,
    jni/jni_part.cpp:49-71).

    pipelined=False (default): track_frame returns THIS frame's result
    (one synchronous stats pull per frame). pipelined=True: the stats
    transfer is asynchronous and track_frame returns the PREVIOUS
    frame's result (zero blocking transfers per steady-state frame);
    call flush() after the last frame for the final result."""

    def __init__(self, config: Optional[SLAMConfig] = None, seed: int = 0,
                 pipelined: bool = False, pipeline_depth: int = 1):
        """pipeline_depth (pipelined mode only): how many frames may be
        in flight before track_frame blocks on the oldest one's stats.
        Depth 1 (default) keeps results exactly one frame late and
        BIT-IDENTICAL to sync mode (test_pipelined_matches_sync). Depth
        d>=2 lets the stats transfer's full tunnel round-trip overlap
        d-1 later frames' dispatch+compute — the throughput mode for
        remote-TPU deployment (the d2h RTT is ~30 ms, an entire frame
        budget) — at the cost of host decisions (lost counting, KF
        adds, tier-3 resets) trailing d frames instead of one. The
        reference's tracker/mapmaker thread pair tolerates the same
        class of lag through its racing bool flags (MapMaker.h:114-118);
        d bounds ours explicitly."""
        self.config = config or SLAMConfig()
        tc = self.config.tracker
        self.pipelined = pipelined
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.cam = cam_ops.make_camera(
            self.config.camera.params(), tc.width, tc.height
        )
        self.key = jax.random.PRNGKey(seed)
        # Per-stage wall-clock profiling (off by default; run_slam
        # --profile enables it). SURVEY.md §5: the reference has no
        # tracing subsystem — this is the capability added in its place.
        self.timer = profiling.StageTimer(enabled=False)
        self._pending_zero = jnp.zeros(2, jnp.float32)
        # Results not yet handed to the caller (pipelined mode can
        # produce two in one call around lost/bootstrap edges). Survives
        # reset() so no result is dropped.
        self._result_backlog: List[FrameResult] = []
        # Pipelined mode pulls each frame's stats on a worker thread the
        # moment the frame is dispatched: over a remote-TPU tunnel the
        # d2h RTT (~30 ms) then overlaps the next frame's dispatch +
        # compute instead of serializing the loop (measured: concurrent
        # pulls overlap to ~one RTT total). _process_ctx just waits on
        # the future — by then the transfer is usually done.
        self._pull_pool = (
            ThreadPoolExecutor(max_workers=max(2, self.pipeline_depth))
            if pipelined else None
        )
        self.reset()

    # ---- control -----------------------------------------------------

    def reset(self):
        """Tracker::Reset + MapMaker::Reset (Tracker.cc:45-70,
        MapMaker.cc:60-74)."""
        cfg = self.config
        f32 = jnp.float32
        self.slam_map = map_store.empty_map(cfg)
        self.phase = PHASE_NOT_STARTED
        self.R = jnp.eye(3, dtype=f32)
        self.t = jnp.zeros(3, f32)
        self.velocity = jnp.zeros(6, f32)
        self._msd = jnp.zeros((), f32)       # scene-depth-scaled |v|
        self._depth = jnp.ones((), f32)      # scene depth mean
        self._wiggle_dev = jnp.ones((), f32)  # wiggle_depth_norm
        self.vel_mag = 0.0                   # observability mirrors
        self.scene_depth_mean = 1.0
        self.wiggle_depth_norm = 1.0
        self.sbi_last: Optional[sbi_ops.SBI] = None
        self.lost_frames = 0
        self.just_recovered = False
        self.frame_idx = 0
        self.last_kf_frame = -100
        self.pressed = False
        # Trail state.
        self._trail_first = None   # (frame, extras)
        self._trail_patches = None
        self._trail_init_pos = None
        self._trail_cur_pos = None
        self._trail_valid = None
        self._trail_count = 0
        self._prev_frame = None
        # Mapping-stage state (device) + host mirrors of its queue flags
        # (refreshed from each frame's stats pull, so one frame stale —
        # the scheduler tolerates that the same way the reference's
        # mapmaker thread tolerates racing the tracker's flag writes).
        N = cfg.tracker.max_map_points
        K = cfg.mapmaker.max_keyframes
        self.never_retry = jnp.zeros((N, K), bool)
        self.failure_mask = jnp.zeros((N, K), bool)
        self.new_points = jnp.zeros(N, bool)   # mqNewQueue equivalent
        self._any_failure_host = False
        self._any_new_host = False
        self.kf_queue: List[dict] = []
        self.recent_converged = True
        self.full_converged = True
        self.reset_requested = False
        self._mm_rng = np.random.default_rng(1234)
        # Deferred BA convergence (kind, conv, ok device scalars) —
        # threaded through the next frame_step's `pending` input and
        # resolved at that frame's stats processing.
        self._pending_ba = None
        # Pipelined-mode in-flight frame contexts (FIFO, at most
        # pipeline_depth deep; empty in sync mode between calls).
        self._ctxs: List[dict] = []
        # Host-side bookkeeping (keyframes are never deleted; slots fill
        # sequentially — no device readbacks needed).
        self._kf_count_host = 0
        self._newest_kf_host = -1
        self._n_points_host = 0
        self._band_choice = None

    def on_touch(self):
        """Touch = PTAM spacebar (jni_part.cpp:49-51)."""
        self.pressed = True

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    # ---- per-frame ---------------------------------------------------

    def _drain_ctxs(self):
        """Resolve every in-flight frame (oldest first) into the result
        backlog — called before any path that reads host decision state
        (reset servicing, lost/reloc, flush)."""
        while self._ctxs:
            self._result_backlog.append(self._process_ctx())

    def track_frame(self, img) -> FrameResult:
        """TrackFrame (Tracker.cc:76-146)."""
        # Pipelined mode: resolve in-flight frames down to depth-1 —
        # their decisions (KF add, quality/lost, BA convergence) feed
        # this frame's scheduling (at depth 1 that is exactly "resolve
        # the previous frame first").
        while len(self._ctxs) >= self.pipeline_depth:
            self._result_backlog.append(self._process_ctx())
        # Tier-3 recovery (MapMaker.cc:906-915): a corrupting BA requests
        # a full map reset; service it at the top of EVERY frame — sync
        # mode resolves its pending BA inside the previous _process_ctx
        # (after its ctx was already consumed), so the flag must be
        # checked here unconditionally, not only on the pipelined path.
        # Frames still in flight tracked against the corrupt map; their
        # results resolve first (the non-finite stats path demotes them).
        if self.reset_requested:
            self._drain_ctxs()
            self.reset()

        fid = self.frame_idx
        self.frame_idx += 1
        if self.phase == PHASE_TRACKING:
            res = self._tracking_frame(img, fid)
        else:
            res = self._bootstrap_frame(img, fid)

        if res is not None:
            self._result_backlog.append(res)
        if self._result_backlog:
            return self._result_backlog.pop(0)
        if self.pipelined and self._ctxs:
            # Warm-up edge: the first tracked frame's result is still in
            # flight. Emit a placeholder (frame_id=-1) rather than block;
            # the real result arrives at the next call (or via flush()).
            return FrameResult(
                pose_R=np.eye(3, dtype=np.float32),
                pose_t=np.zeros(3, np.float32),
                quality=tracker_mod.QUALITY_GOOD, n_found=0,
                n_points=self._n_points_host,
                n_keyframes=self._kf_count_host,
                phase=self.phase, lost=False, did_coarse=False,
                added_keyframe=False,
                message="(pipelined warm-up: result pending)",
                frame_id=-1, valid=False,
            )
        return self._process_ctx()

    def flush(self) -> List[FrameResult]:
        """Pipelined mode: drain every not-yet-delivered result (up to
        pipeline_depth in-flight frames plus backlog edge cases)."""
        if self._ctxs:
            self._drain_ctxs()
            if self.reset_requested:
                self.reset()
        out, self._result_backlog = self._result_backlog, []
        return out

    # ---- bootstrap frames ---------------------------------------------

    def _bootstrap_frame(self, img, fid) -> FrameResult:
        cfg = self.config
        with self.timer.stage("frontend"):
            img = jnp.asarray(img, jnp.float32)
            frame, sbi_cur = fstep.bootstrap_frontend(img, cfg)
            self.timer.sync(frame, sbi_cur)
        with self.timer.stage("bootstrap"):
            self._bootstrap(frame, sbi_cur, img)
        self.sbi_last = sbi_cur
        self._prev_frame = frame
        if self.reset_requested:
            self.reset()
        n_found = self._trail_count
        message = {
            PHASE_NOT_STARTED: "Touch to start map initialization",
            PHASE_TRAILS: f"Trail tracking: {n_found} trails; "
                          "touch again to build map",
            PHASE_TRACKING: "Map built",
        }[self.phase]
        return FrameResult(
            pose_R=np.asarray(self.R), pose_t=np.asarray(self.t),
            quality=tracker_mod.QUALITY_GOOD, n_found=n_found,
            n_points=self._n_points_host,
            n_keyframes=self._kf_count_host,
            phase=self.phase, lost=False, did_coarse=False,
            added_keyframe=False, message=message, frame_id=fid,
        )

    # ---- normal tracking ----------------------------------------------

    def _tracking_frame(self, img, fid) -> Optional[FrameResult]:
        """Dispatch the fused frame step + one mapping task; returns the
        FrameResult in sync mode, None in pipelined steady state."""
        cfg = self.config
        tc = cfg.tracker
        img = jnp.asarray(img, jnp.float32)
        lost = self.lost_frames >= tc.max_lost_frames

        use_prior, forced_coarse, recovered = True, False, False
        if lost:
            # The reloc path reads and writes host decision state
            # synchronously: resolve any in-flight frames first so its
            # inputs (lost counts, queue flags) are current and results
            # stay ordered.
            self._drain_ctxs()
            with self.timer.stage("reloc"):
                frame, sbi_cur = fstep.bootstrap_frontend(img, cfg)
                res = relocalizer.attempt_recovery(
                    self.slam_map, sbi_cur.template, self.cam,
                    cfg.mapmaker.reloc_max_score,
                )
                success = bool(res.success)  # sync pull (rare path)
            if not success:
                # No frame_step runs on this path, so a deferred BA
                # result can't ride the stats vector — resolve it NOW,
                # before _mapmaker_step can dispatch another BA over it.
                # During a lost streak this is what notices an ok=False
                # (map-corrupting) BA and requests the tier-3 reset.
                self._resolve_pending_sync()
                self.sbi_last = sbi_cur
                self._prev_frame = frame
                with self.timer.stage("mapmaker"):
                    self._mapmaker_step()
                return self._lost_result(fid)
            # Tracker.cc:163-174: adopt the recovered pose, zero the
            # motion model, force the coarse stage.
            self.R, self.t = res.R, res.t
            self.velocity = jnp.zeros(6, jnp.float32)
            use_prior, forced_coarse, recovered = False, True, True
        elif self.just_recovered:
            forced_coarse = True  # one more forced-coarse frame
        self.just_recovered = False

        pend = self._pending_ba
        if pend is not None:
            pending_vec = jnp.stack([
                pend[1].astype(jnp.float32), pend[2].astype(jnp.float32)
            ])
            pending_kind = pend[0]
            self._pending_ba = None
        else:
            pending_vec = self._pending_zero
            pending_kind = None

        R_before, t_before = self.R, self.t
        with self.timer.stage("frame_step"):
            out = fstep.frame_step(
                img, self.slam_map, self.cam, self.R, self.t,
                self.velocity, self._msd, self._depth, self._wiggle_dev,
                self.sbi_last, self.new_points, self.failure_mask,
                pending_vec, self.key, cfg,
                use_prior=use_prior, forced_coarse=forced_coarse,
            )
            self.timer.sync(out.stats)
        self.slam_map = out.slam_map
        self.R, self.t, self.velocity = out.R, out.t, out.velocity
        self._msd, self._depth = out.msd, out.depth
        self.sbi_last = out.sbi
        self.key = out.key
        self.new_points = out.new_points
        self._prev_frame = out.frame
        if recovered:
            self.just_recovered = True  # force coarse next frame too

        with self.timer.stage("mapmaker"):
            self._mapmaker_step()

        ctx = dict(
            stats=out.stats, frame=out.frame, found=out.found,
            found_pos=out.found_pos, search_level=out.search_level,
            did_subpix=out.did_subpix, R=out.R, t=out.t,
            R_before=R_before, t_before=t_before,
            pending_kind=pending_kind, recovered=recovered, fid=fid,
        )
        self._ctxs.append(ctx)
        if self.pipelined:
            # Start the stats transfer NOW on a worker thread (a plain
            # blocking np.asarray there): the tunnel RTT runs behind the
            # following frames' dispatch + device compute — fully hidden
            # once pipeline_depth >= 2. (copy_to_host_async on the MAIN
            # thread was measured slower in r4 — its request is itself a
            # blocking RPC; a worker thread sidesteps that.)
            ctx["stats_future"] = self._pull_pool.submit(
                np.asarray, out.stats
            )
            return None
        return self._process_ctx()

    def _resolve_pending_sync(self):
        """Consume a deferred BA result with a blocking pull (rare paths
        only: the lost/failed-reloc frame, and a new BA dispatch racing an
        unconsumed one). Keeps convergence updates and ok=False
        (reset-requesting) results from vanishing when no frame_step is
        there to carry them."""
        if self._pending_ba is None:
            return
        kind, conv, okd = self._pending_ba
        self._pending_ba = None
        pulled = np.asarray(jnp.stack([
            jnp.asarray(conv, jnp.float32), jnp.asarray(okd, jnp.float32)
        ]))
        self._resolve_pending(kind, bool(pulled[0] > 0.5),
                              bool(pulled[1] > 0.5))

    def _resolve_pending(self, kind: str, conv: bool, ok: bool):
        """Deferred BA convergence resolution — the reference's negative
        Bundle::Compute return triggers a map reset (MapMaker.cc:906-915);
        convergence flags drive the scheduler ladder."""
        if not ok:
            self.reset_requested = True
        elif kind == "recent":
            self.recent_converged = conv
            if not conv:
                self.full_converged = False
        else:  # "full"
            self.full_converged = conv
            if conv:
                self.recent_converged = True

    def _process_ctx(self) -> FrameResult:
        """Pull the oldest in-flight frame's packed stats (the loop's ONE
        transfer) and run every host-side decision on it."""
        ctx = self._ctxs.pop(0)
        cfg = self.config
        tc = cfg.tracker
        with self.timer.stage("stats_pull"):
            fut = ctx.get("stats_future")
            stats = fut.result() if fut is not None else np.asarray(
                ctx["stats"]
            )
        S = fstep
        finite = bool(np.isfinite(stats).all())

        if finite:
            quality = int(stats[S.STAT_QUALITY])
            pose_R = (
                stats[S.STAT_POSE_R:S.STAT_POSE_R + 9]
                .reshape(3, 3).copy()
            )
            pose_t = stats[S.STAT_POSE_T:S.STAT_POSE_T + 3].copy()
            self.vel_mag = float(stats[S.STAT_VEL_MAG])
            self.scene_depth_mean = float(stats[S.STAT_DEPTH])
            self._n_points_host = int(stats[S.STAT_N_POINTS])
            self._any_failure_host = stats[S.STAT_ANY_FAILURE] > 0.5
            self._any_new_host = stats[S.STAT_ANY_NEW] > 0.5
            n_found = int(stats[S.STAT_N_FOUND])
            n_points = int(stats[S.STAT_N_POINTS])
            n_keyframes = int(stats[S.STAT_N_KEYFRAMES])
            did_coarse = bool(stats[S.STAT_DID_COARSE] > 0.5)
            found_l = [
                int(x)
                for x in stats[S.STAT_FOUND_L0:S.STAT_FOUND_L0
                               + fstep.N_LEVELS]
            ]
        else:
            # A corrupting BA is applied immediately but detected one
            # frame later (_pending_ba, mirroring the reference's async
            # mapmaker thread). This frame tracked against a non-finite
            # map: demote to BAD and keep the pre-track pose so the
            # FrameResult never carries NaN (ADVICE r2).
            quality = tracker_mod.QUALITY_BAD
            self.R, self.t = ctx["R_before"], ctx["t_before"]
            self.velocity = jnp.zeros(6, jnp.float32)
            self._msd = jnp.zeros((), jnp.float32)
            self._depth = jnp.ones((), jnp.float32)
            self.vel_mag = 0.0
            self.scene_depth_mean = 1.0
            pr = np.asarray(
                jnp.concatenate(
                    [ctx["R_before"].reshape(-1), ctx["t_before"]]
                )
            )
            pose_R, pose_t = pr[:9].reshape(3, 3), pr[9:]
            n_found, did_coarse = 0, False
            n_points = self._n_points_host
            n_keyframes = self._kf_count_host
            found_l = [0] * fstep.N_LEVELS

        # Deferred BA convergence (one-frame lag, like the reference's
        # mapmaker thread racing the tracker).
        if ctx["pending_kind"] is not None:
            self._resolve_pending(
                ctx["pending_kind"],
                finite and stats[S.STAT_PENDING_CONV] > 0.5,
                finite and stats[S.STAT_PENDING_OK] > 0.5,
            )

        # Distance-to-map sanity demotion (Tracker.cc:867-872).
        if (
            quality == tracker_mod.QUALITY_DODGY
            and finite and stats[S.STAT_DIST_EXCESSIVE] > 0.5
        ):
            quality = tracker_mod.QUALITY_BAD
        if quality == tracker_mod.QUALITY_BAD:
            self.lost_frames += 1
        else:
            self.lost_frames = 0

        # Keyframe-add heuristic (Tracker.cc:127-132). The queue entry is
        # consumed by a later frame's mapping step — the same latency the
        # reference's cross-thread queue has.
        added = False
        if (
            quality == tracker_mod.QUALITY_GOOD
            and ctx["fid"] - self.last_kf_frame
            > tc.min_frames_between_kfs
            and len(self.kf_queue) < tc.max_kf_queue
            and finite and stats[S.STAT_NEED_KF] > 0.5
        ):
            self.kf_queue.append(
                dict(
                    frame=ctx["frame"], R=ctx["R"], t=ctx["t"],
                    found=ctx["found"], found_pos=ctx["found_pos"],
                    level=ctx["search_level"], subpix=ctx["did_subpix"],
                )
            )
            self.last_kf_frame = ctx["fid"]
            added = True

        message = (
            f"Tracking Map, quality {['BAD','DODGY','GOOD'][quality]}. "
            f"Found: {found_l} Map: {n_points}P, {n_keyframes}KF"
            + (" Adding key-frame." if added else "")
        )
        if ctx["recovered"]:
            message = "Relocalized. " + message
        return FrameResult(
            pose_R=pose_R, pose_t=pose_t, quality=quality,
            n_found=n_found, n_points=n_points, n_keyframes=n_keyframes,
            phase=self.phase,
            lost=self.lost_frames >= tc.max_lost_frames,
            did_coarse=did_coarse, added_keyframe=added,
            message=message, frame_id=ctx["fid"],
        )

    def _lost_result(self, fid) -> FrameResult:
        return FrameResult(
            pose_R=np.asarray(self.R), pose_t=np.asarray(self.t),
            quality=tracker_mod.QUALITY_BAD, n_found=0,
            n_points=self._n_points_host,
            n_keyframes=self._kf_count_host,
            phase=self.phase, lost=True, did_coarse=False,
            added_keyframe=False,
            message="Lost; attempting relocalization", frame_id=fid,
        )

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
        search + backwards married-match (tolerance 2 px^2), fused into
        ONE jitted dispatch (fstep.trail_advance_step) + one scalar pull
        — the eager 4-dispatch version cost ~100 ms/frame of pure
        dispatch/queue latency over the remote-TPU link."""
        pos, good, count = fstep.trail_advance_step(
            frame, self._prev_frame, self._trail_patches,
            self._trail_cur_pos, self._trail_valid, self.config,
        )
        self._trail_cur_pos = pos
        self._trail_valid = good
        self._trail_count = int(count)
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
        with self.timer.stage("init_homography"):
            m_a = cam_ops.unproject(self.cam, a)
            m_b = cam_ops.unproject(self.cam, b)
            _, jac = cam_ops.project_derivs(self.cam, m_b)
            res = homography.compute(
                m_a, m_b, jac, valid, self._next_key(),
                max_pixel_error=mc.max_pixel_error,
                n_trials=mc.mlesac_trials,
                refine_iters=mc.homography_refine_iters,
            )
            # One combined pull for the two host decisions (success +
            # zero baseline, MapMaker.cc:244-247) — each scalar pull
            # costs a full tunnel RTT.
            ok_mag = np.asarray(jnp.stack([
                res.success.astype(jnp.float32), jnp.linalg.norm(res.t)
            ]))
        if not bool(ok_mag[0] > 0.5):
            return False
        t_mag = float(ok_mag[1])
        if t_mag == 0.0:
            return False
        R2 = res.R
        t2 = res.t * (mc.wiggle_scale / t_mag)

        # Insert the two keyframes.
        _stage = self.timer.stage
        _pb = _stage("init_points"); _pb.__enter__()
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
        # Subpixel-align + triangulate + insert the trail matches as one
        # dispatch (MapMaker.cc:262-339); only n_ok comes back.
        sm, n_ok_dev = fstep.init_points_step(
            sm, frame_second, m_a, a, b, valid, R2, t2, self.cam, cfg
        )
        n_ok = int(n_ok_dev)
        if n_ok < 10:
            return False

        # 5x BundleAdjustAll (MapMaker.cc:346-347): the four intermediate
        # rounds dispatch without a convergence pull — a corrupt round
        # leaves the map non-finite, so the LAST round's synchronous
        # okd check (and tier-3 reset) still catches it. Saves four
        # tunnel RTTs on the one-time init frame.
        self.slam_map = sm
        self._kf_count_host = 2
        self._newest_kf_host = 1
        # The init map provably occupies the first point slots (trails +
        # four epipolar growths; lowest-free-first allocation) over
        # exactly 2 cameras, so the init BAs run on a prefix slice of
        # the padded capacities — each LM step's device latency scales
        # with capacity, and the full 130-iteration init sequence at
        # [4096, 64] costs seconds.
        _pb.__exit__(None, None, None)
        _ba5 = _stage("init_ba5"); _ba5.__enter__()
        n_init = min(
            cfg.tracker.max_map_points,
            -(-(cfg.tracker.max_trails
                + 4 * mc.max_epi_candidates) // 256) * 256,
        )
        cap = (n_init, 2)
        for _ in range(4):
            self._dispatch_ba("global", max_iters=10, resolve=False,
                              cap=cap)
        self._dispatch_ba("global", max_iters=10, sync=True, cap=cap)
        _ba5.__exit__(None, None, None)
        if self.reset_requested:
            return False
        self.slam_map = kf_mod.refresh_scene_depth(self.slam_map, 0)
        self.slam_map = kf_mod.refresh_scene_depth(self.slam_map, 1)
        # Device-side wiggle/depth scalars (host mirrors pulled once at
        # the end of init, below).
        self._depth = self.slam_map.keyframes.depth_mean[0]
        self._wiggle_dev = jnp.asarray(
            mc.wiggle_scale, jnp.float32
        ) / jnp.maximum(self._depth, 1e-6)

        # Epipolar growth at levels 0,3,1,2 (MapMaker.cc:355-358).
        with _stage("init_grow"):
            for lvl in (0, 3, 1, 2):
                self._add_some_map_points(1, lvl)

        # BA until converged (MapMaker.cc:363-367): bundle_adjust loops
        # to convergence internally, so a bigger per-dispatch budget
        # replaces the r4 ladder of eight budget-10 dispatches (one
        # RTT each) with at most four budget-20 ones.
        _bc = _stage("init_ba_conv"); _bc.__enter__()
        for _ in range(4):
            if self._dispatch_ba("global", max_iters=20, sync=True,
                                 cap=cap):
                break
            if self.reset_requested:
                return False
        _bc.__exit__(None, None, None)
        if self.reset_requested:
            return False

        # Dominant-plane alignment (MapMaker.cc:369-372), applied as a
        # masked transform (identity when the RANSAC found no plane) so
        # no host pull of plane_ok is needed.
        _pl = _stage("init_plane_tail"); _pl.__enter__()
        Rp, tp, plane_ok = mapmaker.calc_plane_aligner(
            self.slam_map, self._next_key(), cfg
        )
        I3 = jnp.eye(3, dtype=jnp.float32)
        Rp = jnp.where(plane_ok, Rp, I3)
        tp = jnp.where(plane_ok, tp, jnp.zeros(3, jnp.float32))
        self.slam_map = mapmaker.apply_global_transformation(
            self.slam_map, Rp, tp
        )
        self.slam_map = self.slam_map._replace(good=jnp.asarray(True))
        self.R = self.slam_map.keyframes.R[1]
        self.t = self.slam_map.keyframes.t[1]
        self.velocity = jnp.zeros(6, jnp.float32)
        self._msd = jnp.zeros((), jnp.float32)
        # frame_idx was already advanced for this frame; KF-add gating
        # compares 0-based frame ids (FrameResult.frame_id).
        self.last_kf_frame = self.frame_idx - 1
        # ONE final pull for the host mirrors (depth + point count).
        tail = np.asarray(jnp.stack([
            self.slam_map.keyframes.depth_mean[0],
            self.slam_map.points.count().astype(jnp.float32),
        ]))
        self.scene_depth_mean = float(tail[0])
        self.wiggle_depth_norm = mc.wiggle_scale / max(
            self.scene_depth_mean, 1e-6
        )
        self._n_points_host = int(tail[1])
        self._any_new_host = True  # epipolar growth queued new points
        _pl.__exit__(None, None, None)
        return True

    # ---- mapping stage (MapMaker::run priorities) --------------------

    def _mapmaker_step(self):
        """One prioritized unit of mapping work (MapMaker.cc:80-123),
        chosen by the scheduler (native C++ when built, Python mirror
        otherwise — both encode the same ladder) from host-side state
        only: queue length, BA convergence, and one-frame-stale mirrors
        of the device queue flags. HandleBadPoints runs inside every
        frame_step (as in every pass of the reference's run() loop,
        MapMaker.cc:116)."""
        task = self._select_task()
        if task == native_runtime.TASK_ADD_KEYFRAME:
            self._add_keyframe_from_queue()
        elif task == native_runtime.TASK_BA_RECENT:
            self._dispatch_ba("local", max_iters=8)
        elif task == native_runtime.TASK_REFIND_NEWLY:
            (self.slam_map, self.new_points, self.never_retry,
             self.failure_mask) = fstep.refind_newly(
                self.slam_map, self.new_points, self.never_retry,
                self.failure_mask, self.cam, self.config,
            )
            self._any_new_host = False
        elif task == native_runtime.TASK_BA_ALL:
            self._dispatch_ba("global", max_iters=6)
        elif task == native_runtime.TASK_REFIND_FAILURES:
            (self.slam_map, self.never_retry,
             self.failure_mask) = fstep.refind_failures(
                self.slam_map, self.never_retry, self.failure_mask,
                self.cam, self.config,
            )
            self._any_failure_host = False
        return task

    def _select_task(self) -> int:
        """Ask the scheduler (native C++ when built, Python mirror
        otherwise — both encode the MapMaker.cc:80-123 ladder) which ONE
        unit of mapping work to dispatch, from host state only."""
        sched = (
            native_runtime.scheduler_next
            if native_runtime.available()
            else native_runtime.scheduler_next_py
        )
        return sched(
            len(self.kf_queue),
            self.recent_converged,
            self.full_converged,
            self._any_failure_host,
            self._any_new_host,
            self._mm_rng.integers(20) == 0,
        )

    # Epipolar growth order after a keyframe insertion (MapMaker.cc:499-502).
    _GROW_LEVELS = (3, 0, 1, 2)

    def _add_keyframe_from_queue(self):
        """AddKeyFrameFromTopOfQueue (MapMaker.cc:481-506), staged: the
        queue entry is consumed over FIVE mapping slots — one dispatch
        for make-rest + measurement registration + scene depth +
        refind-in-KF, then one AddSomeMapPoints dispatch per level
        (3,0,1,2) — so no single frame absorbs the whole integration's
        device time. The scheduler keeps choosing TASK_ADD_KEYFRAME while
        the entry is in the queue, matching the reference's queue-first
        priority."""
        entry = self.kf_queue[0]
        stage = entry.get("stage", 0)
        if stage == 0:
            slot = self._kf_count_host
            if slot >= self.config.mapmaker.max_keyframes:
                self.kf_queue.pop(0)
                return  # capacity full: drop (reference never hits this)
            (self.slam_map, self.new_points, self.never_retry,
             self.failure_mask) = fstep.integrate_keyframe(
                self.slam_map, self.new_points, self.never_retry,
                self.failure_mask, entry["frame"], entry["R"], entry["t"],
                entry["found"], entry["found_pos"], entry["level"],
                entry["subpix"], slot, self.cam, self.config,
            )
            # Free the staged frame data; only the slot survives for the
            # four growth dispatches.
            entry.clear()
            entry.update(stage=1, slot=slot)
            self._kf_count_host = slot + 1
            self._newest_kf_host = slot
            self.recent_converged = False
            self.full_converged = False
        else:
            self._add_some_map_points(
                entry["slot"], self._GROW_LEVELS[stage - 1]
            )
            if stage == len(self._GROW_LEVELS):
                self.kf_queue.pop(0)
            else:
                entry["stage"] = stage + 1

    def _add_some_map_points(self, src_kf: int, level: int):
        """AddSomeMapPoints (MapMaker.cc:427-437) — bootstrap-path entry;
        target selection and validity gating happen on device."""
        self.slam_map, self.new_points = fstep.add_map_points_step(
            self.slam_map, self.new_points, self.cam, src_kf, level,
            self.config,
        )
        self._any_new_host = True

    def _solver_choice(self):
        """Dense Cholesky under dense_solver_max_cams camera slots;
        above, band Schur + band-local CG when every co-observing pair
        fits the band (odometry maps), else scatter + matrix-free PCG.
        The band check costs one device pull — cached per KF count."""
        bc = self.config.bundle
        if self.config.mapmaker.max_keyframes <= bc.dense_solver_max_cams:
            return "onehot", "chol"
        if (
            self._band_choice is None
            or self._band_choice[0] != self._kf_count_host
        ):
            offset = int(bundle_mod.max_pair_offset(
                self.slam_map.meas.kf, self.slam_map.meas.valid
            ))
            if offset <= bc.band_halfwidth:
                choice = ("band", "band_pcg")
            else:
                choice = ("scatter", "pcg")
            self._band_choice = (self._kf_count_host, choice)
        return self._band_choice[1]

    def _dispatch_ba(self, mode: str, max_iters: int, sync: bool = False,
                     resolve: bool = True, cap: tuple = ()):
        """BundleAdjustRecent/All (MapMaker.cc:801-851) as one dispatch.
        sync=True (bootstrap) blocks on convergence, matching the
        reference's synchronous InitFromStereo BA; otherwise the
        convergence scalars ride the next frame_step's pending input.
        resolve=False (bootstrap's intermediate fixed rounds only)
        discards the convergence scalars entirely — a later synchronous
        round's finite-map check still catches corruption, because a
        non-finite map stays non-finite through further BA rounds."""
        cfg = self.config
        if (
            mode == "local"
            and self._kf_count_host < cfg.mapmaker.local_ba_min_kfs
        ):
            self.recent_converged = True
            return True
        # A capped (bootstrap) round runs on 2 camera slots: the dense
        # 12x12 Schur path is always right there.
        assembly, solver = (
            ("onehot", "chol") if cap else self._solver_choice()
        )
        (self.slam_map, self.failure_mask, self.never_retry, conv,
         okd) = fstep.ba_round(
            self.slam_map, self._newest_kf_host, self.never_retry,
            self.failure_mask, self.cam, cfg,
            max_iters=max_iters, assembly=assembly, solver=solver,
            mode=mode, cap=cap,
        )
        kind = "recent" if mode == "local" else "full"
        if not resolve:
            return None
        if sync:
            pulled = np.asarray(jnp.stack([
                conv.astype(jnp.float32), okd.astype(jnp.float32)
            ]))
            self._resolve_pending(kind, pulled[0] > 0.5, pulled[1] > 0.5)
            return bool(pulled[0] > 0.5) and not self.reset_requested
        # Never overwrite an unconsumed deferred result (it would drop a
        # convergence update — or an ok=False reset request — silently).
        self._resolve_pending_sync()
        self._pending_ba = (kind, conv, okd)
        return None
