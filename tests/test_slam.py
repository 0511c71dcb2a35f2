"""Full-SLAM integration: bootstrap from two touches on a rendered planar
scene, track + map a sequence, evaluate similarity-aligned ATE
(SURVEY.md §4.3; BASELINE configs 1/3 shape)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from visualslam_android_tpu.config import (
    MapMakerConfig,
    SLAMConfig,
    TrackerConfig,
)
from visualslam_android_tpu.models import slam
from visualslam_android_tpu.ops import lie
from visualslam_android_tpu.utils import ate, synthetic


def _config():
    return SLAMConfig(
        tracker=TrackerConfig(
            width=320, height=240,
            max_map_points=512,
            max_corners_per_level=(256, 128, 64, 32),
            min_frames_between_kfs=6,
        ),
        mapmaker=MapMakerConfig(
            max_keyframes=8, max_epi_candidates=128
        ),
    )


def _gt_pose(base_R, base_t, k, n_frames):
    """Sideways translation with slight pan — good homography baseline."""
    s = k / max(n_frames - 1, 1)
    mu = jnp.asarray(
        [0.55 * s, 0.08 * np.sin(2 * s), 0.05 * s, 0.0, 0.12 * s, 0.0],
        jnp.float32,
    )
    dR, dt = lie.se3_exp(mu)
    return lie.se3_mul(dR, dt, base_R, base_t)


@pytest.fixture(scope="module")
def slam_run():
    rng = np.random.default_rng(21)
    config = _config()
    scene = synthetic.make_planar_scene(rng, depth=4.0, px_per_m=140.0)
    base_R, base_t = synthetic.look_at_pose((0.0, 0.0, 0.0))
    shape = (config.tracker.height, config.tracker.width)
    sys = slam.SLAMSystem(config, seed=3)

    n_frames = 26
    results, gt = [], []
    for k in range(n_frames):
        R_true, t_true = _gt_pose(base_R, base_t, k, n_frames)
        img = synthetic.render(scene, sys.cam, R_true, t_true, shape)
        if k == 0 or k == 6:
            sys.on_touch()  # the two bootstrap presses
        res = sys.track_frame(img)
        results.append(res)
        gt.append((np.asarray(R_true), np.asarray(t_true)))
    return config, sys, results, gt


def test_bootstrap_completed(slam_run):
    config, sys, results, gt = slam_run
    phases = [r.phase for r in results]
    assert phases[0] == slam.PHASE_TRAILS
    assert slam.PHASE_TRACKING in phases, "stereo init never succeeded"
    first_track = phases.index(slam.PHASE_TRACKING)
    assert first_track <= 8
    assert results[first_track].n_points > 60
    assert results[first_track].n_keyframes == 2


def test_tracking_stays_good(slam_run):
    config, sys, results, gt = slam_run
    phases = [r.phase for r in results]
    first_track = phases.index(slam.PHASE_TRACKING)
    tracked = results[first_track:]
    n_bad = sum(1 for r in tracked if r.quality == 0)
    assert n_bad == 0, f"{n_bad} BAD frames"
    assert all(not r.lost for r in tracked)


def test_map_grows(slam_run):
    config, sys, results, gt = slam_run
    assert results[-1].n_keyframes >= 3, "no keyframes added after init"
    assert results[-1].n_points > results[10].n_points * 0.8
    assert int(sys.slam_map.meas.count()) > results[-1].n_points


def test_ate_small(slam_run):
    config, sys, results, gt = slam_run
    phases = [r.phase for r in results]
    first_track = phases.index(slam.PHASE_TRACKING)
    est = ate.camera_centers(
        [r.pose_R for r in results[first_track:]],
        [r.pose_t for r in results[first_track:]],
    )
    gtc = ate.camera_centers(
        [g[0] for g in gt[first_track:]], [g[1] for g in gt[first_track:]]
    )
    rmse, _ = ate.ate_rmse(est, gtc)
    # Trajectory spans ~0.6 m; ATE should be well under 2% of that.
    span = np.linalg.norm(gtc.max(0) - gtc.min(0))
    assert rmse < 0.02 * span, f"ATE {rmse:.4f} vs span {span:.3f}"


def test_pipelined_matches_sync(slam_run):
    """pipelined=True must produce bit-identical per-frame results to the
    default synchronous mode, just delivered one frame late (the device
    dispatch stream and every host decision point are the same; only the
    stats transfer is asynchronous). frame_id stitches the streams."""
    config, _, results_sync, _ = slam_run
    rng = np.random.default_rng(21)
    scene = synthetic.make_planar_scene(rng, depth=4.0, px_per_m=140.0)
    base_R, base_t = synthetic.look_at_pose((0.0, 0.0, 0.0))
    shape = (config.tracker.height, config.tracker.width)
    sys2 = slam.SLAMSystem(config, seed=3, pipelined=True)
    n_frames = 26
    results_pipe = []
    for k in range(n_frames):
        R_true, t_true = _gt_pose(base_R, base_t, k, n_frames)
        img = synthetic.render(scene, sys2.cam, R_true, t_true, shape)
        if k == 0 or k == 6:
            sys2.on_touch()
        results_pipe.append(sys2.track_frame(img))
    results_pipe.extend(sys2.flush())

    by_id = {r.frame_id: r for r in results_pipe if r.frame_id >= 0}
    n_tracked = 0
    for k, a in enumerate(results_sync):
        b = by_id.get(k)
        assert b is not None, f"frame {k} missing from pipelined stream"
        assert (a.phase, a.quality, a.n_found, a.n_points,
                a.n_keyframes, a.lost, a.did_coarse,
                a.added_keyframe) == (
            b.phase, b.quality, b.n_found, b.n_points, b.n_keyframes,
            b.lost, b.did_coarse, b.added_keyframe,
        ), f"frame {k}: {a} != {b}"
        if a.phase == slam.PHASE_TRACKING:
            np.testing.assert_array_equal(a.pose_R, b.pose_R)
            np.testing.assert_array_equal(a.pose_t, b.pose_t)
            n_tracked += 1
    assert n_tracked > 10


# ---------------------------------------------------------------------------
# Lost -> relocalize -> resume (Tracker.cc:133-175, Relocaliser.cc:17-42;
# VERDICT r1 item 3)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def reloc_run():
    """Bootstrap, track, then occlude the camera for 4 frames (blank
    images) mid-sequence, then show a view near an existing keyframe."""
    rng = np.random.default_rng(21)  # same scene as slam_run
    config = _config()
    scene = synthetic.make_planar_scene(rng, depth=4.0, px_per_m=140.0)
    base_R, base_t = synthetic.look_at_pose((0.0, 0.0, 0.0))
    shape = (config.tracker.height, config.tracker.width)
    sys = slam.SLAMSystem(config, seed=3)

    n_frames = 30
    blank = np.full(shape, 127.0, np.float32)  # occluded: featureless
    blank_range = range(14, 18)
    results, gt, kinds = [], [], []
    for k in range(n_frames):
        if k in blank_range:
            # Occlusion: hold the ground-truth pose at the pre-blank one.
            R_true, t_true = _gt_pose(base_R, base_t, 13, n_frames)
            img = blank
            kinds.append("blank")
        else:
            # After the blackout the camera "reappears" where it was
            # (frame 13's pose onward), as a handheld recovery would.
            kk = min(k, 13) if k < 18 else k - 5
            R_true, t_true = _gt_pose(base_R, base_t, kk, n_frames)
            img = synthetic.render(scene, sys.cam, R_true, t_true, shape)
            kinds.append("real")
        if k == 0 or k == 6:
            sys.on_touch()
        res = sys.track_frame(img)
        results.append(res)
        gt.append((np.asarray(R_true), np.asarray(t_true)))
    return config, sys, results, gt, kinds, list(blank_range)


def test_lost_trips_after_bad_frames(reloc_run):
    config, sys, results, gt, kinds, blanks = reloc_run
    # Quality goes BAD on the blank frames...
    for k in blanks:
        assert results[k].quality == 0, f"frame {k} not BAD"
    # ...and `lost` trips after max_lost_frames of them.
    trip = blanks[0] + config.tracker.max_lost_frames
    assert results[trip].lost, "lost flag never tripped"
    assert "relocal" in results[trip].message.lower() or results[trip].lost


def test_recovery_succeeds_and_forces_coarse(reloc_run):
    config, sys, results, gt, kinds, blanks = reloc_run
    first_real = blanks[-1] + 1
    rec = results[first_real]
    # The first real frame after the blackout relocalizes and tracks.
    assert not rec.lost, "relocalization failed"
    assert rec.n_found > 20
    # Forced-coarse: the recovery frame and the just_recovered frame after
    # it must run the coarse stage (Tracker.cc:169-174).
    assert rec.did_coarse, "recovery frame skipped coarse stage"
    assert results[first_real + 1].did_coarse, (
        "just_recovered frame skipped coarse stage"
    )
    # And tracking stays good afterwards.
    tail = results[first_real + 1:]
    assert all(not r.lost for r in tail)
    assert sum(1 for r in tail if r.quality == 0) == 0


def test_post_recovery_ate_bounded(reloc_run):
    config, sys, results, gt, kinds, blanks = reloc_run
    first_real = blanks[-1] + 1
    est = ate.camera_centers(
        [r.pose_R for r in results[first_real:]],
        [r.pose_t for r in results[first_real:]],
    )
    gtc = ate.camera_centers(
        [g[0] for g in gt[first_real:]], [g[1] for g in gt[first_real:]]
    )
    # Align on the PRE-blank tracked segment so recovery error is measured
    # in the map's own frame.
    pre = ate.camera_centers(
        [r.pose_R for r in results[8:blanks[0]]],
        [r.pose_t for r in results[8:blanks[0]]],
    )
    pre_gt = ate.camera_centers(
        [g[0] for g in gt[8:blanks[0]]], [g[1] for g in gt[8:blanks[0]]]
    )
    s, Ra, ta = ate.umeyama_alignment(pre, pre_gt)
    aligned = (s * (Ra @ est.T)).T + ta
    err = np.linalg.norm(aligned - gtc, axis=-1)
    span = np.linalg.norm(gtc.max(0) - gtc.min(0)) + 1e-9
    assert np.median(err) < 0.25 * max(span, 0.1), (
        f"post-recovery error {np.median(err):.4f} vs span {span:.3f}"
    )


def _clone_tracking_state(src, pipelined):
    """A fresh SLAMSystem carrying a deep COPY of `src`'s tracking state:
    the mapping stages donate their map argument, so sharing buffers with
    the module fixture would invalidate it for later tests."""
    import jax

    dst = slam.SLAMSystem(src.config, seed=7, pipelined=pipelined)
    dst.slam_map = jax.tree.map(jnp.array, src.slam_map)
    dst.phase = slam.PHASE_TRACKING
    dst.R, dst.t = src.R, src.t
    dst.velocity = src.velocity
    dst._msd, dst._depth = src._msd, src._depth
    dst._wiggle_dev = src._wiggle_dev
    dst.sbi_last = src.sbi_last
    dst._prev_frame = src._prev_frame
    dst._kf_count_host = src._kf_count_host
    dst._newest_kf_host = src._newest_kf_host
    dst._n_points_host = src._n_points_host
    dst.scene_depth_mean = src.scene_depth_mean
    dst.wiggle_depth_norm = src.wiggle_depth_norm
    dst.frame_idx = src.frame_idx
    return dst


@pytest.mark.parametrize("pipelined", [False, True])
def test_corrupt_ba_requests_map_reset(slam_run, pipelined):
    """Tier-3 failure recovery (MapMaker.cc:906-915), end to end in BOTH
    modes: a BA over a corrupted map reports ok=False via the deferred
    pending scalars; the next frames' track_frame calls must notice and
    perform the full map reset THEMSELVES (no manual reset() here)."""
    config, src, _, _ = slam_run
    sys_ = _clone_tracking_state(src, pipelined)
    # A corrupting BA writes back immediately (apply_ba_result); poison
    # the map the same way, then let a real ba_round observe it and
    # produce the deferred ok=False result.
    pts = sys_.slam_map.points
    kfs = sys_.slam_map.keyframes
    nan = jnp.asarray(np.nan, jnp.float32)
    sys_.slam_map = sys_.slam_map._replace(
        points=pts._replace(
            pos_w=jnp.where(pts.valid[:, None], nan, pts.pos_w)
        ),
        keyframes=kfs._replace(
            t=jnp.where(kfs.valid[:, None], nan, kfs.t)
        ),
    )
    sys_._dispatch_ba("global", max_iters=2)
    assert sys_._pending_ba is not None

    shape = (config.tracker.height, config.tracker.width)
    rng2 = np.random.default_rng(5)
    img = rng2.uniform(0, 255, shape).astype(np.float32)
    # Frame A consumes the pending scalars (rides the stats vector in
    # sync mode; one frame later in pipelined mode). Within two more
    # frames the reset must have been serviced by track_frame itself.
    sys_.track_frame(img)
    results = [sys_.track_frame(img), sys_.track_frame(img)]
    assert sys_.phase == slam.PHASE_NOT_STARTED, (
        "track_frame never serviced the tier-3 map reset"
    )
    assert not sys_.reset_requested
    assert int(sys_.slam_map.keyframes.count()) == 0
    assert any(r.phase == slam.PHASE_NOT_STARTED for r in results
               if r.valid)


def test_lost_path_resolves_pending_ba(slam_run):
    """A deferred BA result must not vanish during a lost streak: the
    failed-reloc path has no frame_step to carry it, so track_frame
    resolves it synchronously there (then services the reset)."""
    config, src, _, _ = slam_run
    sys_ = _clone_tracking_state(src, False)
    kfs = sys_.slam_map.keyframes
    # Poison the keyframe SBIs so relocalization cannot succeed.
    sys_.slam_map = sys_.slam_map._replace(
        keyframes=kfs._replace(
            sbi_template=jnp.full_like(kfs.sbi_template, jnp.inf)
        )
    )
    sys_.lost_frames = config.tracker.max_lost_frames
    # Simulate an unconsumed corrupting-BA result from the last frame.
    sys_._pending_ba = (
        "full", jnp.asarray(0.0, jnp.float32), jnp.asarray(0.0, jnp.float32)
    )
    shape = (config.tracker.height, config.tracker.width)
    img = np.full(shape, 127.0, np.float32)
    res = sys_.track_frame(img)
    assert res.lost
    assert sys_._pending_ba is None or sys_._pending_ba[0] is not None
    assert sys_.reset_requested, "lost path dropped the pending BA result"
    sys_.track_frame(img)
    assert sys_.phase == slam.PHASE_NOT_STARTED


def test_resolve_pending_ladder():
    """The convergence ladder half of _resolve_pending (healthy results
    drive the BundleAdjustRecent/All scheduling, MapMaker.cc:96-108)."""
    sys_ = slam.SLAMSystem(_config(), seed=0)
    sys_._resolve_pending("recent", conv=False, ok=True)
    assert not sys_.reset_requested
    assert not sys_.recent_converged and not sys_.full_converged
    sys_._resolve_pending("full", conv=True, ok=True)
    assert sys_.recent_converged and sys_.full_converged
