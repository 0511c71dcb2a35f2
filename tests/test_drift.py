"""Long-sequence drift audit (VERDICT r1 item 9): 200 frames of a
revisiting sweep over the synthetic plane. Asserts the f32 pipeline does
not accumulate pose drift (bounded ATE), tracking never degrades to lost,
and the map stays healthy over time — the longest prior integration run
was 26 frames."""

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

# Heavy module chain: excluded from the default per-commit run (see
# pytest.ini tier split); run with `pytest -m slow`.
pytestmark = pytest.mark.slow


N_FRAMES = 200


def _pose(base_R, base_t, k):
    """Back-and-forth sweep with pan: revisits mapped territory twice, so
    drift (if any) accumulates over re-tracked ground."""
    s = k / 100.0
    mu = jnp.asarray(
        [
            0.45 * np.sin(1.5708 * s),
            0.06 * np.sin(2.2 * s),
            0.04 * np.sin(1.3 * s),
            0.02 * np.sin(1.7 * s),
            0.10 * np.sin(1.5708 * s),
            0.03 * np.sin(0.9 * s),
        ],
        jnp.float32,
    )
    dR, dt = lie.se3_exp(mu)
    return lie.se3_mul(dR, dt, base_R, base_t)


@pytest.fixture(scope="module")
def drift_run():
    rng = np.random.default_rng(21)
    config = SLAMConfig(
        tracker=TrackerConfig(
            width=320, height=240,
            max_map_points=512,
            max_corners_per_level=(256, 128, 64, 32),
            min_frames_between_kfs=6,
        ),
        mapmaker=MapMakerConfig(max_keyframes=12, max_epi_candidates=128),
    )
    scene = synthetic.make_planar_scene(rng, depth=4.0, px_per_m=140.0)
    base_R, base_t = synthetic.look_at_pose((0.0, 0.0, 0.0))
    shape = (config.tracker.height, config.tracker.width)
    sys = slam.SLAMSystem(config, seed=3)

    results, gt = [], []
    for k in range(N_FRAMES):
        R_true, t_true = _pose(base_R, base_t, k)
        img = synthetic.render(scene, sys.cam, R_true, t_true, shape)
        if k == 0 or k == 6:
            sys.on_touch()
        res = sys.track_frame(img)
        results.append(res)
        gt.append((np.asarray(R_true), np.asarray(t_true)))
    return config, sys, results, gt


def test_never_lost_over_200_frames(drift_run):
    config, sys, results, gt = drift_run
    phases = [r.phase for r in results]
    assert slam.PHASE_TRACKING in phases
    first = phases.index(slam.PHASE_TRACKING)
    assert first <= 8
    tracked = results[first:]
    assert all(not r.lost for r in tracked)
    n_bad = sum(1 for r in tracked if r.quality == 0)
    assert n_bad == 0, f"{n_bad} BAD frames over {len(tracked)}"


def test_ate_bounded_over_200_frames(drift_run):
    config, sys, results, gt = drift_run
    phases = [r.phase for r in results]
    first = phases.index(slam.PHASE_TRACKING)
    est = ate.camera_centers(
        [r.pose_R for r in results[first:]],
        [r.pose_t for r in results[first:]],
    )
    gtc = ate.camera_centers(
        [g[0] for g in gt[first:]], [g[1] for g in gt[first:]]
    )
    rmse, _ = ate.ate_rmse(est, gtc)
    span = np.linalg.norm(gtc.max(0) - gtc.min(0))
    assert rmse < 0.025 * span, f"ATE {rmse:.4f} vs span {span:.3f}"
    # Drift audit: error in the LAST quarter must not exceed 3x the error
    # of the first quarter (f32 accumulation would show up here).
    s, Ra, ta = ate.umeyama_alignment(est, gtc)
    aligned = (s * (Ra @ est.T)).T + ta
    err = np.linalg.norm(aligned - gtc, axis=-1)
    q = len(err) // 4
    early, late = np.median(err[:q]), np.median(err[-q:])
    assert late < 3.0 * max(early, 0.002), (
        f"late-sequence drift: median err {early:.4f} -> {late:.4f}"
    )


def test_map_stays_healthy(drift_run):
    config, sys, results, gt = drift_run
    phases = [r.phase for r in results]
    first = phases.index(slam.PHASE_TRACKING)
    # Map did not degenerate: point count at the end within 50% of the
    # running maximum, keyframes accumulated, measurements persist.
    counts = [r.n_points for r in results[first:]]
    assert counts[-1] > 0.5 * max(counts)
    assert results[-1].n_keyframes >= 4
    assert int(sys.slam_map.meas.count()) > results[-1].n_points
    # Tracking rate stays high to the end.
    tail_found = [r.n_found for r in results[-40:]]
    assert np.median(tail_found) > 60
