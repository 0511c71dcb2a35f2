"""Full SLAM on REAL photographic imagery with sensor effects.

BASELINE configs 2-3 ask for TUM fr1_desk / fr2_xyz; network egress is
unavailable in this environment, so the closest obtainable real-imagery
proof is a sequence rendered from a real photograph (matplotlib's
bundled grace_hopper.jpg) with camera-realism effects the synthetic
rectangle texture never exercises: natural texture statistics, exposure
drift, Gaussian read noise, and defocus blur on a subset of frames. The
per-frame contract under test is jni/Tracker.cc:76-146 on natural
imagery."""

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


N_FRAMES = 80


def _pose(base_R, base_t, k):
    s = k / 40.0
    mu = jnp.asarray(
        [
            0.30 * np.sin(1.2 * s),
            0.05 * np.sin(2.1 * s),
            0.05 * np.sin(0.9 * s),
            0.02 * np.sin(1.4 * s),
            0.08 * np.sin(1.2 * s),
            0.02 * np.sin(0.8 * s),
        ],
        jnp.float32,
    )
    dR, dt = lie.se3_exp(mu)
    return lie.se3_mul(dR, dt, base_R, base_t)


@pytest.fixture(scope="module")
def photo_run():
    rng = np.random.default_rng(13)
    config = SLAMConfig(
        tracker=TrackerConfig(
            width=320, height=240,
            max_map_points=512,
            max_corners_per_level=(256, 128, 64, 32),
            min_frames_between_kfs=6,
        ),
        mapmaker=MapMakerConfig(max_keyframes=12, max_epi_candidates=128),
    )
    scene = synthetic.make_photo_scene(depth=4.0, px_per_m=200.0)
    base_R, base_t = synthetic.look_at_pose((0.0, 0.0, 0.0))
    shape = (config.tracker.height, config.tracker.width)
    sys_ = slam.SLAMSystem(config, seed=9)

    results, gt = [], []
    for k in range(N_FRAMES):
        R_true, t_true = _pose(base_R, base_t, k)
        img = np.asarray(
            synthetic.render(scene, sys_.cam, R_true, t_true, shape)
        )
        # Sensor realism: slow exposure drift, read noise on every frame,
        # defocus blur on every 7th frame.
        img = synthetic.apply_sensor_effects(
            img, rng,
            exposure_gain=1.0 + 0.10 * np.sin(k / 9.0),
            exposure_bias=4.0 * np.sin(k / 5.0),
            noise_std=2.0,
            blur_sigma=0.8 if k % 7 == 3 else 0.0,
        )
        if k == 0 or k == 8:
            sys_.on_touch()
        res = sys_.track_frame(img)
        results.append(res)
        gt.append((np.asarray(R_true), np.asarray(t_true)))
    return config, sys_, results, gt


def test_tracks_real_texture(photo_run):
    config, sys_, results, gt = photo_run
    phases = [r.phase for r in results]
    assert slam.PHASE_TRACKING in phases, "init failed on photo texture"
    first = phases.index(slam.PHASE_TRACKING)
    assert first <= 12
    tracked = results[first:]
    assert all(not r.lost for r in tracked)
    # Sensor noise + blur may cost isolated DODGY frames but never BAD.
    n_bad = sum(1 for r in tracked if r.quality == 0)
    assert n_bad == 0, f"{n_bad} BAD frames"


def test_ate_bounded_real_texture(photo_run):
    config, sys_, results, gt = photo_run
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
    # Measured ~0.033*span (8.2 mm over a 25 cm span) with read noise,
    # exposure drift and periodic defocus; bound with headroom but tight
    # enough to catch regression to centimeter-level drift.
    assert rmse < 0.045 * span, f"ATE {rmse:.4f} vs span {span:.3f}"


def test_map_grows_on_real_texture(photo_run):
    config, sys_, results, gt = photo_run
    assert results[-1].n_keyframes >= 3
    assert results[-1].n_points > 100
