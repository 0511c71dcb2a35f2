"""The large-map solver path THROUGH THE FACADE (VERDICT r4 item 3).

The reference drives one BA code path for any map size
(jni/MapMaker.cc:776-797 -> jni/Bundle.cc:136-178); this build switches
assembly/solver by capacity (SLAMSystem._solver_choice): dense
onehot+Cholesky under `dense_solver_max_cams` camera slots, block-band +
band-local CG when every co-observing pair fits the band, scatter +
matrix-free PCG otherwise. Until r5 nothing outside unit tests ever
executed the band/scatter branches from inside a SLAM run; these tests
pin the branch logic, its cache, and an end-to-end run whose BA
dispatches all go through the scaled solvers.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from visualslam_android_tpu.config import (
    BundleConfig,
    MapMakerConfig,
    SLAMConfig,
    TrackerConfig,
)
from visualslam_android_tpu.models import slam
from visualslam_android_tpu.ops import lie
from visualslam_android_tpu.utils import synthetic


def _large_map_config(band_halfwidth=4):
    """Small frames, but max_keyframes ABOVE dense_solver_max_cams so
    every in-system BA takes the scaled path."""
    return SLAMConfig(
        tracker=TrackerConfig(
            width=320, height=240,
            max_map_points=512,
            max_corners_per_level=(256, 128, 64, 32),
            min_frames_between_kfs=4,
            max_trails=256,
        ),
        mapmaker=MapMakerConfig(
            max_keyframes=12, max_epi_candidates=64,
            local_ba_min_kfs=4,
        ),
        bundle=BundleConfig(
            dense_solver_max_cams=4, band_halfwidth=band_halfwidth,
            cg_iters=120,
        ),
    )


def _set_meas(sys_, point_kfs):
    """Write a synthetic co-observation pattern into the measurement
    table: point i observes the keyframes in point_kfs[i]."""
    meas = sys_.slam_map.meas
    kf = np.zeros(np.asarray(meas.kf).shape, np.int32)
    valid = np.zeros(kf.shape, bool)
    for i, kfs in enumerate(point_kfs):
        for o, k in enumerate(kfs):
            kf[i, o] = k
            valid[i, o] = True
    sys_.slam_map = sys_.slam_map._replace(
        meas=meas._replace(kf=jnp.asarray(kf), valid=jnp.asarray(valid))
    )


def test_solver_choice_dense_under_cap():
    cfg = SLAMConfig()  # default: max_keyframes 64 <= dense cap 64
    sys_ = slam.SLAMSystem(cfg, seed=0)
    assert sys_._solver_choice() == ("onehot", "chol")


def test_solver_choice_band_when_offsets_fit():
    sys_ = slam.SLAMSystem(_large_map_config(band_halfwidth=4), seed=0)
    _set_meas(sys_, [(0, 1, 2), (2, 3), (4, 6)])  # max offset 2 <= 4
    sys_._kf_count_host = 7
    assert sys_._solver_choice() == ("band", "band_pcg")


def test_solver_choice_scatter_when_band_exceeded():
    sys_ = slam.SLAMSystem(_large_map_config(band_halfwidth=4), seed=0)
    _set_meas(sys_, [(0, 1), (0, 6)])  # offset 6 > band 4
    sys_._kf_count_host = 7
    assert sys_._solver_choice() == ("scatter", "pcg")


def test_solver_choice_cache_invalidates_on_kf_count():
    """The band check costs a device pull, so it is cached per KF count
    — and must re-run when the count changes (a new keyframe can widen
    the co-observation band)."""
    sys_ = slam.SLAMSystem(_large_map_config(band_halfwidth=4), seed=0)
    _set_meas(sys_, [(0, 1)])
    sys_._kf_count_host = 2
    assert sys_._solver_choice() == ("band", "band_pcg")
    # Same KF count: cached (mutating meas must NOT change the choice).
    _set_meas(sys_, [(0, 6)])
    assert sys_._solver_choice() == ("band", "band_pcg")
    # New keyframe: cache invalidates, choice re-evaluates.
    sys_._kf_count_host = 7
    assert sys_._solver_choice() == ("scatter", "pcg")


# ---------------------------------------------------------------------------
# End-to-end: a SLAM run whose every BA dispatch goes through the scaled
# solver branch (the facade's large-map path, unreachable at default
# capacities).
# ---------------------------------------------------------------------------


def _gt_pose(base_R, base_t, k, n_frames):
    s = k / max(n_frames - 1, 1)
    mu = jnp.asarray(
        [0.55 * s, 0.08 * np.sin(2 * s), 0.05 * s, 0.0, 0.12 * s, 0.0],
        jnp.float32,
    )
    dR, dt = lie.se3_exp(mu)
    return lie.se3_mul(dR, dt, base_R, base_t)


@pytest.fixture(scope="module")
def large_map_run():
    rng = np.random.default_rng(21)
    config = _large_map_config(band_halfwidth=4)
    scene = synthetic.make_planar_scene(rng, depth=4.0, px_per_m=140.0)
    base_R, base_t = synthetic.look_at_pose((0.0, 0.0, 0.0))
    shape = (config.tracker.height, config.tracker.width)
    sys_ = slam.SLAMSystem(config, seed=3)

    chosen = []
    orig = sys_._solver_choice

    def spy():
        c = orig()
        chosen.append(c)
        return c

    sys_._solver_choice = spy

    n_frames = 26
    results = []
    for k in range(n_frames):
        R_true, t_true = _gt_pose(base_R, base_t, k, n_frames)
        img = synthetic.render(scene, sys_.cam, R_true, t_true, shape)
        if k == 0 or k == 6:
            sys_.on_touch()
        results.append(sys_.track_frame(img))
    return config, sys_, results, chosen


@pytest.mark.slow
def test_large_map_run_uses_scaled_solver(large_map_run):
    config, sys_, results, chosen = large_map_run
    assert any(r.phase == slam.PHASE_TRACKING for r in results)
    # Every non-bootstrap BA went through _solver_choice and picked a
    # scaled branch (max_keyframes 12 > dense cap 4 rules out onehot).
    assert chosen, "no BA dispatch consulted _solver_choice"
    assert all(c[0] in ("band", "scatter") for c in chosen), chosen
    assert sys_._band_choice is not None, "band check never ran"


@pytest.mark.slow
def test_large_map_run_stays_healthy(large_map_run):
    config, sys_, results, chosen = large_map_run
    phases = [r.phase for r in results]
    first_track = phases.index(slam.PHASE_TRACKING)
    tracked = results[first_track:]
    # The scaled-solver BAs must not corrupt the map: no tier-3 reset
    # (phase would fall back to NOT_STARTED), tracking stays alive, and
    # keyframes beyond the stereo pair integrated.
    assert all(r.phase == slam.PHASE_TRACKING for r in tracked)
    assert results[-1].n_keyframes >= 3
    assert sum(1 for r in tracked if r.quality > 0) > len(tracked) // 2
    assert bool(jnp.all(jnp.isfinite(sys_.slam_map.points.pos_w)))
