"""Tracker integration tests: fixed-map tracking on rendered synthetic
scenes (SURVEY.md §4.3, BASELINE config 2 shape), plus motion model and
quality-assessment units (jni/Tracker.cc semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualslam_android_tpu.config import SLAMConfig, TrackerConfig, MapMakerConfig
from visualslam_android_tpu.models import keyframe as kf_mod
from visualslam_android_tpu.models import map_store, tracker
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import lie, sbi
from visualslam_android_tpu.utils import synthetic


from visualslam_android_tpu.utils import fixtures


def small_config():
    return fixtures.small_config()


def build_fixed_map(config, rng):
    return fixtures.build_fixed_map(config, rng)


@pytest.fixture(scope="module")
def fixed_map():
    rng = np.random.default_rng(11)
    config = small_config()
    return (config,) + build_fixed_map(config, rng)


def test_map_fixture_sane(fixed_map):
    config, slam_map, cam, scene, pose0, n_pts = fixed_map
    assert n_pts > 80
    assert float(slam_map.keyframes.depth_mean[0]) == pytest.approx(4.0, rel=0.1)
    # Pixel vectors should have magnitude ~ scene_depth / focal * scale.
    pr = np.asarray(slam_map.points.pixel_right_w[:n_pts])
    norms = np.linalg.norm(pr, axis=-1)
    assert np.all(norms > 1e-5) and np.all(norms < 0.3)


@pytest.mark.parametrize("subpix_all", [True, False])
def test_track_recovers_small_motion(fixed_map, subpix_all):
    config, slam_map, cam, scene, (R0, t0), n_pts = fixed_map
    config = config.replace(
        tracker=dataclasses.replace(config.tracker, subpix_all_levels=subpix_all)
    )
    # True new pose: small translation + rotation.
    mu = jnp.asarray([0.04, -0.02, 0.03, 0.01, 0.015, -0.008], jnp.float32)
    dR, dt = lie.se3_exp(mu)
    R1, t1 = lie.se3_mul(dR, dt, R0, t0)
    img1 = synthetic.render(
        scene, cam, R1, t1, (config.tracker.height, config.tracker.width)
    )
    frame1 = kf_mod.make_frame(img1, config)
    out = tracker.track_map(
        frame1, slam_map, cam, R0, t0,
        jnp.asarray(0.0, jnp.float32),  # slow: no coarse stage
        jax.random.PRNGKey(0), config,
    )
    # Pose error vs ground truth.
    Ri, ti = lie.se3_inverse(out.R, out.t)
    Re, te = lie.se3_mul(R1, t1, Ri, ti)
    err = np.asarray(lie.se3_ln(Re, te))
    n_found = int(out.found.sum())
    assert n_found > 0.5 * n_pts, f"only {n_found}/{n_pts} found"
    # Reference behavior (subpix only on the top level) leaves most
    # measurements corner-quantized => ~1px-level pose bias; full subpix
    # (TPU default) should be several times tighter.
    rot_tol, trans_tol = (1.5e-3, 8e-3) if subpix_all else (6e-3, 2.5e-2)
    assert np.abs(err[3:]).max() < rot_tol, f"rotation error {err[3:]}"
    assert np.abs(err[:3]).max() < trans_tol, f"translation error {err[:3]}"
    q = int(tracker.assess_tracking_quality(
        out.attempted_per_level, out.found_per_level
    ))
    assert q == tracker.QUALITY_GOOD


def test_track_identity_stays_put(fixed_map):
    config, slam_map, cam, scene, (R0, t0), n_pts = fixed_map
    img0 = synthetic.render(
        scene, cam, R0, t0, (config.tracker.height, config.tracker.width)
    )
    frame0 = kf_mod.make_frame(img0, config)
    out = tracker.track_map(
        frame0, slam_map, cam, R0, t0, jnp.asarray(0.0, jnp.float32),
        jax.random.PRNGKey(1), config,
    )
    Ri, ti = lie.se3_inverse(out.R, out.t)
    Re, te = lie.se3_mul(R0, t0, Ri, ti)
    err = np.asarray(lie.se3_ln(Re, te))
    assert np.abs(err).max() < 2e-3
    assert bool(out.depth_stats_valid)
    assert float(out.scene_depth_mean) == pytest.approx(4.0, rel=0.15)


def test_track_flat_frame_is_bad_quality(fixed_map):
    config, slam_map, cam, scene, (R0, t0), n_pts = fixed_map
    flat = jnp.full(
        (config.tracker.height, config.tracker.width), 128.0, jnp.float32
    )
    frame = kf_mod.make_frame(flat, config)
    out = tracker.track_map(
        frame, slam_map, cam, R0, t0, jnp.asarray(0.0, jnp.float32),
        jax.random.PRNGKey(2), config,
    )
    q = int(tracker.assess_tracking_quality(
        out.attempted_per_level, out.found_per_level
    ))
    assert q == tracker.QUALITY_BAD
    assert int(out.found.sum()) < 10


def test_motion_model_roundtrip():
    R0, t0 = lie.se3_exp(jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.05, 0.0]))
    v = jnp.asarray([0.02, 0.0, 0.0, 0.0, 0.01, 0.0], jnp.float32)
    R1, t1 = tracker.apply_motion_model(
        R0, t0, v, jnp.zeros(6), jnp.asarray(False)
    )
    v2, mag, msd = tracker.update_motion_model(
        R1, t1, R0, t0, v, jnp.asarray(4.0)
    )
    # New velocity = 0.9 * (0.5 * v + 0.5 * v) = 0.9 v.
    np.testing.assert_allclose(np.asarray(v2), 0.9 * np.asarray(v), atol=1e-5)
    assert float(mag) == pytest.approx(0.9 * float(jnp.linalg.norm(v)), rel=1e-4)
    assert float(msd) < float(mag)  # translation shrunk by depth 4


def test_sbi_rotation_prior_sign(fixed_map):
    """exp(sbi_rot) should approximate the new-from-old camera rotation."""
    config, slam_map, cam, scene, (R0, t0), n_pts = fixed_map
    w_true = jnp.asarray([0.0, 0.025, 0.0], jnp.float32)  # pan
    dR = lie.so3_exp(w_true)
    R1, t1 = dR @ R0, dR @ t0  # pure rotation about camera center... t'=dR t
    shape = (config.tracker.height, config.tracker.width)
    img0 = synthetic.render(scene, cam, R0, t0, shape)
    img1 = synthetic.render(scene, cam, R1, t1, shape)
    f0 = kf_mod.make_frame(img0, config)
    f1 = kf_mod.make_frame(img1, config)
    sbi_last = sbi.make_sbi(f0.pyramid[-1], config.tracker.sbi_blur)
    sbi_cur = sbi.make_sbi(f1.pyramid[-1], config.tracker.sbi_blur)
    mu = tracker.calc_sbi_rotation(sbi_cur.template, sbi_last, cam)
    got = np.asarray(mu[3:])
    want = np.asarray(w_true)
    err = np.linalg.norm(got - want)
    err_neg = np.linalg.norm(got + want)
    assert err < err_neg, f"SBI rotation sign flipped: {got} vs {want}"
    assert err < 0.01, f"SBI rotation {got} vs true {want}"


def test_quality_codes():
    q = tracker.assess_tracking_quality(
        jnp.asarray([100, 0, 0, 0]), jnp.asarray([50, 0, 0, 0])
    )
    assert int(q) == tracker.QUALITY_GOOD
    q = tracker.assess_tracking_quality(
        jnp.asarray([100, 0, 20, 0]), jnp.asarray([20, 0, 1, 0])
    )
    assert int(q) == tracker.QUALITY_BAD  # large-level frac 0.05 < 0.13
    q = tracker.assess_tracking_quality(
        jnp.asarray([100, 0, 0, 0]), jnp.asarray([25, 0, 0, 0])
    )
    assert int(q) == tracker.QUALITY_DODGY
    q = tracker.assess_tracking_quality(
        jnp.asarray([0, 0, 0, 0]), jnp.asarray([0, 0, 0, 0])
    )
    assert int(q) == tracker.QUALITY_BAD
