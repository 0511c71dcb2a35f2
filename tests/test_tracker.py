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


def small_config():
    return SLAMConfig(
        tracker=TrackerConfig(
            width=320, height=240,
            max_map_points=256,
            max_corners_per_level=(256, 128, 64, 32),
        ),
        mapmaker=MapMakerConfig(max_keyframes=4),
    )


def build_fixed_map(config, rng):
    """One-keyframe map with ground-truth plane points from candidates."""
    cam = cam_ops.make_camera(
        config.camera.params(), config.tracker.width, config.tracker.height
    )
    scene = synthetic.make_planar_scene(rng, depth=4.0, px_per_m=120.0)
    R0, t0 = synthetic.look_at_pose((0.0, 0.0, 0.0))
    img0 = synthetic.render(
        scene, cam, R0, t0,
        (config.tracker.height, config.tracker.width),
    )
    frame0 = kf_mod.make_frame(img0, config)
    extras0 = kf_mod.make_frame_extras(frame0, config)

    slam_map = map_store.empty_map(config)
    kfs = kf_mod.insert_keyframe(
        slam_map.keyframes, 0, frame0, extras0, R0, t0, fixed=True
    )
    slam_map = slam_map._replace(keyframes=kfs)

    # Make map points from candidates at every level (exact ground truth).
    pts = slam_map.points
    meas = slam_map.meas
    slot = 0
    per_level = [60, 40, 24, 12]
    for lvl in range(4):
        xy = np.asarray(extras0.cand_xy[lvl])
        valid = np.asarray(extras0.cand_valid[lvl])
        n_take = min(per_level[lvl], int(valid.sum()))
        scale = 1 << lvl
        for i in range(n_take):
            if slot >= pts.n_slots:
                break
            x, y = xy[i]
            zero_xy = jnp.asarray(
                [(x + 0.5) * scale - 0.5, (y + 0.5) * scale - 0.5],
                jnp.float32,
            )
            pos_w = synthetic.plane_point_from_pixel(
                scene, cam, R0, t0, zero_xy
            )
            c_nc, r_nc, d_nc, n_nc = kf_mod.candidate_rays(
                cam, jnp.asarray([[x, y]], jnp.float32), lvl
            )
            pts = pts._replace(
                valid=pts.valid.at[slot].set(True),
                pos_w=pts.pos_w.at[slot].set(pos_w),
                source_kf=pts.source_kf.at[slot].set(0),
                source_level=pts.source_level.at[slot].set(lvl),
                center=pts.center.at[slot].set(
                    jnp.asarray([x, y], jnp.float32)
                ),
                center_nc=pts.center_nc.at[slot].set(c_nc[0]),
                right_nc=pts.right_nc.at[slot].set(r_nc[0]),
                down_nc=pts.down_nc.at[slot].set(d_nc[0]),
                normal_nc=pts.normal_nc.at[slot].set(n_nc[0]),
            )
            meas = map_store.add_measurement(
                meas, slot, 0, zero_xy, lvl, map_store.SRC_ROOT, True
            )
            slot += 1
    pts = map_store.refresh_pixel_vectors(pts, kfs)
    slam_map = slam_map._replace(
        points=pts, meas=meas, good=jnp.asarray(True)
    )
    slam_map = kf_mod.refresh_scene_depth(slam_map, 0)
    return slam_map, cam, scene, (R0, t0), slot


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
