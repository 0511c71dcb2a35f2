"""Reusable synthetic fixtures: a rendered planar scene with a
ground-truth fixed map, used by tests, benchmarks, and the driver entry
points."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.config import (
    MapMakerConfig,
    SLAMConfig,
    TrackerConfig,
)
from visualslam_android_tpu.models import keyframe as kf_mod
from visualslam_android_tpu.models import map_store
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.utils import synthetic


def small_config(width=320, height=240) -> SLAMConfig:
    return SLAMConfig(
        tracker=TrackerConfig(
            width=width, height=height,
            max_map_points=256,
            max_corners_per_level=(256, 128, 64, 32),
        ),
        mapmaker=MapMakerConfig(max_keyframes=4),
    )


def full_config() -> SLAMConfig:
    """Reference-scale frames (800x480, jni/jni_part.cpp:41)."""
    return SLAMConfig(
        tracker=TrackerConfig(max_map_points=2048),
        mapmaker=MapMakerConfig(max_keyframes=32),
    )


def build_band_ba_map(rng, n_kf=512, n_pts=30000, obs_per_pt=4,
                      width=64, height=48, noise_px=0.3,
                      pose_perturb=0.004, point_perturb=0.01):
    """KITTI-scale band-diagonal bundle problem as a full SLAMMap: n_kf
    keyframes along a straight trajectory, each point observed by the
    obs_per_pt nearest cameras (consecutive, so the reduced camera system
    is band-sparse exactly like an odometry run). Ground-truth geometry
    with pixel noise, pose/point perturbations on everything but KF 0.

    Returns (config, slam_map, cam, adjust_mask). Feeding it through
    build_ba_problem -> bundle_adjust(scatter/PCG) is BASELINE config 4
    (the scale the reference's dense mS.inverse()*vE solve,
    jni/Bundle.cc:437, cannot reach).
    """
    import dataclasses as _dc

    import jax

    from visualslam_android_tpu.config import BundleConfig
    from visualslam_android_tpu.ops import lie

    config = SLAMConfig(
        tracker=TrackerConfig(
            width=width, height=height,
            max_map_points=n_pts,
            max_corners_per_level=(64, 32, 16, 8),
        ),
        mapmaker=MapMakerConfig(max_keyframes=n_kf),
        bundle=BundleConfig(max_obs_per_point=obs_per_pt),
    )
    cam = cam_ops.make_camera(config.camera.params(), width, height)

    spacing = 0.1
    cam_x = spacing * np.arange(n_kf)
    # Points spread along the trajectory at depth ~4-6, laterally within
    # the (narrow) frustum.
    pts = np.stack(
        [
            rng.uniform(-0.5, cam_x[-1] + 0.5, n_pts),
            rng.uniform(-1.2, 1.2, n_pts),
            rng.uniform(3.6, 6.0, n_pts),
        ],
        axis=-1,
    ).astype(np.float32)

    # Band observations: each point sees the obs_per_pt cameras nearest
    # its x coordinate (all cameras share R = I, t = -center).
    k0 = np.clip(
        np.round(pts[:, 0] / spacing).astype(int) - obs_per_pt // 2,
        0, n_kf - obs_per_pt,
    )
    kf_idx = k0[:, None] + np.arange(obs_per_pt)[None, :]  # [N, O]
    centers = np.stack(
        [cam_x, np.zeros(n_kf), np.zeros(n_kf)], -1
    ).astype(np.float32)
    pc = pts[:, None, :] - centers[kf_idx]  # [N, O, 3] (R = I)
    import jax.numpy as _jnp

    m = pc[..., :2] / pc[..., 2:]
    px = np.asarray(cam_ops.project(cam, _jnp.asarray(
        m.reshape(-1, 2), _jnp.float32
    ))).reshape(n_pts, obs_per_pt, 2)
    in_img = (
        (px[..., 0] >= 1) & (px[..., 0] < width - 1)
        & (px[..., 1] >= 1) & (px[..., 1] < height - 1)
    )
    px = px + rng.normal(scale=noise_px, size=px.shape).astype(np.float32)

    sm = map_store.empty_map(config)
    kfs = sm.keyframes
    t_true = -centers  # R = I
    dmu = rng.normal(scale=pose_perturb, size=(n_kf, 6)).astype(np.float32)
    dmu[0] = 0.0
    dR, dt = lie.se3_exp(_jnp.asarray(dmu))
    R_init, t_init = lie.se3_mul(
        dR, dt,
        _jnp.broadcast_to(_jnp.eye(3, dtype=_jnp.float32), (n_kf, 3, 3)),
        _jnp.asarray(t_true),
    )
    kfs = kfs._replace(
        valid=_jnp.ones(n_kf, bool),
        fixed=_jnp.zeros(n_kf, bool).at[0].set(True),
        R=R_init, t=t_init,
        depth_mean=_jnp.full((n_kf,), 4.5, _jnp.float32),
        depth_sigma=_jnp.full((n_kf,), 0.8, _jnp.float32),
    )
    pts_init = pts + rng.normal(
        scale=point_perturb, size=pts.shape
    ).astype(np.float32)
    points = sm.points._replace(
        valid=_jnp.ones(n_pts, bool),
        pos_w=_jnp.asarray(pts_init),
        source_kf=_jnp.asarray(kf_idx[:, 0], _jnp.int32),
    )
    meas = sm.meas._replace(
        kf=_jnp.asarray(kf_idx, _jnp.int32),
        uv=_jnp.asarray(px),
        level=_jnp.zeros((n_pts, obs_per_pt), _jnp.int32),
        source=_jnp.full(
            (n_pts, obs_per_pt), map_store.SRC_EPIPOLAR, _jnp.int32
        ).at[:, 0].set(map_store.SRC_ROOT),
        valid=_jnp.asarray(in_img),
    )
    sm = sm._replace(keyframes=kfs, points=points, meas=meas,
                     good=_jnp.asarray(True))
    adjust = kfs.valid & ~kfs.fixed
    return config, sm, cam, adjust


def build_fixed_map(config: SLAMConfig, rng, per_level=(60, 40, 24, 12),
                    depth=4.0, px_per_m=120.0):
    """One-keyframe map with exact ground-truth plane points created from
    the keyframe's Shi-Tomasi candidates.

    Returns (slam_map, cam, scene, (R0, t0), n_points).

    Fixture construction always runs on the host CPU backend: it is a pile
    of small sequential dispatches (per-level candidate scatter, one-off
    front-end compiles) that would cost minutes of round-trips over a
    remote TPU link. The finished map is transferred to the default device
    in one hop at the end."""
    import jax

    cpu = jax.devices("cpu")[0]
    default = jax.devices()[0]
    with jax.default_device(cpu):
        out = _build_fixed_map_impl(
            config, rng, per_level, depth, px_per_m
        )
    slam_map, cam, scene, pose, slot = out
    if default.platform != "cpu":
        slam_map = jax.device_put(slam_map, default)
        cam = jax.device_put(cam, default)
        pose = jax.device_put(pose, default)
    return slam_map, cam, scene, pose, slot


def _build_fixed_map_impl(config, rng, per_level, depth, px_per_m):
    cam = cam_ops.make_camera(
        config.camera.params(), config.tracker.width, config.tracker.height
    )
    scene = synthetic.make_planar_scene(rng, depth=depth, px_per_m=px_per_m)
    R0, t0 = synthetic.look_at_pose((0.0, 0.0, 0.0), target=(0, 0, depth))
    img0 = synthetic.render(
        scene, cam, R0, t0, (config.tracker.height, config.tracker.width)
    )
    frame0 = kf_mod.make_frame(img0, config)
    extras0 = kf_mod.make_frame_extras(frame0, config)

    slam_map = map_store.empty_map(config)
    kfs = kf_mod.insert_keyframe(
        slam_map.keyframes, 0, frame0, extras0, R0, t0, fixed=True
    )
    slam_map = slam_map._replace(keyframes=kfs)

    # Vectorized point creation: one batched update per pyramid level
    # (a per-point Python loop costs thousands of tiny dispatches, which
    # is pathological over a remote TPU link).
    pts, meas = slam_map.points, slam_map.meas
    slot = 0
    for lvl in range(config.tracker.n_levels):
        valid = np.asarray(extras0.cand_valid[lvl])
        n_take = min(
            per_level[lvl], int(valid.sum()), pts.n_slots - slot
        )
        if n_take <= 0:
            continue
        xy = extras0.cand_xy[lvl][:n_take].astype(jnp.float32)  # [n, 2]
        scale = 1 << lvl
        zero_xy = (xy + 0.5) * scale - 0.5
        pos_w = synthetic.plane_point_from_pixel(scene, cam, R0, t0, zero_xy)
        c_nc, r_nc, d_nc, n_nc = kf_mod.candidate_rays(cam, xy, lvl)
        sl = slice(slot, slot + n_take)
        pts = pts._replace(
            valid=pts.valid.at[sl].set(True),
            pos_w=pts.pos_w.at[sl].set(pos_w),
            source_kf=pts.source_kf.at[sl].set(0),
            source_level=pts.source_level.at[sl].set(lvl),
            center=pts.center.at[sl].set(xy),
            center_nc=pts.center_nc.at[sl].set(c_nc),
            right_nc=pts.right_nc.at[sl].set(r_nc),
            down_nc=pts.down_nc.at[sl].set(d_nc),
            normal_nc=pts.normal_nc.at[sl].set(n_nc),
        )
        meas = meas._replace(
            kf=meas.kf.at[sl, 0].set(0),
            uv=meas.uv.at[sl, 0].set(zero_xy),
            level=meas.level.at[sl, 0].set(lvl),
            source=meas.source.at[sl, 0].set(map_store.SRC_ROOT),
            subpix=meas.subpix.at[sl, 0].set(True),
            valid=meas.valid.at[sl, 0].set(True),
        )
        slot += n_take
    pts = map_store.refresh_pixel_vectors(pts, kfs)
    slam_map = slam_map._replace(
        points=pts, meas=meas, good=jnp.asarray(True)
    )
    slam_map = kf_mod.refresh_scene_depth(slam_map, 0)
    return slam_map, cam, scene, (R0, t0), slot
