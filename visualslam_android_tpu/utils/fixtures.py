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
