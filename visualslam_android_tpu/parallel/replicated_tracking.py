"""Replicated tracking across devices (SURVEY.md §2 parallelism table,
row "replicated tracking").

The reference tracks ONE camera on one phone thread (Tracker::TrackFrame,
jni/Tracker.cc:76-146). The TPU-native expression of "tracking replicated
across devices" is multi-stream serving: S independent camera streams
tracked against one shared map, the stream axis sharded over the device
mesh and the map REPLICATED on every device. Each device runs the
complete per-frame hot path (front-end + SBI ESM rotation prior + motion
model + TrackMap) for its streams; no collectives are needed because
streams are independent — the SPMD partitioner compiles this to S fully
parallel tracking programs.

The tracked map is read-only here (the live map is advanced by the host
mapmaker scheduler, models/slam.py); per-stream pose/velocity/SBI state
rides in a StreamState pytree with a leading stream axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visualslam_android_tpu.config import SLAMConfig
from visualslam_android_tpu.models import keyframe as kf_mod
from visualslam_android_tpu.models import tracker
from visualslam_android_tpu.models.map_store import SLAMMap
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import sbi as sbi_ops

AXIS = "streams"


def make_mesh(devices=None, axis=AXIS) -> Mesh:
    import numpy as np

    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


class StreamState(NamedTuple):
    """Per-stream tracker state (leading axis = stream)."""

    R: jnp.ndarray                 # [S, 3, 3]
    t: jnp.ndarray                 # [S, 3]
    velocity: jnp.ndarray          # [S, 6]
    vel_msd_mag: jnp.ndarray       # [S]
    scene_depth_mean: jnp.ndarray  # [S]
    sbi_last: sbi_ops.SBI          # [S, h, w] template / [S, h, w, 2] jacs
    has_sbi: jnp.ndarray           # [S] bool (first frame has no prior SBI)


class StreamOutputs(NamedTuple):
    R: jnp.ndarray             # [S, 3, 3]
    t: jnp.ndarray             # [S, 3]
    n_found: jnp.ndarray       # [S] int32
    quality: jnp.ndarray       # [S] int32 (2 good / 1 dodgy / 0 bad)
    did_coarse: jnp.ndarray    # [S] bool


def init_streams(n_streams: int, R0, t0, config: SLAMConfig,
                 depth_mean=4.0) -> StreamState:
    """All streams start at pose (R0, t0) with zero velocity and no SBI
    prior; broadcast per-stream values in afterwards if streams differ."""
    tc = config.tracker
    h = tc.height // 16
    w = tc.width // 16
    S = n_streams
    f32 = jnp.float32
    return StreamState(
        R=jnp.broadcast_to(jnp.asarray(R0, f32), (S, 3, 3)),
        t=jnp.broadcast_to(jnp.asarray(t0, f32), (S, 3)),
        velocity=jnp.zeros((S, 6), f32),
        vel_msd_mag=jnp.zeros(S, f32),
        scene_depth_mean=jnp.full(S, depth_mean, f32),
        sbi_last=sbi_ops.SBI(
            template=jnp.zeros((S, h, w), f32),
            jacs=jnp.zeros((S, h, w, 2), f32),
        ),
        has_sbi=jnp.zeros(S, bool),
    )


def _one_stream_step(img, state, slam_map, cam, key, config: SLAMConfig):
    """The full TrackFrame hot path (Tracker.cc:76-146) for ONE stream:
    front-end, SBI + ESM rotation prior, motion model, TrackMap, motion
    model update. Unbatched — stream_step vmaps this."""
    tc = config.tracker
    frame = kf_mod.make_frame(img, config)
    sbi_cur = sbi_ops.make_sbi(frame.pyramid[-1], tc.sbi_blur)
    sbi_rot = tracker.calc_sbi_rotation(
        sbi_cur.template, state.sbi_last, cam, tc.sbi_esm_iters
    )
    R1, t1 = tracker.apply_motion_model(
        state.R, state.t, state.velocity, sbi_rot, state.has_sbi
    )
    out = tracker.track_map(
        frame, slam_map, cam, R1, t1, state.vel_msd_mag, key, config
    )
    depth = jnp.where(
        out.depth_stats_valid, out.scene_depth_mean, state.scene_depth_mean
    )
    velocity, _, msd = tracker.update_motion_model(
        out.R, out.t, state.R, state.t, state.velocity, depth,
        tc.motion_decay,
    )
    quality = tracker.assess_tracking_quality(
        out.attempted_per_level, out.found_per_level,
        tc.quality_good, tc.quality_lost,
    )
    new_state = StreamState(
        R=out.R, t=out.t, velocity=velocity, vel_msd_mag=msd,
        scene_depth_mean=depth, sbi_last=sbi_cur,
        has_sbi=jnp.asarray(True),
    )
    outputs = StreamOutputs(
        R=out.R, t=out.t,
        n_found=jnp.sum(out.found).astype(jnp.int32),
        quality=jnp.asarray(quality, jnp.int32),
        did_coarse=out.did_coarse,
    )
    return new_state, outputs


def stream_step(imgs, state: StreamState, slam_map: SLAMMap,
                cam: cam_ops.Camera, keys, config: SLAMConfig):
    """One tracking frame for all S streams: vmap of the single-stream
    TrackFrame over the leading axis. imgs [S, H, W]; keys [S, 2] PRNG
    keys. Returns (StreamState, StreamOutputs). jit/shard via
    make_replicated_step for multi-device execution."""
    return jax.vmap(
        _one_stream_step, in_axes=(0, 0, None, None, 0, None)
    )(imgs, state, slam_map, cam, keys, config)


def replicated_step_fn(mesh: Mesh, config: SLAMConfig, axis=AXIS):
    """jit stream_step with the stream axis sharded over `mesh` and the
    map/camera replicated. The number of streams must be a multiple of
    the mesh size. Returns step(imgs, state, slam_map, cam, keys)."""
    stream = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def step(imgs, state, slam_map, cam, keys):
        imgs = jax.lax.with_sharding_constraint(imgs, stream)
        state = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, stream), state
        )
        slam_map = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, repl), slam_map
        )
        new_state, outputs = stream_step(
            imgs, state, slam_map, cam, keys, config
        )
        return new_state, outputs

    return step
