"""Benchmark: per-frame tracking throughput on the live JAX backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 60 fps tracking per chip (BASELINE.md / BASELINE.json).

The benchmark drives the full jitted tracking step (PVS projection, warped
template generation for every map point, coarse+fine ZMSSD search,
all-level subpixel refinement, 10 robust GN pose iterations) on
reference-scale 800x480 frames with a 2048-slot map, exactly the per-frame
work of jni/Tracker.cc:76-146 (which the reference runs single-threaded on
an ARMv7 phone).
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    # Persistent compilation cache: the tracking program takes minutes to
    # compile over a remote TPU link; cached executables load in seconds.
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from visualslam_android_tpu.models import keyframe as kf_mod
    from visualslam_android_tpu.models import tracker
    from visualslam_android_tpu.ops import lie
    from visualslam_android_tpu.utils import fixtures, synthetic

    rng = np.random.default_rng(7)
    config = fixtures.full_config()
    slam_map, cam, scene, (R0, t0), n_pts = fixtures.build_fixed_map(
        config, rng, per_level=(900, 500, 300, 120), px_per_m=240.0
    )
    shape = (config.tracker.height, config.tracker.width)

    # A short loop of pre-rendered frames with a moving camera (rendered on
    # the host CPU backend; transferred to the bench device once).
    n_frames = 4
    frames = []
    poses = []
    device = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        for k in range(n_frames):
            s = k / n_frames
            mu = jnp.asarray(
                [0.05 * np.sin(6.28 * s), 0.02 * s, 0.03 * s,
                 0.0, 0.04 * np.sin(6.28 * s), 0.01 * s],
                jnp.float32,
            )
            dR, dt = lie.se3_exp(mu)
            Rk, tk = lie.se3_mul(dR, dt, R0, t0)
            img = synthetic.render(scene, cam, Rk, tk, shape)
            poses.append(jax.device_put((Rk, tk), device))
            frames.append(jax.device_put(img, device))

    @jax.jit
    def step(img, slam_map, R, t, key):
        frame = kf_mod.make_frame(img, config)
        out = tracker.track_map(
            frame, slam_map, cam, R, t, jnp.asarray(0.0, jnp.float32),
            key, config,
        )
        return out.R, out.t, jnp.sum(out.found)

    key = jax.random.PRNGKey(0)
    # Warmup / compile.
    R, t = poses[0]
    out = step(frames[0], slam_map, R, t, key)
    out[0].block_until_ready()

    iters = 30
    t0_ = time.perf_counter()
    for i in range(iters):
        k = i % n_frames
        R, t = poses[k]
        out = step(frames[k], slam_map, R, t, key)
    out[0].block_until_ready()
    dt_ = time.perf_counter() - t0_
    fps = iters / dt_

    print(
        json.dumps(
            {
                "metric": "tracking_fps_800x480_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
