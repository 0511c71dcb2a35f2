"""Large-map full-SLAM run THROUGH THE FACADE (VERDICT r4 item 3): a long
synthetic traverse at the reference's 800x480 with max_keyframes ABOVE
dense_solver_max_cams, so every in-system BA dispatch goes through
SLAMSystem._solver_choice's scaled branches (band Schur + band-local CG,
or scatter + matrix-free PCG when the co-observation band is exceeded) —
the reference's "one BA path for any map size" contract
(jni/MapMaker.cc:776-797) realized at a scale the dense path can't serve.

Writes artifacts/LARGE_MAP_SLAM_r5.json: frames, tracked count, keyframe
count (target >= 100), solver-choice histogram, steady-state fps, map
health.

Run (TPU): python tools/run_large_map_slam.py [--frames 600]
"""

import collections
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )

    import jax.numpy as jnp

    from visualslam_android_tpu.config import (
        BundleConfig,
        MapMakerConfig,
        SLAMConfig,
        TrackerConfig,
    )
    from visualslam_android_tpu.models import slam
    from visualslam_android_tpu.ops import camera as cam_ops, lie
    from visualslam_android_tpu.utils import synthetic

    n_frames = 600
    if "--frames" in sys.argv:
        n_frames = int(sys.argv[sys.argv.index("--frames") + 1])

    config = SLAMConfig(
        tracker=TrackerConfig(
            min_frames_between_kfs=4,  # long traverse: eager KF cadence
        ),
        mapmaker=MapMakerConfig(
            max_keyframes=128,  # > dense_solver_max_cams (64)
        ),
        bundle=BundleConfig(),
    )
    cam = cam_ops.make_camera(
        config.camera.params(), config.tracker.width, config.tracker.height
    )
    rng = np.random.default_rng(11)
    shape = (config.tracker.height, config.tracker.width)

    device = jax.devices()[0]
    print(f"rendering {n_frames} frames...", flush=True)
    images = []
    gt = []
    # Scene creation AND rendering pinned to the host CPU backend: a
    # 4096^2 texture created on the default (remote TPU) device would
    # make every render round-trip 67 MB over the tunnel.
    with jax.default_device(jax.devices("cpu")[0]):
        # 17 m-wide texture so a ~12 m sideways traverse never runs off
        # the mapped plane.
        scene = synthetic.make_planar_scene(
            rng, depth=4.0, tex_size=4096, px_per_m=240.0
        )
        R0, t0 = synthetic.look_at_pose((0.0, 0.0, 0.0), target=(0, 0, 4.0))
        for k in range(n_frames):
            s = k / max(n_frames - 1, 1)
            mu = jnp.asarray([
                12.0 * s,                 # long sideways traverse
                0.15 * np.sin(9.0 * s),
                0.25 * np.sin(5.0 * s),
                0.0,
                0.05 * np.sin(7.0 * s),
                0.02 * np.sin(4.0 * s),
            ], jnp.float32)
            dR, dt = lie.se3_exp(mu)
            Rk, tk = lie.se3_mul(dR, dt, R0, t0)
            img = np.asarray(synthetic.render(scene, cam, Rk, tk, shape))
            images.append(img)
            gt.append((np.asarray(Rk), np.asarray(tk)))
    images = [jax.device_put(im, device) for im in images]

    chosen = collections.Counter()

    def run():
        sys_ = slam.SLAMSystem(config, seed=0, pipelined=True,
                               pipeline_depth=3)
        orig = sys_._solver_choice

        def spy():
            c = orig()
            chosen[f"{c[0]}+{c[1]}"] += 1
            return c

        sys_._solver_choice = spy
        n_tracked = 0
        for k, img in enumerate(images):
            if k in (0, 6):
                sys_.on_touch()
            r = sys_.track_frame(img)
            if r.valid and r.phase == slam.PHASE_TRACKING and not r.lost:
                n_tracked += 1
        for r in sys_.flush():
            if r.phase == slam.PHASE_TRACKING and not r.lost:
                n_tracked += 1
        return n_tracked, sys_

    t0_ = time.perf_counter()
    run()  # cold (compiles)
    print(f"cold pass: {time.perf_counter() - t0_:.1f}s", flush=True)
    chosen.clear()
    t0_ = time.perf_counter()
    n_tracked, sys_ = run()
    wall = time.perf_counter() - t0_
    n_kf = int(sys_.slam_map.keyframes.count())
    n_pts = int(sys_.slam_map.points.count())
    finite = bool(jnp.all(jnp.isfinite(sys_.slam_map.points.pos_w))) and \
        bool(jnp.all(jnp.isfinite(sys_.slam_map.keyframes.t)))
    art = {
        "config": "800x480, max_keyframes=128 > dense_solver_max_cams=64, "
                  "min_frames_between_kfs=4, pipelined depth 3",
        "backend": jax.default_backend(),
        "frames": n_frames,
        "tracked": n_tracked,
        "fps_warm": round(n_frames / wall, 2),
        "keyframes": n_kf,
        "map_points": n_pts,
        "solver_choices": dict(chosen),
        "band_choice_cache": (
            list(sys_._band_choice) if sys_._band_choice else None
        ),
        "map_finite": finite,
        "ba_converged": {
            "recent": sys_.recent_converged, "full": sys_.full_converged,
        },
    }
    print(json.dumps(art, indent=2, default=str))
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/LARGE_MAP_SLAM_r5.json", "w") as f:
        json.dump(art, f, indent=2, default=str)
    print("wrote artifacts/LARGE_MAP_SLAM_r5.json")


if __name__ == "__main__":
    main()
