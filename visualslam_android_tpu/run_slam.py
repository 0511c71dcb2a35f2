"""CLI harness: run the full SLAM system on a dataset (TUM / KITTI / the
built-in synthetic sequence), with scripted bootstrap presses replacing the
reference's touch events (jni/SystemPTAM touch -> spacebar,
jni/jni_part.cpp:49-51), and report similarity-aligned ATE when ground
truth exists (SURVEY.md §7.10 harness).

Usage:
  python -m visualslam_android_tpu.run_slam --dataset synthetic --frames 40
  python -m visualslam_android_tpu.run_slam --dataset tum --root <dir>
  python -m visualslam_android_tpu.run_slam --dataset kitti --root <dir>
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=["synthetic", "tum", "kitti"],
                   default="synthetic")
    p.add_argument("--root", default=None, help="dataset root directory")
    p.add_argument("--sequence", default="00", help="KITTI sequence id")
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--init-frame", type=int, default=0,
                   help="frame of the first bootstrap press")
    p.add_argument("--stereo-frame", type=int, default=6,
                   help="frame of the second bootstrap press")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-map", default=None)
    p.add_argument("--json", action="store_true",
                   help="print one JSON line instead of a report")
    p.add_argument("--profile", action="store_true",
                   help="print a per-stage wall-clock timing table")
    p.add_argument("--trace-dir", default=None,
                   help="capture an XLA profiler trace into this dir")
    p.add_argument("--preset", choices=["default", "small"],
                   default="default",
                   help="'small' shrinks map/corner capacities for quick "
                        "runs (fast compiles, lower quality ceiling)")
    p.add_argument("--platform", choices=["default", "cpu", "tpu"],
                   default="default",
                   help="force a JAX backend (overrides plugin platforms "
                        "that ignore the JAX_PLATFORMS env var)")
    p.add_argument("--sync", action="store_true",
                   help="synchronous per-frame results (one blocking "
                        "device pull per frame) instead of the default "
                        "pipelined mode, where results lag one frame and "
                        "steady-state tracking never blocks on the link")
    p.add_argument("--pipeline-depth", type=int, default=1,
                   help="pipelined mode: frames in flight before blocking "
                        "on the oldest stats pull. 1 = results exactly one "
                        "frame late, bit-identical to --sync; >=2 hides "
                        "the full device->host round-trip behind later "
                        "frames (throughput mode over a remote-TPU link; "
                        "host decisions then trail that many frames)")
    args = p.parse_args(argv)

    # Persistent compilation cache: the jitted tracking/mapping programs
    # dominate cold-start time; cached executables load in seconds.
    import os

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    if args.platform != "cpu":
        # XLA:CPU cache entries can SEGFAULT on reload on hosts whose ISA
        # mismatches the AOT kernel set (see tests/conftest.py), so the
        # persistent cache is TPU-only.
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visualslam_android_tpu.config import (
        MapMakerConfig,
        SLAMConfig,
        TrackerConfig,
    )
    from visualslam_android_tpu.models import slam
    from visualslam_android_tpu.utils import (
        ate,
        datasets,
        profiling,
        serialization,
    )

    rng = np.random.default_rng(args.seed)
    gt_centers = None
    if args.dataset == "synthetic":
        size = (args.width or 320, args.height or 240)
        images, poses, gt_centers, _, _ = datasets.make_synthetic_sequence(
            rng, n_frames=args.frames, size=size
        )
        images = iter(images)
        n_frames = args.frames
    else:
        if not args.root:
            raise SystemExit("--root required for tum/kitti")
        if args.dataset == "tum":
            seq = datasets.load_tum(
                args.root, size=(args.width or 640, args.height or 480),
                max_frames=args.frames,
            )
        else:
            seq = datasets.load_kitti(
                args.root, args.sequence,
                size=(args.width or 620, args.height or 188),
                max_frames=args.frames,
            )
        size = seq.size
        gt_centers = seq.gt_positions
        images = datasets.iter_images(seq)
        n_frames = len(seq)

    if args.preset == "small":
        config = SLAMConfig(
            tracker=TrackerConfig(
                width=size[0], height=size[1],
                max_map_points=256,
                max_corners_per_level=(256, 128, 64, 32),
                max_trails=128,
                min_frames_between_kfs=6,
            ),
            mapmaker=MapMakerConfig(max_keyframes=8,
                                    max_epi_candidates=64),
        )
    else:
        config = SLAMConfig(
            tracker=TrackerConfig(
                width=size[0], height=size[1],
                max_map_points=1024,
                max_corners_per_level=(512, 256, 128, 64),
                min_frames_between_kfs=6,
            ),
            mapmaker=MapMakerConfig(max_keyframes=16,
                                    max_epi_candidates=128),
        )
    sys_ = slam.SLAMSystem(
        config, seed=args.seed, pipelined=not args.sync,
        pipeline_depth=args.pipeline_depth,
    )
    sys_.timer.enabled = args.profile

    est, used_gt = [], []

    def consume(res):
        if not res.valid:
            return  # pipelined warm-up placeholder (FrameResult.valid)
        if not args.json:
            print(
                f"[{res.frame_id:4d}] {res.message}"
                + ("  (lost)" if res.lost else "")
            )
        if res.phase == slam.PHASE_TRACKING and not res.lost:
            est.append((res.pose_R, res.pose_t))
            if gt_centers is not None:
                used_gt.append(gt_centers[res.frame_id])

    t0 = time.perf_counter()
    with profiling.xla_trace(args.trace_dir):
        for k, img in enumerate(images):
            if k == args.init_frame or k == args.stereo_frame:
                sys_.on_touch()
            consume(sys_.track_frame(img))
        for res in sys_.flush():
            consume(res)
    wall = time.perf_counter() - t0
    if args.profile:
        print(sys_.timer.report())

    report = {
        "frames": n_frames,
        "tracked": len(est),
        "fps": round(n_frames / wall, 2),
        "map_points": int(sys_.slam_map.points.count()),
        "keyframes": int(sys_.slam_map.keyframes.count()),
    }
    if gt_centers is not None and len(est) > 5:
        centers = ate.camera_centers(
            [e[0] for e in est], [e[1] for e in est]
        )
        rmse, _ = ate.ate_rmse(centers, np.asarray(used_gt))
        report["ate_rmse"] = round(rmse, 5)
    if args.save_map:
        serialization.save_map(args.save_map, sys_.slam_map, config)
        report["map_saved"] = args.save_map
    print(json.dumps(report))


if __name__ == "__main__":
    main()
