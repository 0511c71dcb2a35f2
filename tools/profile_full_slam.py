"""Profile the full-SLAM loop (the bench.py _full_slam_fps config) with
per-stage timers + a per-task breakdown of the mapmaker scheduler, to
show where the wall-clock goes on the live backend."""

import collections
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

    from visualslam_android_tpu.config import (
        MapMakerConfig,
        SLAMConfig,
        TrackerConfig,
    )
    from visualslam_android_tpu.models import slam
    from visualslam_android_tpu.utils import datasets

    pipelined = "--sync" not in sys.argv

    rng = np.random.default_rng(11)
    n_frames = 60
    images, poses, centers, _, _ = datasets.make_synthetic_sequence(
        rng, n_frames=n_frames, size=(320, 240)
    )
    config = SLAMConfig(
        tracker=TrackerConfig(
            width=320, height=240, max_map_points=512,
            max_corners_per_level=(512, 256, 128, 64),
            max_trails=256, min_frames_between_kfs=6,
        ),
        mapmaker=MapMakerConfig(max_keyframes=8, max_epi_candidates=64),
    )

    task_counts = collections.Counter()
    task_times = collections.defaultdict(float)

    def run(profile=False):
        sys_ = slam.SLAMSystem(config, seed=0, pipelined=pipelined)
        sys_.timer.enabled = profile
        if profile:
            orig_step = sys_._mapmaker_step

            def timed_step():
                t0 = time.perf_counter()
                task = orig_step()
                jax.block_until_ready(sys_.slam_map.points.pos_w)
                task_times[f"task_{task}"] += time.perf_counter() - t0
                task_counts[f"task_{task}"] += 1
                return task

            sys_._mapmaker_step = timed_step
        n_tracked = 0
        for k, img in enumerate(images):
            if k in (0, 6):
                sys_.on_touch()
            res = sys_.track_frame(img)
            if (res.frame_id >= 0 and res.phase == slam.PHASE_TRACKING
                    and not res.lost):
                n_tracked += 1
        for res in sys_.flush():
            if res.phase == slam.PHASE_TRACKING and not res.lost:
                n_tracked += 1
        return n_tracked, sys_

    t0 = time.perf_counter()
    run()  # cold
    print(f"cold pass: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    n_tracked, sys_ = run(profile=True)
    wall = time.perf_counter() - t0
    mode = "pipelined" if pipelined else "sync"
    print(f"warm pass ({mode}): {wall:.2f}s = {n_frames / wall:.2f} fps "
          f"({n_tracked} tracked)")
    print(sys_.timer.report())
    print("\nmapmaker task breakdown (incl. device sync):")
    for k in sorted(task_times):
        print(f"  {k:<22} {task_times[k]:8.3f}s  x{task_counts.get(k, '')}")


if __name__ == "__main__":
    main()
