"""Measure HOST-side per-frame cost of the full-SLAM loop: stage timers
enabled but with StageTimer.sync() no-op'ed, so every stage records
dispatch/bookkeeping wall-clock only (stats_pull still blocks — that IS
the transfer being measured). Complements tools/profile_full_slam.py,
whose profiled pass adds a device sync per stage.

Usage: python tools/profile_host_overhead.py [--frames N] [--sync]
"""

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

    from visualslam_android_tpu.config import SLAMConfig
    from visualslam_android_tpu.models import slam
    from visualslam_android_tpu.utils import datasets

    n_frames = 120
    if "--frames" in sys.argv:
        n_frames = int(sys.argv[sys.argv.index("--frames") + 1])
    depth = 1
    if "--depth" in sys.argv:
        depth = int(sys.argv[sys.argv.index("--depth") + 1])
    pipelined = "--sync" not in sys.argv

    rng = np.random.default_rng(11)
    images, *_ = datasets.make_synthetic_sequence(
        rng, n_frames=n_frames, size=(800, 480), px_per_m=240.0
    )
    device = jax.devices()[0]
    images = [
        jax.device_put(np.asarray(im, np.float32), device) for im in images
    ]
    config = SLAMConfig()

    def run(timed=False):
        sys_ = slam.SLAMSystem(config, seed=0, pipelined=pipelined,
                               pipeline_depth=depth)
        if timed:
            sys_.timer.enabled = True
            sys_.timer.sync = lambda *a: None  # host cost only
            per_frame = []
        n_tracked = 0
        for k, img in enumerate(images):
            t0 = time.perf_counter()
            if k in (0, 6):
                sys_.on_touch()
            res = sys_.track_frame(img)
            if timed:
                per_frame.append(time.perf_counter() - t0)
            if (res.valid and res.phase == slam.PHASE_TRACKING
                    and not res.lost):
                n_tracked += 1
        for res in sys_.flush():
            if res.phase == slam.PHASE_TRACKING and not res.lost:
                n_tracked += 1
        return n_tracked, sys_, (per_frame if timed else None)

    t0 = time.perf_counter()
    run()
    print(f"cold: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    n_tracked, _, _ = run()
    wall = time.perf_counter() - t0
    print(f"warm untimed: {wall:.2f}s = {n_frames / wall:.2f} fps "
          f"({n_tracked} tracked)")
    t0 = time.perf_counter()
    n_tracked, sys_, per_frame = run(timed=True)
    wall = time.perf_counter() - t0
    print(f"warm timed (host-only stages): {wall:.2f}s = "
          f"{n_frames / wall:.2f} fps ({n_tracked} tracked)")
    print(sys_.timer.report())
    pf = sorted(per_frame)
    n = len(pf)
    print(f"\nper-frame wall: p50 {1e3 * pf[n // 2]:.1f} ms  "
          f"p90 {1e3 * pf[int(n * 0.9)]:.1f} ms  max {1e3 * pf[-1]:.1f} ms")
    # Steady-state tail (last 60 frames): what the deployment rate would be
    tail = per_frame[-60:]
    print(f"tail-60 mean {1e3 * np.mean(tail):.1f} ms = "
          f"{1.0 / np.mean(tail):.1f} fps")


if __name__ == "__main__":
    main()
