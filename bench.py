"""Benchmark: per-frame tracking throughput on the live JAX backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Baseline: 60 fps tracking per chip (BASELINE.md / BASELINE.json).

The benchmark drives the COMPLETE per-frame hot path of the reference's
Tracker::TrackFrame (jni/Tracker.cc:76-146) as one jitted step:

- pyramid build + FAST corner masks (MakeKeyFrame_Lite, KeyFrame.cc:5-51),
- SmallBlurryImage build (Tracker.cc:87-97),
- 6-iteration ESM rotation prior vs the previous frame's SBI
  (CalcSBIRotation, Tracker.cc:885-893),
- decaying-velocity motion model apply + update (Tracker.cc:781-820),
- TrackMap: PVS projection, warped template generation for every map
  point, coarse+fine ZMSSD search, all-level subpixel refinement, 10
  robust GN pose iterations (Tracker.cc:358-626),

on reference-scale 800x480 frames with a 2048-slot map, over 100 DISTINCT
pre-rendered frames chained frame-to-frame (each step consumes the
previous step's pose/velocity/SBI, exactly like the live loop). The
reference runs this single-threaded on an ARMv7 phone.

"extra" reports (a) multi-stream serving throughput — 4 independent
camera streams batched through the same per-frame program with vmap on
the one chip (the single-device form of parallel/replicated_tracking.py;
bigger batched matmuls fill the MXU better, so aggregate fps beats
4 sequential streams) — and (b) full-SLAM throughput (bootstrap +
tracking + the restored mapping scheduler with keyframe adds, epipolar
growth, refind and BA) at the reference's own 800x480 frame size and
default capacities, timed on a second warm pass.
"""

import json
import os
import time

# Keep XLA C++ warnings (e.g. the harmless host machine-feature notice)
# out of stderr so the driver's bench artifact captures only the metric
# line (ADVICE r3 item 2). Must be set before jax/XLA initialize.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np


def _tracking_fps():
    import jax
    import jax.numpy as jnp

    from visualslam_android_tpu.models import keyframe as kf_mod
    from visualslam_android_tpu.models import tracker
    from visualslam_android_tpu.ops import lie
    from visualslam_android_tpu.ops import sbi as sbi_ops
    from visualslam_android_tpu.utils import fixtures, synthetic

    # The persistent cache is suspended for fixture construction and frame
    # rendering (both pinned to the host CPU backend): looking up (or
    # writing) XLA:CPU AOT entries emits multi-KB machine-feature stderr
    # warnings that polluted the driver-captured bench tail in earlier
    # rounds; these small CPU programs recompile in milliseconds anyway.
    cache_dir_saved = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)

    rng = np.random.default_rng(7)
    config = fixtures.full_config()
    tc = config.tracker
    slam_map, cam, scene, (R0, t0), n_pts = fixtures.build_fixed_map(
        config, rng, per_level=(900, 500, 300, 120), px_per_m=240.0
    )
    shape = (tc.height, tc.width)

    # 100 distinct pre-rendered frames of a smooth camera path (rendered on
    # the host CPU backend; transferred to the bench device once).
    n_frames = 100
    frames = []
    device = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        for k in range(n_frames):
            s = k / n_frames
            mu = jnp.asarray(
                [0.05 * np.sin(6.28 * s), 0.02 * np.sin(4.4 * s),
                 0.03 * s,
                 0.02 * np.sin(5.1 * s), 0.04 * np.sin(6.28 * s),
                 0.01 * np.sin(3.3 * s)],
                jnp.float32,
            )
            dR, dt = lie.se3_exp(mu)
            Rk, tk = lie.se3_mul(dR, dt, R0, t0)
            img = synthetic.render(scene, cam, Rk, tk, shape)
            frames.append(jax.device_put(img, device))
    jax.config.update("jax_compilation_cache_dir", cache_dir_saved)

    depth_mean = jnp.asarray(4.0, jnp.float32)

    @jax.jit
    def step(img, slam_map, R, t, velocity, msd, sbi_last, key):
        # The full TrackFrame hot path (Tracker.cc:76-146).
        frame = kf_mod.make_frame(img, config)
        sbi_cur = sbi_ops.make_sbi(frame.pyramid[-1], tc.sbi_blur)
        sbi_rot = tracker.calc_sbi_rotation(
            sbi_cur.template, sbi_last, cam, tc.sbi_esm_iters
        )
        R1, t1 = tracker.apply_motion_model(
            R, t, velocity, sbi_rot, jnp.asarray(True)
        )
        out = tracker.track_map(
            frame, slam_map, cam, R1, t1, msd, key, config
        )
        velocity, _, msd = tracker.update_motion_model(
            out.R, out.t, R, t, velocity,
            jnp.where(out.depth_stats_valid, out.scene_depth_mean,
                      depth_mean),
            tc.motion_decay,
        )
        return out.R, out.t, velocity, msd, sbi_cur, jnp.sum(out.found)

    key = jax.random.PRNGKey(0)
    # Warmup / compile (also primes the first SBI). The warmup must CHAIN
    # outputs back into inputs: chained inputs are device-committed arrays
    # whose layouts differ from the host-created first-call inputs, which
    # costs one extra compilation — pay it here, not in the timed loop.
    R, t = R0, t0
    velocity = jnp.zeros(6, jnp.float32)
    msd = jnp.asarray(0.0, jnp.float32)
    sbi = sbi_ops.make_sbi(
        kf_mod.make_frame(frames[0], config).pyramid[-1], tc.sbi_blur
    )
    for k in range(3):
        R, t, velocity, msd, sbi, _ = step(
            frames[k], slam_map, R, t, velocity, msd, sbi, key
        )
    np.asarray(R)  # d2h pull = unambiguous device sync (block_until_ready
    #                has been observed to return early on the tunnel
    #                backend, which once inflated this metric ~100x)

    # Time from the warmed chained state (resetting any input to a fresh
    # host array would introduce a third layout signature = a recompile).
    t0_ = time.perf_counter()
    for k in range(n_frames):
        R, t, velocity, msd, sbi, nf = step(
            frames[k], slam_map, R, t, velocity, msd, sbi, key
        )
    np.asarray(R)
    dt_ = time.perf_counter() - t0_
    assert int(nf) > 50, f"tracking lost during bench ({int(nf)} found)"
    fps_single = n_frames / dt_

    # Multi-stream serving: S independent camera streams batched through
    # the SAME full per-frame program with vmap on ONE chip (the
    # single-device form of parallel/replicated_tracking.py). Larger
    # batched matmuls/convs fill the MXU better than one stream, so the
    # AGGREGATE frame rate exceeds S-independent-processes throughput.
    S = 4
    mstep = jax.jit(jax.vmap(
        step, in_axes=(0, None, 0, 0, 0, 0, 0, 0)
    ))
    sR = jnp.broadcast_to(R0, (S, 3, 3))
    st_ = jnp.broadcast_to(t0, (S, 3))
    svel = jnp.zeros((S, 6), jnp.float32)
    smsd = jnp.zeros(S, jnp.float32)
    ssbi = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (S, *x.shape)), sbi
    )
    skey = jax.vmap(jax.random.PRNGKey)(jnp.arange(S))
    sframes = [
        jnp.stack([frames[(k + 7 * s) % n_frames] for s in range(S)])
        for k in range(n_frames)
    ]
    for k in range(3):
        sR, st_, svel, smsd, ssbi, _ = mstep(
            sframes[k], slam_map, sR, st_, svel, smsd, ssbi, skey
        )
    np.asarray(sR)
    t1_ = time.perf_counter()
    for k in range(n_frames):
        sR, st_, svel, smsd, ssbi, snf = mstep(
            sframes[k], slam_map, sR, st_, svel, smsd, ssbi, skey
        )
    np.asarray(sR)
    dt1 = time.perf_counter() - t1_
    assert int(jnp.min(snf)) > 50, f"a stream lost tracking ({snf})"
    fps_multi = S * n_frames / dt1
    return fps_single, S, fps_multi


def _full_slam_fps():
    """Tracking + mapping scheduler + keyframe adds at the REFERENCE's
    full frame size (800x480, jni/jni_part.cpp:41) and the DEFAULT
    capacities (4096 points, 64 keyframes), on a 120-frame synthetic
    sequence; timed on the second (warm) pass after a cold compile pass.

    Runs the SLAMSystem in pipelined mode (results lag one frame; zero
    blocking device pulls in steady-state tracking) — the deployment
    configuration for a host driving the chip over a link, and the
    honest counterpart of the reference's tracker thread, which also
    never blocks on its mapmaker."""
    from visualslam_android_tpu.config import SLAMConfig
    from visualslam_android_tpu.models import slam
    from visualslam_android_tpu.utils import datasets

    import jax

    rng = np.random.default_rng(11)
    n_frames = 120
    images, poses, centers, _, _ = datasets.make_synthetic_sequence(
        rng, n_frames=n_frames, size=(800, 480), px_per_m=240.0
    )
    # Pre-stage the frames on the device (as the tracking bench does):
    # camera ingest is input DMA, and a per-frame 1.5 MB host upload over
    # the remote-TPU tunnel would swamp the loop being measured.
    device = jax.devices()[0]
    images = [
        jax.device_put(np.asarray(im, np.float32), device) for im in images
    ]
    config = SLAMConfig()

    def run():
        # pipeline_depth=3: three frames in flight, so the ~30 ms d2h
        # stats round-trip of the remote-TPU link is fully hidden behind
        # later frames' dispatch+compute (results/decisions trail three
        # frames — the deployment throughput mode; depth 1 remains the
        # bit-parity-with-sync default elsewhere).
        sys_ = slam.SLAMSystem(config, seed=0, pipelined=True,
                               pipeline_depth=3)
        n_tracked = 0
        results = []
        for k, img in enumerate(images):
            if k in (0, 6):
                sys_.on_touch()
            results.append(sys_.track_frame(img))
        results.extend(sys_.flush())
        n_tracked = sum(
            1 for r in results
            if r.valid and r.phase == slam.PHASE_TRACKING and not r.lost
        )
        return n_tracked, int(sys_.slam_map.keyframes.count())

    run()  # cold pass: compiles every stage
    t0 = time.perf_counter()
    n_tracked, n_kf = run()  # warm pass
    wall = time.perf_counter() - t0
    assert n_tracked > 0.75 * n_frames, (
        f"full SLAM lost tracking ({n_tracked}/{n_frames})"
    )
    return n_frames / wall, n_tracked, n_kf


def main():
    import jax

    # Persistent compilation cache: the tracking program takes minutes to
    # compile over a remote TPU link; cached executables load in seconds.
    # The 10 s threshold keeps fast CPU-backend compiles (frame rendering)
    # OUT of the cache: reloading CPU AOT entries emits multi-KB
    # machine-feature stderr warnings that polluted the driver-captured
    # bench tail in earlier rounds (every big TPU program compiles far
    # longer than 10 s, so they all still cache).
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    fps, n_streams, fps_multi = _tracking_fps()

    extra = {
        f"multistream_{n_streams}x_aggregate_fps": round(fps_multi, 2),
    }
    try:
        slam_fps, n_tracked, n_kf = _full_slam_fps()
        extra.update({
            "full_slam_fps_800x480": round(slam_fps, 2),
            "full_slam_tracked_frames": n_tracked,
            "full_slam_keyframes": n_kf,
        })
    except Exception as e:  # noqa: BLE001 - report the primary metric
        extra["full_slam_error"] = str(e)[:200]

    print(
        json.dumps(
            {
                "metric": "tracking_fps_800x480_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
