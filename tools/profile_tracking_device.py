"""Single-chip device-time + FLOP-utilization profile of the benched
tracking step (VERDICT r3 item 5): time each stage of the per-frame hot
path as its own jitted program on the live backend, pair the wall-clock
with XLA's own cost analysis (compiled.cost_analysis: flops / bytes
accessed), and report achieved FLOP/s and HBM bandwidth per stage.

Stages (jni/Tracker.cc:76-146 structure):
  frontend   pyramid build + 4-level FAST masks (MakeKeyFrame_Lite)
  sbi        SmallBlurryImage build + 6-iteration ESM rotation prior
  track_map  PVS + warped templates + coarse/fine ZMSSD + subpixel + GN
  full_step  the fused bench step (all of the above in ONE program)

Writes artifacts/PROFILE_TRACKING_DEVICE_r4.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e peaks for the utilization denominators.
PEAK_BF16 = 197e12
PEAK_HBM = 819e9  # bytes/s


def cost(compiled):
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {
            "flops": float(c.get("flops", 0.0)),
            "bytes_accessed": float(c.get("bytes accessed", 0.0)),
        }
    except Exception as e:  # noqa: BLE001 - cost analysis is best-effort
        return {"error": str(e)[:120]}


def timed(fn_compiled, args, n=50):
    out = fn_compiled(*args)
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_compiled(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )

    from visualslam_android_tpu.models import keyframe as kf_mod
    from visualslam_android_tpu.models import tracker
    from visualslam_android_tpu.ops import lie
    from visualslam_android_tpu.ops import sbi as sbi_ops
    from visualslam_android_tpu.utils import fixtures, synthetic

    rng = np.random.default_rng(7)
    config = fixtures.full_config()
    tc = config.tracker
    slam_map, cam, scene, (R0, t0), n_pts = fixtures.build_fixed_map(
        config, rng, per_level=(900, 500, 300, 120), px_per_m=240.0
    )
    shape = (tc.height, tc.width)
    mu = jnp.asarray([0.02, -0.01, 0.01, 0.004, 0.01, -0.002], jnp.float32)
    dR, dt = lie.se3_exp(mu)
    R1, t1 = lie.se3_mul(dR, dt, R0, t0)
    img = synthetic.render(scene, cam, R1, t1, shape)
    key = jax.random.PRNGKey(0)

    frame = kf_mod.make_frame(img, config)
    sbi_prev = sbi_ops.make_sbi(frame.pyramid[-1], tc.sbi_blur)

    stages = {}

    def stage(name, fn, args):
        jitted = jax.jit(fn)
        compiled = jitted.lower(*args).compile()
        ms = timed(compiled, args) * 1e3
        c = cost(compiled)
        row = {"ms": round(ms, 3), **c}
        if "flops" in c and ms > 0:
            row["achieved_tflops"] = round(c["flops"] / (ms * 1e-3) / 1e12, 3)
            row["mfu_vs_bf16_peak"] = round(
                c["flops"] / (ms * 1e-3) / PEAK_BF16, 4
            )
            row["hbm_gbps"] = round(
                c["bytes_accessed"] / (ms * 1e-3) / 1e9, 1
            )
            row["hbm_util"] = round(
                c["bytes_accessed"] / (ms * 1e-3) / PEAK_HBM, 3
            )
        stages[name] = row
        print(f"{name:<10} {row}", flush=True)
        return jitted

    stage("frontend", lambda im: kf_mod.make_frame(im, config), (img,))
    stage(
        "sbi",
        lambda fr, prev: tracker.calc_sbi_rotation(
            sbi_ops.make_sbi(fr.pyramid[-1], tc.sbi_blur).template,
            prev, cam, tc.sbi_esm_iters,
        ),
        (frame, sbi_prev),
    )
    stage(
        "track_map",
        lambda fr, sm, R, t, k: tracker.track_map(
            fr, sm, cam, R, t, jnp.asarray(0.0, jnp.float32), k, config
        ).t,
        (frame, slam_map, R0, t0, key),
    )

    def full_step(im, sm, R, t, vel, msd, prev, k):
        fr = kf_mod.make_frame(im, config)
        sbi_cur = sbi_ops.make_sbi(fr.pyramid[-1], tc.sbi_blur)
        rot = tracker.calc_sbi_rotation(
            sbi_cur.template, prev, cam, tc.sbi_esm_iters
        )
        R1_, t1_ = tracker.apply_motion_model(
            R, t, vel, rot, jnp.asarray(True)
        )
        out = tracker.track_map(fr, sm, cam, R1_, t1_, msd, k, config)
        vel2, _, msd2 = tracker.update_motion_model(
            out.R, out.t, R, t, vel, out.scene_depth_mean, tc.motion_decay
        )
        return out.R, out.t, vel2, msd2, sbi_cur.template

    stage(
        "full_step", full_step,
        (img, slam_map, R0, t0, jnp.zeros(6, jnp.float32),
         jnp.asarray(0.0, jnp.float32), sbi_prev, key),
    )

    out = {
        "config": f"{tc.width}x{tc.height}, {n_pts} map points, "
                  f"{int(np.asarray(slam_map.keyframes.count()))} KFs",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "peaks": {"bf16_tflops": PEAK_BF16 / 1e12,
                  "hbm_gbps": PEAK_HBM / 1e9},
        "note": (
            "flops/bytes from XLA cost_analysis of each compiled stage; "
            "the hot path is search/gather-shaped (grouped convs, window "
            "sums, slab resampling), so HBM utilization, not MXU MFU, is "
            "the binding roofline for most stages."
        ),
        "stages": stages,
    }
    os.makedirs("artifacts", exist_ok=True)
    path = "artifacts/PROFILE_TRACKING_DEVICE_r4.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
