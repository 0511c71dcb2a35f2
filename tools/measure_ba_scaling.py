"""Measure sharded-BA scaling on the virtual CPU mesh and account the
communication volume of the sharding design (VERDICT r1 item 4; BASELINE
"BA strong-scaling efficiency >= 70% at 4 hosts").

Writes artifacts/BA_SCALING_r2.json:

- wall-clock per LM step of the SAME fixed band-diagonal problem on 1/2/4/8
  virtual devices (CAVEAT recorded in the artifact: virtual CPU devices
  share one host's cores, so this measures sharding/dispatch overhead and
  correctness at scale, NOT real multi-chip speedup — only real ICI can
  show that);
- the itemized all-reduce payload per LM step
  (parallel/sharded_ba.comm_bytes_per_lm_step), plus a projected
  compute/comm ratio on v5e-class numbers so the >=70% target can be
  sanity-checked analytically.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python tools/measure_ba_scaling.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

    from visualslam_android_tpu.models import bundle, mapmaker  # noqa: E402
    from visualslam_android_tpu.parallel import sharded_ba  # noqa: E402
    from visualslam_android_tpu.utils import fixtures  # noqa: E402

    rng = np.random.default_rng(9)
    n_kf, n_pts, O = 256, 16384, 4
    config, sm, cam, adjust = fixtures.build_band_ba_map(
        rng, n_kf=n_kf, n_pts=n_pts, obs_per_pt=O,
        pose_perturb=0.02, point_perturb=0.03,
    )
    prob = mapmaker.build_ba_problem(sm, adjust, config)
    max_iters = 3

    band = config.bundle.band_halfwidth
    variants = {
        "band_chol": dict(solver="chol", assembly="band",
                          band_halfwidth=band, point_block=2048),
        "pcg": dict(solver="pcg", cg_iters=150, cg_tol=1e-6),
    }
    results = {v: {} for v in variants}
    devices = jax.devices()
    for name, kw in variants.items():
        for n_dev in (1, 2, 4, 8):
            mesh = sharded_ba.make_mesh(devices[:n_dev])

            def run():
                res = sharded_ba.sharded_bundle_adjust(
                    prob, cam, mesh, max_iters=max_iters, **kw
                )
                res.cam_t.block_until_ready()
                return res

            res = run()  # compile + warm
            t0 = time.perf_counter()
            n_rep = 3
            for _ in range(n_rep):
                res = run()
            wall = (time.perf_counter() - t0) / n_rep
            rms = float(bundle.reprojection_rms(
                prob, cam, res.cam_R, res.cam_t, res.points))
            results[name][n_dev] = {
                "wall_s_per_run": round(wall, 4),
                "wall_s_per_lm_step": round(wall / max_iters, 4),
                "final_rms_px": round(rms, 4),
                "accepted": int(res.accepted),
            }
            print(f"{name} {n_dev} dev: {wall:.3f}s/run rms={rms:.3f}")

        base = results[name][1]["wall_s_per_run"]
        for n_dev, r in results[name].items():
            r["speedup_vs_1dev"] = round(base / r["wall_s_per_run"], 3)
            r["efficiency"] = round(base / r["wall_s_per_run"] / n_dev, 3)

    # Analytic projection for real hardware, per LM step:
    #   T(D) = shard_flops/(D*peak) + repl_flops/peak
    #        + ring_bytes(D)/ici_bw + n_collectives * latency
    # shard terms: ~3k FLOPs per measurement (Jacobians, accumulators,
    # Schur band/pair blocks) — scales with D; repl terms: the dense
    # [6K,6K] Cholesky each device repeats ((6K)^3/3) — does NOT scale.
    PEAK = 50e12   # f32-effective FLOP/s per chip (v5e-class)
    BW = 45e9      # ICI per-direction bandwidth
    LAT = 1e-6     # per-collective launch latency
    FLOPS_PER_MEAS = 3000.0
    CG_FLOPS_PER_MEAS = 600.0

    def project(name, K, n_meas_, D):
        is_pcg = name == "pcg"
        c = sharded_ba.comm_bytes_per_lm_step(
            K, n_meas_ // O, O,
            solver="pcg" if is_pcg else "chol",
            assembly="scatter" if is_pcg else "band",
            band_halfwidth=band, cg_iters=150,
        )
        shard = n_meas_ * (
            FLOPS_PER_MEAS + (150 * CG_FLOPS_PER_MEAS if is_pcg else 0)
        )
        repl = 0 if is_pcg else (6 * K) ** 3 / 3
        n_coll = 4 + (150 if is_pcg else 1)
        t1 = (shard + repl) / PEAK
        tD = (
            shard / D / PEAK + repl / PEAK
            + c["total"] * 2 * (D - 1) / D / BW + n_coll * LAT
        )
        return t1 / tD, c

    comm = {}
    projection = {}
    for name in variants:
        for label, K, nm in (
            ("measured_problem", n_kf, n_pts * O),
            ("kitti_scale", 512, 1_200_000),
        ):
            for D in (4, 16):
                s, c = project(name, K, nm, D)
                projection[f"{name}_{label}_D{D}"] = {
                    "projected_speedup": round(s, 2),
                    "projected_efficiency": round(s / D, 3),
                }
            comm[f"{name}_{label}"] = c

    # Break-even: measurements needed for 70% efficiency at D=4 with the
    # band path (solve t1/tD = 0.7*D for shard FLOPs).
    D = 4
    _, c512 = project("band_chol", 512, 8, D)  # comm is meas-independent
    repl = (6 * 512) ** 3 / 3 / PEAK
    overhead = repl + c512["total"] * 2 * (D - 1) / D / BW + 5 * LAT
    # t1/tD = 0.7*D with t1 = S + repl, tD = S/D + overhead:
    # S + repl = 0.7*D*(S/D + overhead) -> S*(1-0.7) = 0.7*D*ovh - repl
    S = (0.7 * D * overhead - repl) / 0.3
    projection["break_even_meas_for_70pct_at_D4_band"] = int(
        S * PEAK / FLOPS_PER_MEAS
    )
    projection["note"] = (
        "f32 ~50 Tf/s, ICI ring ~45 GB/s, ~1 us/collective. The pcg "
        "variant is latency-bound on a mesh (150 tiny psums per LM "
        "step); the band variant psums one block-band and repeats the "
        "[6K,6K] Cholesky on every device — Amdahl on that replicated "
        "solve is what bounds global-BA strong scaling, so >=70% at 4 "
        "devices needs the per-device measurement work to dominate "
        "(break-even measurement count above). The mapping-stage "
        "kernels (epipolar [C,H,W] ZMSSD, refind) shard with ZERO "
        "per-step collectives and scale near-linearly at any size — "
        "on real maps they are where multi-chip wall-clock goes."
    )

    out = {
        "problem": {"keyframes": n_kf, "points": n_pts, "obs_per_point": O,
                    "lm_steps": max_iters,
                    "band_halfwidth": band},
        "virtual_cpu_mesh": results,
        "caveat": (
            "virtual CPU devices share one host's cores; these timings "
            "validate the sharded program at mesh sizes 1-8 and bound its "
            "dispatch/collective overhead, they cannot show real ICI "
            "speedup. The comm accounting + projection below is the "
            "hardware-free scaling evidence."
        ),
        "comm_bytes_per_lm_step": comm,
        "v5e_projection": projection,
    }
    os.makedirs("artifacts", exist_ok=True)
    path = os.path.join("artifacts", "BA_SCALING_r2.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
