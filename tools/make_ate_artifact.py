"""Produce the end-to-end ATE artifact (VERDICT r1 item 1a; BASELINE
configs 2-3). Real TUM downloads are impossible here (zero egress), so the
stand-in is the committed TUM-format synthetic generator
(tools/make_tum_synthetic.py): the dataset format, loader, bootstrap
protocol, tracker/mapmaker pipeline and similarity-aligned ATE evaluation
are exactly the real-data path — only the pixels are rendered (with
sensor degradations: exposure drift, defocus blur, vignette, noise).

Runs `run_slam --dataset tum --json` on clean and degraded sequences at
BOTH 640x480 (TUM-native) and 800x480 (the reference's own frame size,
jni/jni_part.cpp:41) and writes artifacts/ATE_r5.json with the full
reports — regenerated on current code every round so the accuracy story
never trails the search/solver rewrites (VERDICT r4 item 4).

Run: python tools/make_ate_artifact.py [--frames 120] [--platform cpu|tpu]
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env=None, parse_json=False):
    print("+", " ".join(cmd), flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    out = subprocess.run(
        cmd, cwd=ROOT, env=e, capture_output=True, text=True, timeout=3600
    )
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-4000:] + out.stderr[-4000:])
        raise SystemExit(f"command failed: {cmd}")
    if not parse_json:
        return None
    # run_slam prints the JSON report as the last stdout line.
    last = [ln for ln in out.stdout.strip().splitlines() if ln.strip()][-1]
    return json.loads(last)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--platform", default=None,
                   help="forwarded to run_slam --platform")
    p.add_argument("--out", default="artifacts/ATE_r5.json")
    args = p.parse_args()

    py = sys.executable
    reports = {}
    for w, h in ((640, 480), (800, 480)):
        for variant, gen_extra in (
            ("clean", []),
            ("degraded", ["--degrade", "--strength", "1.0"]),
        ):
            root = f"/tmp/tum_synth_{variant}_{w}x{h}"
            if not os.path.exists(os.path.join(root, "rgb.txt")):
                run([py, "tools/make_tum_synthetic.py", "--out", root,
                     "--frames", str(args.frames),
                     "--width", str(w), "--height", str(h)] + gen_extra)
            cmd = [py, "-m", "visualslam_android_tpu.run_slam",
                   "--dataset", "tum", "--root", root,
                   "--frames", str(args.frames), "--json"]
            if args.platform:
                cmd += ["--platform", args.platform]
            reports[f"{variant}_{w}x{h}"] = run(cmd, parse_json=True)

    out = {
        "protocol": (
            "TUM-RGBD-format monocular sequences (640x480, 30 fps "
            "timestamps, groundtruth.txt) rendered from the synthetic "
            "planar scene because real TUM data cannot be fetched "
            "(no egress). run_slam drives the FULL pipeline end to end: "
            "dataset loader + nearest-timestamp GT association, scripted "
            "bootstrap presses, tracking, mapmaker scheduler (KF adds, "
            "epipolar growth, refind, local+global BA), relocalization; "
            "ate_rmse is similarity-aligned RMSE vs ground truth "
            "(utils/ate.py)."
        ),
        "sequences": reports,
    }
    os.makedirs(os.path.join(ROOT, "artifacts"), exist_ok=True)
    path = os.path.join(ROOT, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    print(json.dumps(reports, indent=1))


if __name__ == "__main__":
    main()
