"""Write a TUM-RGBD-format monocular dataset rendered from the synthetic
planar scene, with realistic sensor degradations (per-frame exposure
drift, defocus/motion blur, vignetting, sensor noise) that clean renders
don't exercise. Real TUM data cannot be fetched in this environment
(no egress); this is the stand-in for BASELINE configs 2-3 — the format,
loader, harness and ATE protocol are exactly the real-data path, only the
pixels are rendered.

Usage:
  python tools/make_tum_synthetic.py --out /tmp/tum_synth \
      --frames 120 --width 640 --height 480 --degrade
Then:
  python -m visualslam_android_tpu.run_slam --dataset tum \
      --root /tmp/tum_synth --frames 120 --json
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def degrade(img, k, rng, strength=1.0):
    """Per-frame exposure drift + defocus blur + vignette + sensor noise."""
    from scipy import ndimage  # available via baked-in scipy

    h, w = img.shape
    out = img.astype(np.float64)
    # Exposure drift: slow sinusoidal gain/offset (auto-exposure hunting).
    gain = 1.0 + 0.18 * strength * np.sin(0.13 * k)
    offset = 10.0 * strength * np.sin(0.07 * k + 1.0)
    out = out * gain + offset
    # Defocus / motion blur: sigma varies 0..1.1 across the sequence.
    sigma = strength * (0.55 + 0.55 * np.sin(0.21 * k + 2.0))
    if sigma > 0.05:
        out = ndimage.gaussian_filter(out, sigma)
    # Vignetting: ~12% corner falloff.
    ys, xs = np.mgrid[0:h, 0:w]
    r2 = (((xs - w / 2) / (w / 2)) ** 2 + ((ys - h / 2) / (h / 2)) ** 2)
    out = out * (1.0 - 0.12 * strength * r2)
    # Sensor noise.
    out = out + rng.normal(scale=2.0 * strength, size=out.shape)
    return np.clip(out, 0, 255)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--degrade", action="store_true")
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=33)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from visualslam_android_tpu.config import CameraConfig
    from visualslam_android_tpu.ops import camera as cam_ops
    from visualslam_android_tpu.ops import lie
    from visualslam_android_tpu.utils import synthetic

    rng = np.random.default_rng(args.seed)
    w, h = args.width, args.height
    cam = cam_ops.make_camera(CameraConfig().params(), w, h)
    scene = synthetic.make_planar_scene(
        rng, depth=4.0, tex_size=2048, px_per_m=300.0, n_blobs=1400
    )
    R0, t0 = synthetic.look_at_pose((0.0, 0.0, 0.0))

    os.makedirs(os.path.join(args.out, "rgb"), exist_ok=True)
    ts0 = 1305031100.0
    n = args.frames
    rgb_lines = ["# color images", "# synthetic", "# timestamp filename"]
    gt_lines = ["# ground truth trajectory",
                "# timestamp tx ty tz qx qy qz qw"]
    for k in range(n):
        s = k / max(n - 1, 1)
        mu = jnp.asarray(
            [
                0.8 * np.sin(3.14 * s),
                0.12 * np.sin(5.0 * s),
                0.10 * s,
                0.03 * np.sin(4.0 * s),
                0.20 * np.sin(3.14 * s),
                0.05 * np.sin(2.0 * s),
            ],
            jnp.float32,
        )
        dR, dt = lie.se3_exp(mu)
        R, t = lie.se3_mul(dR, dt, R0, t0)
        img = np.asarray(synthetic.render(scene, cam, R, t, (h, w)))
        if args.degrade:
            img = degrade(img, k, rng, args.strength)
        ts = ts0 + k / 30.0
        name = f"rgb/{ts:.6f}.png"
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(args.out, name)
        )
        rgb_lines.append(f"{ts:.6f} {name}")
        C = -np.asarray(R).T @ np.asarray(t)
        # Quaternion (x, y, z, w) of world-from-camera rotation; scipy
        # handles the trace<=0 branches (the look-at base pose is a 180
        # degree z-rotation where the naive trace formula divides by 0).
        from scipy.spatial.transform import Rotation

        qx, qy, qz, qw = Rotation.from_matrix(np.asarray(R).T).as_quat()
        gt_lines.append(
            f"{ts:.6f} {C[0]:.6f} {C[1]:.6f} {C[2]:.6f} "
            f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}"
        )
    with open(os.path.join(args.out, "rgb.txt"), "w") as f:
        f.write("\n".join(rgb_lines) + "\n")
    with open(os.path.join(args.out, "groundtruth.txt"), "w") as f:
        f.write("\n".join(gt_lines) + "\n")
    print(f"wrote {n} frames to {args.out}")


if __name__ == "__main__":
    main()
