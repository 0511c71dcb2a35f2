"""Generate the tiny committed TUM-format and KITTI-format dataset
fixtures under tests/data/ (loader tests need real on-disk layouts; the
full datasets cannot be shipped). Deterministic; rerun to regenerate."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from visualslam_android_tpu.config import CameraConfig
    from visualslam_android_tpu.ops import camera as cam_ops
    from visualslam_android_tpu.ops import lie
    from visualslam_android_tpu.utils import synthetic

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data")
    rng = np.random.default_rng(123)
    w, h = 64, 48
    cam = cam_ops.make_camera(CameraConfig().params(), w, h)
    scene = synthetic.make_planar_scene(rng, depth=4.0, px_per_m=60.0)
    R0, t0 = synthetic.look_at_pose((0.0, 0.0, 0.0))

    def pose(k):
        mu = jnp.asarray([0.08 * k, 0.0, 0.01 * k, 0.0, 0.02 * k, 0.0],
                         jnp.float32)
        dR, dt = lie.se3_exp(mu)
        return lie.se3_mul(dR, dt, R0, t0)

    n = 6
    imgs, centers = [], []
    for k in range(n):
        R, t = pose(k)
        img = np.asarray(synthetic.render(scene, cam, R, t, (h, w)))
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
        centers.append(-np.asarray(R).T @ np.asarray(t))

    # ---- TUM layout: rgb.txt + rgb/*.png + groundtruth.txt ----
    tum = os.path.join(root, "tum_tiny")
    os.makedirs(os.path.join(tum, "rgb"), exist_ok=True)
    ts0 = 1305031100.0
    with open(os.path.join(tum, "rgb.txt"), "w") as f:
        f.write("# color images\n# file: 'tum_tiny'\n# timestamp filename\n")
        for k in range(n):
            ts = ts0 + k / 30.0
            name = f"rgb/{ts:.6f}.png"
            Image.fromarray(imgs[k]).save(os.path.join(tum, name))
            f.write(f"{ts:.6f} {name}\n")
    # Groundtruth at 100 Hz with an offset so nearest-timestamp
    # association is actually exercised (gt NOT at frame timestamps).
    with open(os.path.join(tum, "groundtruth.txt"), "w") as f:
        f.write("# ground truth trajectory\n# timestamp tx ty tz qx qy qz qw\n")
        for j in range(int(n / 30.0 * 100) + 3):
            ts = ts0 - 0.004 + j / 100.0
            k = min(int(round((ts - ts0) * 30.0)), n - 1)
            c = centers[max(k, 0)]
            f.write(
                f"{ts:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} 0 0 0 1\n"
            )

    # ---- KITTI layout: sequences/00/image_0/*.png + poses/00.txt ----
    kit = os.path.join(root, "kitti_tiny")
    os.makedirs(os.path.join(kit, "sequences", "00", "image_0"),
                exist_ok=True)
    os.makedirs(os.path.join(kit, "poses"), exist_ok=True)
    with open(os.path.join(kit, "poses", "00.txt"), "w") as f:
        for k in range(n):
            Image.fromarray(imgs[k]).save(
                os.path.join(kit, "sequences", "00", "image_0",
                             f"{k:06d}.png")
            )
            R, t = pose(k)
            Rw = np.asarray(R).T          # pose files are world-from-cam
            tw = -Rw @ np.asarray(t)
            P = np.concatenate([Rw, tw[:, None]], axis=1).reshape(-1)
            f.write(" ".join(f"{v:.9g}" for v in P) + "\n")

    print("fixtures written under", root)


if __name__ == "__main__":
    main()
