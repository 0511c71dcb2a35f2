"""Dataset loaders: TUM-RGBD (mono) and KITTI odometry (mono), plus the
synthetic sequence generator used when no dataset is on disk.

The reference consumes only a live Android camera (SURVEY.md §2 #1);
BASELINE.json's configs ladder over TUM fr1_desk / fr2_xyz and KITTI
seq 00, so these loaders provide that harness. Images are returned as
float32 grayscale in [0, 255] at the configured size.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Sequence:
    name: str
    frames: List[str]                  # image paths (or None for synthetic)
    timestamps: np.ndarray             # [T]
    gt_positions: Optional[np.ndarray]  # [T, 3] or None
    gt_quaternions: Optional[np.ndarray]  # [T, 4] (x, y, z, w) or None
    size: Tuple[int, int]              # (width, height)

    def __len__(self):
        return len(self.frames)


def _imread_gray(path, size=None):
    from PIL import Image

    img = Image.open(path).convert("L")
    if size is not None and img.size != size:
        img = img.resize(size, Image.BILINEAR)
    return np.asarray(img, np.float32)


def load_tum(root: str, size=(640, 480), max_frames=None) -> Sequence:
    """TUM-RGBD mono: reads rgb.txt + groundtruth.txt, associating by
    nearest timestamp."""
    rgb_file = os.path.join(root, "rgb.txt")
    entries = []
    with open(rgb_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts, rel = line.split()[:2]
            entries.append((float(ts), os.path.join(root, rel)))
    if max_frames:
        entries = entries[:max_frames]
    ts = np.asarray([e[0] for e in entries])
    frames = [e[1] for e in entries]

    gt_pos = gt_quat = None
    gt_file = os.path.join(root, "groundtruth.txt")
    if os.path.exists(gt_file):
        raw = []
        with open(gt_file) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                vals = [float(v) for v in line.split()]
                raw.append(vals)
        raw = np.asarray(raw)
        # Nearest-timestamp association (TUM protocol): searchsorted gives
        # the first gt >= ts; compare with its left neighbor and take the
        # closer one.
        hi = np.clip(np.searchsorted(raw[:, 0], ts), 0, len(raw) - 1)
        lo = np.clip(hi - 1, 0, len(raw) - 1)
        idx = np.where(
            np.abs(raw[lo, 0] - ts) <= np.abs(raw[hi, 0] - ts), lo, hi
        )
        gt_pos = raw[idx, 1:4]
        gt_quat = raw[idx, 4:8]
    return Sequence(
        name=os.path.basename(root.rstrip("/")),
        frames=frames, timestamps=ts,
        gt_positions=gt_pos, gt_quaternions=gt_quat, size=size,
    )


def load_kitti(root: str, sequence="00", size=(620, 188),
               max_frames=None) -> Sequence:
    """KITTI odometry mono (image_0), poses from poses/<seq>.txt."""
    img_dir = os.path.join(root, "sequences", sequence, "image_0")
    frames = sorted(
        os.path.join(img_dir, f)
        for f in os.listdir(img_dir)
        if f.endswith(".png")
    )
    if max_frames:
        frames = frames[:max_frames]
    ts = np.arange(len(frames), dtype=np.float64) * 0.1
    gt_pos = None
    pose_file = os.path.join(root, "poses", f"{sequence}.txt")
    if os.path.exists(pose_file):
        P = np.loadtxt(pose_file).reshape(-1, 3, 4)[: len(frames)]
        gt_pos = P[:, :, 3]
    return Sequence(
        name=f"kitti-{sequence}", frames=frames, timestamps=ts,
        gt_positions=gt_pos, gt_quaternions=None, size=size,
    )


def iter_images(seq: Sequence, use_native: bool = True
                ) -> Iterator[np.ndarray]:
    """Yield float32 grayscale frames at seq.size. Uses the native
    prefetch pipeline (native/vstpu_runtime.cpp FramePipeline: worker
    threads decode+resize ahead of the consumer, the role of the
    reference's camera thread) when the library is built; falls back to
    synchronous PIL decoding otherwise."""
    if use_native:
        from visualslam_android_tpu import native_runtime

        if native_runtime.available():
            w, h = seq.size
            try:
                with native_runtime.FramePipeline(
                    seq.frames, w, h
                ) as pipe:
                    for _, img in pipe:
                        yield img.astype(np.float32)
                return
            except native_runtime.NativeRuntimeUnavailable:
                pass
    for path in seq.frames:
        yield _imread_gray(path, seq.size)


def make_synthetic_sequence(rng, n_frames=60, size=(320, 240), depth=4.0,
                            motion_scale=1.0, px_per_m=140.0):
    """Rendered planar sequence with ground truth (used when no dataset
    exists on disk; drives BASELINE config-1-style runs). px_per_m sets
    the scene texture density — raise it for reference-scale (800x480)
    frames so per-pixel gradients stay strong."""
    import jax.numpy as jnp

    from visualslam_android_tpu.config import CameraConfig
    from visualslam_android_tpu.ops import camera as cam_ops
    from visualslam_android_tpu.ops import lie
    from visualslam_android_tpu.utils import synthetic

    cam = cam_ops.make_camera(CameraConfig().params(), size[0], size[1])
    scene = synthetic.make_planar_scene(rng, depth=depth, px_per_m=px_per_m)
    R0, t0 = synthetic.look_at_pose((0.0, 0.0, 0.0), target=(0, 0, depth))

    images, poses = [], []
    for k in range(n_frames):
        s = k / max(n_frames - 1, 1)
        mu = jnp.asarray(
            [
                motion_scale * 0.6 * s,
                motion_scale * 0.1 * np.sin(2.5 * s),
                motion_scale * 0.08 * s,
                0.0,
                motion_scale * 0.14 * s,
                motion_scale * 0.04 * np.sin(3 * s),
            ],
            jnp.float32,
        )
        dR, dt = lie.se3_exp(mu)
        Rk, tk = lie.se3_mul(dR, dt, R0, t0)
        images.append(
            np.asarray(synthetic.render(scene, cam, Rk, tk,
                                        (size[1], size[0])))
        )
        poses.append((np.asarray(Rk), np.asarray(tk)))
    centers = np.stack([-R.T @ t for R, t in poses])
    return images, poses, centers, cam, scene
