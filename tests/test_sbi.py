"""SmallBlurryImage tests: template construction, ESM alignment recovers
known SE(2) warps, SE3 lift produces a consistent rotation (SURVEY.md §4.1,
jni/SmallBlurryImage.cc semantics)."""

import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.config import CameraConfig
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import image as img_ops
from visualslam_android_tpu.ops import lie, sbi


def _level3(rng, h=60, w=100):
    """Smooth random level-3 image in [0,255]."""
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    return np.asarray(img_ops.gaussian_blur(jnp.asarray(img), 2.0))


def test_template_shape_and_zero_mean(rng):
    lvl3 = _level3(rng)
    s = sbi.make_sbi(jnp.asarray(lvl3))
    assert s.template.shape == (30, 50)
    assert abs(float(s.template.mean())) < 1.0
    assert s.jacs.shape == (30, 50, 2)
    # Border gradient rows are zero (MakeJacs border 1).
    assert float(jnp.abs(s.jacs[0]).max()) == 0.0
    assert float(jnp.abs(s.jacs[:, -1]).max()) == 0.0


def test_zmssd_identity_and_batch(rng):
    lvl3 = _level3(rng)
    s = sbi.make_sbi(jnp.asarray(lvl3))
    assert float(sbi.zmssd(s.template, s.template)) == 0.0
    other = sbi.make_sbi(jnp.asarray(_level3(rng)))
    batch = jnp.stack([s.template, other.template])
    scores = sbi.zmssd(batch, s.template[None])
    assert float(scores[0]) == 0.0 and float(scores[1]) > 0.0


def _shifted(lvl3, dx, dy):
    """Translate an image by (dx, dy) with bilinear resampling."""
    h, w = lvl3.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    pts = jnp.stack([jnp.asarray(xs + dx), jnp.asarray(ys + dy)], axis=-1)
    return np.asarray(img_ops.bilinear_sample(jnp.asarray(lvl3), pts))


def test_esm_recovers_translation(rng):
    lvl3 = _level3(rng)
    target = sbi.make_sbi(jnp.asarray(lvl3))
    # Current frame shifted by (8, 4) level-3 pixels = (4, 2) SBI pixels.
    cur = sbi.make_sbi(jnp.asarray(_shifted(lvl3, 8.0, 4.0)))
    se2, score = sbi.esm_align(cur.template, target, n_iterations=10)
    se2 = np.asarray(se2)
    # se2 is the C-to-C warp: warped(p) = cur(se2(p)). cur is the scene
    # shifted by +(4, 2) SBI px, so the aligning warp is (-4, -2).
    np.testing.assert_allclose(se2[0], -4.0, atol=0.6)
    np.testing.assert_allclose(se2[1], -2.0, atol=0.6)
    assert abs(se2[2]) < 0.03
    # Aligning must beat the unaligned SSD substantially.
    assert float(score) < 0.5 * float(sbi.zmssd(cur.template, target.template))


def test_esm_recovers_rotation(rng):
    lvl3 = _level3(rng)
    target = sbi.make_sbi(jnp.asarray(lvl3))
    # Rotate the level-3 image by 0.08 rad about its center.
    theta = 0.08
    h, w = lvl3.shape
    c = np.array([w / 2, h / 2], np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    R = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        np.float32,
    )
    grid = np.stack([xs - c[0], ys - c[1]], -1) @ R.T + c
    rotated = np.asarray(
        img_ops.bilinear_sample(jnp.asarray(lvl3), jnp.asarray(grid))
    )
    cur = sbi.make_sbi(jnp.asarray(rotated))
    se2, _ = sbi.esm_align(cur.template, target, n_iterations=10)
    # C-to-C warp rotates by -theta to undo the image rotation.
    np.testing.assert_allclose(float(se2[2]), -theta, atol=0.02)


def test_esm_identity_is_stable(rng):
    lvl3 = _level3(rng)
    target = sbi.make_sbi(jnp.asarray(lvl3))
    se2, score = sbi.esm_align(target.template, target, n_iterations=6)
    assert float(jnp.abs(se2).max()) < 0.05
    assert float(score) < 1e-2 * float(jnp.sum(target.template**2))


def test_se3_from_se2_rotation_consistency():
    cam = cam_ops.make_camera(CameraConfig().params(), 800, 480)
    # A pure SBI-plane rotation should lift to a roll about the optical axis.
    se2 = jnp.asarray([0.0, 0.0, 0.1], jnp.float32)
    R, t = sbi.se3_from_se2(se2, cam, (30, 50))
    w = np.asarray(lie.so3_ln(R))
    assert np.linalg.norm(t) == 0.0
    assert abs(w[2]) > 0.5 * np.linalg.norm(w)  # dominantly roll
    np.testing.assert_allclose(abs(w[2]), 0.1, atol=0.05)
    # Pure translation lifts to a pan/tilt (x/y rotation).
    se2 = jnp.asarray([3.0, 0.0, 0.0], jnp.float32)
    R, _ = sbi.se3_from_se2(se2, cam, (30, 50))
    w = np.asarray(lie.so3_ln(R))
    assert abs(w[1]) > abs(w[2])  # pan dominates roll


def test_score_against_all(rng):
    lvl3s = [_level3(rng) for _ in range(4)]
    sbis = [sbi.make_sbi(jnp.asarray(l)) for l in lvl3s]
    templates = jnp.stack([s.template for s in sbis] + [jnp.zeros((30, 50))])
    valid = jnp.asarray([True, True, True, True, False])
    scores = sbi.score_against_all(sbis[2].template, templates, valid)
    assert int(jnp.argmin(scores)) == 2
    assert np.isinf(float(scores[4]))
