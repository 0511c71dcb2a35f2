"""Image-op tests vs NumPy oracles (SURVEY.md §4.1: bilinear sample,
transform_image, Shi-Tomasi per jni/vision/ImageHandler.cpp)."""

import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.ops import image


def _texture(rng, h=64, w=80):
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    # Smooth it a bit so bilinear interpolation is meaningful.
    img = (
        img
        + np.roll(img, 1, 0)
        + np.roll(img, -1, 0)
        + np.roll(img, 1, 1)
        + np.roll(img, -1, 1)
    ) / 5.0
    return img


def _bilinear_oracle(img, x, y):
    lx, ly = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - lx, y - ly
    return (1 - fy) * ((1 - fx) * img[ly, lx] + fx * img[ly, lx + 1]) + fy * (
        (1 - fx) * img[ly + 1, lx] + fx * img[ly + 1, lx + 1]
    )


def test_half_sample_block_mean():
    img = jnp.arange(16.0).reshape(4, 4)
    out = image.half_sample(img)
    expected = np.array([[2.5, 4.5], [10.5, 12.5]])
    np.testing.assert_allclose(np.asarray(out), expected)


def test_pyramid_shapes():
    img = jnp.zeros((480, 800))
    levels = image.make_pyramid(img, 4)
    assert [l.shape for l in levels] == [
        (480, 800),
        (240, 400),
        (120, 200),
        (60, 100),
    ]


def test_bilinear_sample_matches_oracle(rng):
    img = _texture(rng)
    pts = np.stack(
        [rng.uniform(1, 78, size=50), rng.uniform(1, 62, size=50)], axis=-1
    ).astype(np.float32)
    got = np.asarray(image.bilinear_sample(jnp.asarray(img), jnp.asarray(pts)))
    want = np.array([_bilinear_oracle(img, x, y) for x, y in pts])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bilinear_sample_integer_positions(rng):
    img = _texture(rng)
    got = float(
        image.bilinear_sample(jnp.asarray(img), jnp.asarray([7.0, 11.0]))
    )
    np.testing.assert_allclose(got, img[11, 7], rtol=1e-6)


def test_affine_warp_identity_recovers_patch(rng):
    img = _texture(rng)
    M = jnp.eye(2)
    patch, n_out = image.affine_warp_patch(
        jnp.asarray(img), M, jnp.asarray([20.0, 30.0]), 4
    )
    np.testing.assert_allclose(
        np.asarray(patch), img[26:35, 16:25], rtol=1e-5
    )
    assert int(n_out) == 0


def test_affine_warp_rotation_90(rng):
    img = _texture(rng)
    # 90-degree rotation: out(i,j) samples img(center + R @ (j-h, i-h)).
    R = jnp.asarray([[0.0, -1.0], [1.0, 0.0]])
    patch, _ = image.affine_warp_patch(jnp.asarray(img), R, jnp.asarray([30.0, 30.0]), 3)
    ident, _ = image.affine_warp_patch(
        jnp.asarray(img), jnp.eye(2), jnp.asarray([30.0, 30.0]), 3
    )
    # patch(i,j) = ident(j, 2h-i), i.e. a 90-degree rotation of the patch.
    np.testing.assert_allclose(
        np.asarray(patch), np.rot90(np.asarray(ident), k=1), atol=1e-4
    )


def test_affine_warp_out_of_image_counted():
    img = jnp.ones((32, 32))
    patch, n_out = image.affine_warp_patch(
        img, jnp.eye(2), jnp.asarray([1.0, 1.0]), 4, default=-7.0
    )
    assert int(n_out) > 0
    assert np.any(np.asarray(patch) == -7.0)


def _shi_tomasi_oracle(img, half, px, py):
    # Literal transcription of FindShiTomasiScoreAtPoint semantics
    # (ImageHandler.cpp:124-155) as a float oracle.
    xx = yy = xy = 0.0
    for cy in range(py - half, py + half + 1):
        for cx in range(px - half, px + half + 1):
            dx = float(img[cy, cx + 1]) - float(img[cy, cx - 1])
            dy = float(img[cy + 1, cx]) - float(img[cy - 1, cx])
            xx += dx * dx
            yy += dy * dy
            xy += dx * dy
    n = (2 * half + 1) ** 2
    xx, yy, xy = xx / (2 * n), yy / (2 * n), xy / (2 * n)
    return 0.5 * (xx + yy - np.sqrt((xx + yy) ** 2 - 4 * (xx * yy - xy * xy)))


def test_shi_tomasi_matches_oracle(rng):
    img = _texture(rng)
    smap = np.asarray(image.shi_tomasi_dense(jnp.asarray(img), 3))
    for px, py in [(10, 10), (40, 30), (70, 50)]:
        want = _shi_tomasi_oracle(img, 3, px, py)
        np.testing.assert_allclose(smap[py, px], want, rtol=1e-4, atol=1e-3)


def test_shi_tomasi_corner_beats_flat():
    img = np.zeros((40, 40), np.float32)
    img[20:, 20:] = 200.0  # corner at (20, 20)
    smap = np.asarray(image.shi_tomasi_dense(jnp.asarray(img), 3))
    assert smap[20, 20] > 70.0
    assert smap[10, 10] == 0.0
    assert smap[20, 20] > smap[10, 20] + 50  # edge scores much lower


def test_gaussian_blur_preserves_mean(rng):
    img = jnp.asarray(_texture(rng))
    out = image.gaussian_blur(img, 1.5)
    np.testing.assert_allclose(
        float(out.mean()), float(img.mean()), rtol=5e-3
    )
    assert float(jnp.std(out)) < float(jnp.std(img))


def test_extract_patch():
    img = jnp.arange(100.0).reshape(10, 10)
    p = image.extract_patch(img, jnp.asarray([5, 4]), 1)
    np.testing.assert_allclose(np.asarray(p), np.asarray(img[3:6, 4:7]))


def test_in_image_with_border():
    ok = image.in_image_with_border(
        (480, 800),
        jnp.asarray([[10.0, 10.0], [9.0, 10.0], [790.0, 470.0], [789.0, 469.0]]),
        10,
    )
    # Bounds are strict on the high side (px < cols - border).
    assert list(np.asarray(ok)) == [True, False, False, True]


def test_extract_regions_contains_slab(rng):
    import jax.numpy as jnp
    from visualslam_android_tpu.ops import image as img_ops

    H, W, N, R = 97, 133, 64, 16
    img = jnp.asarray(rng.random((H, W)).astype(np.float32))
    cx = rng.integers(0, W, N)
    cy = rng.integers(0, H, N)
    origin = jnp.asarray(np.stack([cx - R, cy - R], -1), jnp.int32)
    slab = 2 * R + 1
    regions, base = img_ops.extract_regions(img, None, origin, slab)
    regions, base = np.asarray(regions), np.asarray(base)
    imgn = np.asarray(img)
    for n in range(N):
        for (dx, dy) in [(-R, -R), (R, R), (0, 0), (R, -R)]:
            x, y = int(cx[n] + dx), int(cy[n] + dy)
            if 0 <= x < W and 0 <= y < H:
                rx, ry = x - base[n, 0], y - base[n, 1]
                assert 0 <= rx < regions.shape[2]
                assert 0 <= ry < regions.shape[1]
                assert regions[n, ry, rx] == imgn[y, x]


def test_extract_regions_stack_kf_index(rng):
    import jax.numpy as jnp
    from visualslam_android_tpu.ops import image as img_ops

    K, H, W, N, R = 3, 64, 96, 32, 11
    imgs = jnp.asarray(rng.random((K, H, W)).astype(np.float32))
    kf = jnp.asarray(rng.integers(0, K, N), jnp.int32)
    cx = rng.integers(R, W - R, N)
    cy = rng.integers(R, H - R, N)
    origin = jnp.asarray(np.stack([cx - R, cy - R], -1), jnp.int32)
    regions, base = img_ops.extract_regions(imgs, kf, origin, 2 * R + 1)
    regions, base = np.asarray(regions), np.asarray(base)
    imgsn = np.asarray(imgs)
    for n in range(N):
        x, y = int(cx[n]), int(cy[n])
        assert regions[n, y - base[n, 1], x - base[n, 0]] == \
            imgsn[int(kf[n]), y, x]


def test_separable_bilinear_matches_bilinear_sample(rng):
    import jax.numpy as jnp
    from visualslam_android_tpu.ops import image as img_ops

    S, N, P = 32, 16, 25
    slabs = jnp.asarray(rng.random((N, S, S)).astype(np.float32) * 255)
    rel = jnp.asarray(rng.random((N, P, 2)).astype(np.float32) * (S - 1.01))
    out = np.asarray(img_ops.separable_bilinear(slabs, rel))
    for n in range(N):
        ref = np.asarray(img_ops.bilinear_sample(slabs[n], rel[n]))
        np.testing.assert_allclose(out[n], ref, rtol=1e-5, atol=1e-3)


def test_inv3x3_matches_linalg(rng):
    import jax.numpy as jnp
    from visualslam_android_tpu.ops import wls as wls_ops

    A = rng.random((40, 3, 3)).astype(np.float32) + \
        3 * np.eye(3, dtype=np.float32)
    got = np.asarray(wls_ops.inv3x3(jnp.asarray(A)))
    want = np.linalg.inv(A)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
