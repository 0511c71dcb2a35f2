"""FAST detector tests vs a brute-force NumPy oracle (SURVEY.md §4.1:
corner parity on synthetic images, per jni/vision/cvfast.cpp semantics)."""

import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.ops import fast


def _fast_oracle(img, threshold, arc=10):
    """Brute-force segment test + old-style score."""
    H, W = img.shape
    ring = fast.RING_OFFSETS
    mask = np.zeros((H, W), bool)
    score = np.zeros((H, W), np.float32)
    for y in range(3, H - 3):
        for x in range(3, W - 3):
            c = img[y, x]
            vals = np.array([img[y + dy, x + dx] for dx, dy in ring])
            bright = vals > c + threshold
            dark = vals < c - threshold
            for flags in (bright, dark):
                f2 = np.concatenate([flags, flags])
                run = 0
                best = 0
                for v in f2:
                    run = run + 1 if v else 0
                    best = max(best, run)
                if best >= arc:
                    mask[y, x] = True
            sp = np.maximum(vals - (c + threshold), 0).sum()
            sn = np.maximum((c - threshold) - vals, 0).sum()
            score[y, x] = max(sp, sn)
    return mask, score


def _synthetic_corners(rng, h=48, w=64):
    """Blocks image with clear corners, plus mild noise."""
    img = np.full((h, w), 60.0, np.float32)
    img[10:20, 10:25] = 200.0
    img[28:40, 30:50] = 10.0
    img[5:12, 40:55] = 140.0
    img += rng.uniform(0, 2, size=(h, w)).astype(np.float32)
    return img


def test_detect_matches_oracle(rng):
    img = _synthetic_corners(rng)
    mask, score = fast.detect(jnp.asarray(img), 10)
    o_mask, o_score = _fast_oracle(img, 10)
    np.testing.assert_array_equal(np.asarray(mask), o_mask)
    # Scores must agree wherever a corner was detected.
    got_s = np.asarray(score)[o_mask]
    np.testing.assert_allclose(got_s, o_score[o_mask], rtol=1e-5)


def test_detect_fast9_variant(rng):
    img = _synthetic_corners(rng)
    mask9, _ = fast.detect(jnp.asarray(img), 10, arc_length=9)
    mask10, _ = fast.detect(jnp.asarray(img), 10, arc_length=10)
    # FAST-9 is strictly more permissive than FAST-10.
    assert np.all(np.asarray(mask10) <= np.asarray(mask9))
    assert np.asarray(mask9).sum() >= np.asarray(mask10).sum()


def test_flat_image_no_corners():
    img = jnp.full((32, 32), 100.0)
    mask, _ = fast.detect(img, 10)
    assert int(mask.sum()) == 0


def test_border_excluded(rng):
    img = jnp.asarray(rng.uniform(0, 255, size=(32, 32)).astype(np.float32))
    mask, _ = fast.detect(img, 5)
    m = np.asarray(mask)
    assert not m[:3, :].any() and not m[-3:, :].any()
    assert not m[:, :3].any() and not m[:, -3:].any()


def test_nonmax_keeps_local_maxima(rng):
    img = _synthetic_corners(rng)
    mask, score = fast.detect(jnp.asarray(img), 10)
    kept = fast.nonmax_3x3(mask, score)
    m, k = np.asarray(mask), np.asarray(kept)
    s = np.where(m, np.asarray(score), -1.0)
    assert k.sum() > 0 and k.sum() < m.sum()
    # Every kept corner has no strictly-greater corner neighbor.
    ys, xs = np.nonzero(k)
    for y, x in zip(ys, xs):
        nb = s[max(0, y - 1) : y + 2, max(0, x - 1) : x + 2]
        assert s[y, x] >= nb.max()


def test_top_k_corners(rng):
    img = _synthetic_corners(rng)
    mask, score = fast.detect(jnp.asarray(img), 10)
    kept = fast.nonmax_3x3(mask, score)
    xy, valid = fast.top_k_corners(kept, score, 16, border=4)
    xy, valid = np.asarray(xy), np.asarray(valid)
    n_in_border = 0
    m = np.asarray(kept)
    for (x, y), v in zip(xy, valid):
        if v:
            assert m[y, x]
            assert 4 <= x < 64 - 4 and 4 <= y < 48 - 4
            n_in_border += 1
    assert n_in_border >= 3
    # Scores are returned in descending order.
    s = np.asarray(score)
    vs = [s[y, x] for (x, y), v in zip(xy, valid) if v]
    assert vs == sorted(vs, reverse=True)


def test_top_k_fewer_corners_than_k():
    img = np.full((32, 32), 50.0, np.float32)
    img[15:17, 15:17] = 250.0
    mask, score = fast.detect(jnp.asarray(img), 10)
    kept = fast.nonmax_3x3(mask, score)
    xy, valid = fast.top_k_corners(kept, score, 64)
    assert int(np.asarray(valid).sum()) == int(np.asarray(kept).sum())


def test_pallas_fast_matches_dense(rng):
    """The Pallas strip kernel (interpreter mode) must match the dense jnp
    detector: identical corner masks, identical interior scores (border
    scores differ by padding semantics and are never consumed)."""
    from visualslam_android_tpu.ops import fast, fast_pallas

    img = jnp.asarray((rng.random((150, 210)) * 255).astype(np.float32))
    for thresh, arc in ((10, 10), (15, 10), (20, 9)):
        m0, s0 = fast._detect_jnp(img, thresh, arc)
        m1, s1 = fast_pallas.detect(img, thresh, arc, interpret=True)
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
        np.testing.assert_allclose(
            np.asarray(s0)[3:-3, 3:-3], np.asarray(s1)[3:-3, 3:-3]
        )


def test_pallas_detect_vmap_matches_single(rng):
    """vmapping the Pallas detector (multi-stream replicated tracking
    vmaps the whole frame front-end) must produce per-image results
    identical to unbatched calls — Mosaic can't lower a vmap-injected
    batch dim directly, so the custom batching rule maps the kernel."""
    import jax

    from visualslam_android_tpu.ops import fast_pallas

    img0 = jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32))
    img1 = img0[::-1]
    mB, sB = jax.vmap(
        lambda x: fast_pallas.detect(x, 12, 10, interpret=True)
    )(jnp.stack([img0, img1]))
    for k, img in enumerate((img0, img1)):
        m, s = fast_pallas.detect(img, 12, 10, interpret=True)
        np.testing.assert_array_equal(np.asarray(mB[k]), np.asarray(m))
        np.testing.assert_allclose(np.asarray(sB[k]), np.asarray(s))


def test_pallas_detect_vmap_unbatched_image(rng):
    """vmapping over ANOTHER argument with a shared (unbatched) image must
    broadcast the single detection instead of asserting (ADVICE r2)."""
    import jax

    from visualslam_android_tpu.ops import fast_pallas

    img = jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32))

    def f(img, bias):
        m, s = fast_pallas.detect(img, 12, 10, interpret=True)
        return m, s + bias

    mB, sB = jax.vmap(f, in_axes=(None, 0))(img, jnp.arange(3.0))
    m, s = fast_pallas.detect(img, 12, 10, interpret=True)
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(mB[k]), np.asarray(m))
        np.testing.assert_allclose(np.asarray(sB[k]), np.asarray(s) + k)
