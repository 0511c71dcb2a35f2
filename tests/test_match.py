"""Batched patch-matching tests (SURVEY.md §4.1: ZMSSD identity, warp/
search-level selection, subpixel convergence per jni/PatchFinder.cc and
jni/MiniPatch.cc)."""

import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.ops import fast, image, match


def _texture(rng, h=120, w=160):
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    return np.asarray(image.gaussian_blur(jnp.asarray(img), 1.2))


def test_search_level_from_det(rng):
    # Identity pixel motion -> det 1 -> level 0.
    pc = jnp.asarray([[0.0, 0.0, 2.0]])
    # motion vectors chosen so the in-plane derivative is exactly s per px:
    # d(m)/d = (motion_xy) / z for motion_z = 0.
    derivs = jnp.asarray([[[100.0, 0.0], [0.0, 100.0]]])  # focal 100 px

    def mk(s):
        mr = jnp.asarray([[2.0 * s / 100.0, 0.0, 0.0]])
        md = jnp.asarray([[0.0, 2.0 * s / 100.0, 0.0]])
        return match.calc_search_level_and_warp(pc, mr, md, derivs)

    w, lv, good = mk(1.0)
    assert int(lv[0]) == 0 and bool(good[0])
    np.testing.assert_allclose(np.asarray(w[0]), np.eye(2), atol=1e-5)
    # 2x magnification -> det 4 -> search level 1.
    _, lv, good = mk(2.0)
    assert int(lv[0]) == 1 and bool(good[0])
    # 8x magnification -> det 64 -> beyond level 3 range (64/64=1<=3: lvl 3).
    _, lv, good = mk(8.0)
    assert int(lv[0]) == 3 and bool(good[0])
    # Reflected warp (negative det) -> bad.
    mr = jnp.asarray([[-2.0 / 100.0, 0.0, 0.0]])
    md = jnp.asarray([[0.0, 2.0 / 100.0, 0.0]])
    _, _, good = match.calc_search_level_and_warp(pc, mr, md, derivs)
    assert not bool(good[0])


def test_nowarp_template_recovers_patch(rng):
    img = _texture(rng)
    stack = jnp.asarray(img)[None]
    centers = jnp.asarray([[30.0, 40.0], [100.0, 60.0]])
    t = match.make_templates_nowarp(stack, jnp.zeros(2, jnp.int32), centers)
    np.testing.assert_allclose(
        np.asarray(t.data[0]), img[35:46, 25:36], rtol=1e-5
    )
    assert not bool(t.bad[0]) and not bool(t.bad[1])
    # Near-border center is flagged bad.
    t2 = match.make_templates_nowarp(
        stack, jnp.zeros(1, jnp.int32), jnp.asarray([[3.0, 3.0]])
    )
    assert bool(t2.bad[0])


def test_warped_template_identity_matches_nowarp(rng):
    img = _texture(rng)
    stack = jnp.asarray(img)[None]
    centers = jnp.asarray([[50.0, 50.0]])
    warp_inv = jnp.eye(2)[None]
    t = match.make_templates_warped(
        stack, jnp.zeros(1, jnp.int32), centers, warp_inv,
        jnp.zeros(1, jnp.int32),
    )
    t0 = match.make_templates_nowarp(stack, jnp.zeros(1, jnp.int32), centers)
    np.testing.assert_allclose(
        np.asarray(t.data[0]), np.asarray(t0.data[0]), atol=1e-3
    )
    assert not bool(t.bad[0])


def test_coarse_search_finds_shifted_patch(rng):
    img = _texture(rng)
    stack = jnp.asarray(img)[None]
    true_pos = np.array([[70.0, 55.0], [40.0, 80.0]], np.float32)
    t = match.make_templates_nowarp(
        stack, jnp.zeros(2, jnp.int32), jnp.asarray(true_pos)
    )
    # Corner mask: true corners + distractors everywhere FAST fires.
    mask, _ = fast.detect(jnp.asarray(img), 8)
    mask = mask.at[55, 70].set(True).at[80, 40].set(True)
    pred = jnp.asarray(true_pos + np.array([[6.0, -4.0], [-7.0, 5.0]], np.float32))
    res = match.find_patch_coarse(
        jnp.asarray(img), mask, t, pred,
        jnp.full((2,), 10.0), jnp.ones(2, bool), search_range=10,
    )
    assert bool(res.found[0]) and bool(res.found[1])
    np.testing.assert_allclose(np.asarray(res.pos_level), true_pos, atol=0.5)


def test_coarse_search_respects_radius(rng):
    img = _texture(rng)
    stack = jnp.asarray(img)[None]
    true_pos = np.array([[70.0, 55.0]], np.float32)
    t = match.make_templates_nowarp(
        stack, jnp.zeros(1, jnp.int32), jnp.asarray(true_pos)
    )
    mask = jnp.zeros(img.shape, bool).at[55, 70].set(True)
    pred = jnp.asarray(true_pos + np.array([[9.0, 0.0]], np.float32))
    # Radius 5 < 9 offset: must NOT find.
    res = match.find_patch_coarse(
        jnp.asarray(img), mask, t, pred,
        jnp.full((1,), 5.0), jnp.ones(1, bool), search_range=10,
    )
    assert not bool(res.found[0])


def test_coarse_search_brightness_invariant(rng):
    img = _texture(rng)
    stack = jnp.asarray(img)[None]
    true_pos = np.array([[70.0, 55.0]], np.float32)
    t = match.make_templates_nowarp(
        stack, jnp.zeros(1, jnp.int32), jnp.asarray(true_pos)
    )
    mask = jnp.zeros(img.shape, bool).at[55, 70].set(True)
    brighter = jnp.asarray(img) + 40.0  # global illumination change
    res = match.find_patch_coarse(
        brighter, mask, t, jnp.asarray(true_pos),
        jnp.full((1,), 5.0), jnp.ones(1, bool), search_range=10,
    )
    assert bool(res.found[0])  # ZMSSD ignores the mean shift


def test_subpix_converges_to_true_offset(rng):
    img = _texture(rng)
    # Target: image shifted by a subpixel amount; template from original.
    dx, dy = 0.37, -0.21
    h, w = img.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    pts = jnp.stack([jnp.asarray(xs + dx), jnp.asarray(ys + dy)], axis=-1)
    target = jnp.asarray(
        np.asarray(image.bilinear_sample(jnp.asarray(img), pts))
    )
    stack = jnp.asarray(img)[None]
    centers = np.array([[70.0, 55.0], [40.0, 80.0], [100.0, 30.0]], np.float32)
    t = match.make_templates_nowarp(
        stack, jnp.zeros(3, jnp.int32), jnp.asarray(centers)
    )
    res = match.iterate_subpix(
        target, t, jnp.asarray(centers), jnp.zeros(3, jnp.int32),
        jnp.ones(3, bool), max_iters=10,
    )
    assert np.all(np.asarray(res.converged))
    # Feature content moved by (+dx,+dy) in pixel coords... the patch at
    # `centers` in the original appears at centers - (dx, dy) in target.
    got = np.asarray(res.pos_zero)
    want = centers - np.array([dx, dy], np.float32)
    np.testing.assert_allclose(got, want, atol=0.08)


def test_subpix_fails_off_edge(rng):
    img = _texture(rng)
    stack = jnp.asarray(img)[None]
    centers = np.array([[70.0, 55.0]], np.float32)
    t = match.make_templates_nowarp(
        stack, jnp.zeros(1, jnp.int32), jnp.asarray(centers)
    )
    res = match.iterate_subpix(
        jnp.asarray(img), t, jnp.asarray([[2.0, 2.0]]),
        jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
    )
    assert not bool(res.converged[0])


def test_minipatch_roundtrip(rng):
    img = _texture(rng)
    pos = np.array([[50.0, 60.0], [90.0, 40.0]], np.float32)
    patches = match.sample_minipatches(jnp.asarray(img), jnp.asarray(pos))
    assert patches.shape == (2, 9, 9)
    mask, _ = fast.detect(jnp.asarray(img), 8)
    mask = mask.at[60, 50].set(True).at[40, 90].set(True)
    pred = jnp.asarray(pos + np.array([[5.0, 5.0], [-6.0, 2.0]], np.float32))
    res = match.find_minipatch(
        jnp.asarray(img), mask, patches, pred, jnp.ones(2, bool)
    )
    assert bool(res.found[0]) and bool(res.found[1])
    np.testing.assert_allclose(np.asarray(res.pos), pos, atol=0.5)


def test_minipatch_not_found_on_blank():
    img = jnp.full((64, 64), 100.0)
    patches = jnp.asarray(
        np.tile(np.linspace(0, 255, 81).reshape(1, 9, 9), (1, 1, 1)).astype(
            np.float32
        )
    )
    mask = jnp.ones((64, 64), bool)
    res = match.find_minipatch(
        img, mask, patches, jnp.asarray([[32.0, 32.0]]), jnp.ones(1, bool),
        max_ssd=9999,
    )
    assert not bool(res.found[0])
