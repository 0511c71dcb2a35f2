"""Native host runtime: decode, prefetch pipeline, scheduler, blob IO."""

import os

import numpy as np
import pytest

from visualslam_android_tpu import native_runtime as nr

pytestmark = pytest.mark.skipif(
    not nr.available(), reason="native runtime not built"
)


def _write_pgm(path, img):
    h, w = img.shape
    with open(path, "wb") as f:
        f.write(b"P5\n# test\n%d %d\n255\n" % (w, h))
        f.write(img.tobytes())


def _write_png(path, img):
    from PIL import Image

    Image.fromarray(img).save(path)


def test_decode_pgm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    p = str(tmp_path / "a.pgm")
    _write_pgm(p, img)
    out = nr.decode_image(p, 64, 48)
    np.testing.assert_array_equal(out, img)
    assert nr.image_size(p) == (64, 48)


def test_decode_png_matches_pil(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    p = str(tmp_path / "a.png")
    _write_png(p, img)
    out = nr.decode_image(p, 40, 32)
    np.testing.assert_array_equal(out, img)


def test_decode_png_rgb_luma(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 20, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    _write_png(p, img)
    out = nr.decode_image(p, 20, 16)
    luma = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )
    assert np.max(np.abs(out.astype(np.float64) - luma)) < 2.0


def test_decode_resize(tmp_path):
    # A constant image stays constant under bilinear resize.
    img = np.full((30, 40), 77, np.uint8)
    p = str(tmp_path / "c.pgm")
    _write_pgm(p, img)
    out = nr.decode_image(p, 80, 60)
    assert out.shape == (60, 80)
    np.testing.assert_array_equal(out, np.full((60, 80), 77, np.uint8))


def test_pipeline_in_order_delivery(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    imgs = []
    for i in range(20):
        img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        p = str(tmp_path / f"f{i:03d}.pgm")
        _write_pgm(p, img)
        paths.append(p)
        imgs.append(img)
    with nr.FramePipeline(paths, 32, 24, n_workers=3, capacity=4) as pipe:
        got = list(pipe)
    assert [i for i, _ in got] == list(range(20))
    for (_, frame), img in zip(got, imgs):
        np.testing.assert_array_equal(frame, img)


def test_pipeline_skips_bad_frames(tmp_path):
    img = np.full((8, 8), 9, np.uint8)
    good = str(tmp_path / "g.pgm")
    _write_pgm(good, img)
    bad = str(tmp_path / "missing.pgm")
    with nr.FramePipeline([good, bad, good], 8, 8) as pipe:
        got = [i for i, _ in pipe]
    assert got == [0, 2]


def test_scheduler_matches_python_oracle():
    # Exhaustive over the flag cube: native decision == pure-Python mirror
    # of MapMaker.cc:80-123.
    import itertools

    for qs, rc, fc, fq, nm, r20 in itertools.product(
        [0, 1, 3], [0, 1], [0, 1], [0, 1], [0, 1], [0, 1]
    ):
        assert nr.scheduler_next(qs, rc, fc, fq, nm, r20) == \
            nr.scheduler_next_py(qs, rc, fc, fq, nm, r20), (
                qs, rc, fc, fq, nm, r20
            )


def test_scheduler_reference_ladder():
    # Spot-check the ladder against MapMaker.cc:80-123 semantics.
    # queue > 0 always integrates the keyframe first (every other rung
    # requires an empty queue).
    assert nr.scheduler_next_py(2, 0, 0, 1, 1, 1) == nr.TASK_ADD_KEYFRAME
    # queue empty: local BA until recent-converged.
    assert nr.scheduler_next_py(0, 0, 1, 0, 0, 0) == nr.TASK_BA_RECENT
    # recent converged + new points -> refind them.
    assert nr.scheduler_next_py(0, 1, 0, 0, 1, 0) == nr.TASK_REFIND_NEWLY
    # recent converged, nothing new, full not converged -> global BA.
    assert nr.scheduler_next_py(0, 1, 0, 0, 0, 0) == nr.TASK_BA_ALL
    # everything converged: 1-in-20 failure-queue retry.
    assert nr.scheduler_next_py(0, 1, 1, 1, 0, 1) == nr.TASK_REFIND_FAILURES
    assert nr.scheduler_next_py(0, 1, 1, 1, 0, 0) == nr.TASK_NONE
    # failure retry requires recent && full converged (MapMaker.cc:112):
    # with full unconverged the global BA rung wins even when rand20 fires.
    assert nr.scheduler_next_py(0, 1, 0, 1, 0, 1) == nr.TASK_BA_ALL
    assert nr.scheduler_next_py(0, 1, 1, 0, 0, 1) == nr.TASK_NONE


def test_slam_consumes_scheduler():
    """SLAMSystem._select_task must agree with the scheduler oracle
    for every host-state combination (single source of truth)."""
    from visualslam_android_tpu.config import (
        MapMakerConfig, SLAMConfig, TrackerConfig,
    )
    from visualslam_android_tpu.models import slam as slam_mod

    cfg = SLAMConfig(
        tracker=TrackerConfig(width=64, height=48, max_map_points=16,
                              max_corners_per_level=(32, 16, 8, 8),
                              max_trails=8),
        mapmaker=MapMakerConfig(max_keyframes=4, max_epi_candidates=8),
    )
    sys_ = slam_mod.SLAMSystem(cfg)
    import itertools

    for q, rc, fc, fail, new in itertools.product(
        [0, 2], [False, True], [False, True], [False, True], [False, True]
    ):
        sys_.kf_queue = [None] * q
        sys_.recent_converged = rc
        sys_.full_converged = fc
        # The device queue flags reach the scheduler as the host mirrors
        # refreshed from each frame's packed stats vector.
        sys_._any_failure_host = fail
        sys_._any_new_host = new
        # Pin the 1-in-20 draw both ways via a stub rng.
        for r20 in (True, False):
            class _R:
                def integers(self, n):
                    return 0 if r20 else 1
            sys_._mm_rng = _R()
            got = sys_._select_task()
            want = nr.scheduler_next_py(q, rc, fc, fail, new, r20)
            assert got == want, (q, rc, fc, fail, new, r20, got, want)


def test_blob_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    p = str(tmp_path / "ckpt.vstpu")
    sections = {
        "points": rng.standard_normal((17, 3)).astype(np.float32),
        "mask": rng.integers(0, 2, (17,)).astype(np.uint8),
        "empty": np.zeros((0,), np.float32),
    }
    nr.blob_write(p, sections)
    back = nr.blob_read(p)
    assert set(back) == set(sections)
    for k, v in sections.items():
        np.testing.assert_array_equal(
            back[k].view(v.dtype) if v.size else back[k],
            v.reshape(-1).view(np.uint8).view(v.dtype) if v.size else back[k],
        )
        got = back[k].view(v.dtype).reshape(v.shape) if v.size else \
            np.zeros(v.shape, v.dtype)
        np.testing.assert_array_equal(got, v)
