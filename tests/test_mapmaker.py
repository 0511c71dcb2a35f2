"""Mapmaker-stage unit tests: thin candidates, epipolar growth, refind,
bad-point handling, plane aligner, relocalizer (jni/MapMaker.cc and
jni/Relocaliser.cc semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualslam_android_tpu.models import keyframe as kf_mod
from visualslam_android_tpu.models import map_store, mapmaker, relocalizer
from visualslam_android_tpu.ops import lie, sbi
from visualslam_android_tpu.utils import fixtures, synthetic


@pytest.fixture(scope="module")
def two_kf_map():
    """Fixed map from KF0 plus an inserted KF1 at a translated pose."""
    rng = np.random.default_rng(31)
    config = fixtures.small_config()
    # The epipolar depth clamp [wiggle, 40*wiggle] (MapMaker.cc:552-568)
    # assumes a wiggle-scaled map (scene depth ~ 1); this fixture uses
    # metric depth 4, so widen the clamp accordingly.
    import dataclasses as _dc

    config = config.replace(
        mapmaker=_dc.replace(config.mapmaker, epipolar_depth_max_factor=100.0)
    )
    slam_map, cam, scene, (R0, t0), n_pts = fixtures.build_fixed_map(
        config, rng
    )
    mu = jnp.asarray([0.35, 0.02, 0.0, 0.0, 0.08, 0.0], jnp.float32)
    dR, dt = lie.se3_exp(mu)
    R1, t1 = lie.se3_mul(dR, dt, R0, t0)
    img1 = synthetic.render(
        scene, cam, R1, t1, (config.tracker.height, config.tracker.width)
    )
    frame1 = kf_mod.make_frame(img1, config)
    extras1 = kf_mod.make_frame_extras(frame1, config)
    kfs = kf_mod.insert_keyframe(
        slam_map.keyframes, 1, frame1, extras1, R1, t1
    )
    # Scene-depth stats for KF1 (the real pipeline fills these from
    # tracker measurements on insertion; the epipolar depth range reads
    # them from the SOURCE keyframe, MapMaker.cc:552-555).
    kfs = kfs._replace(
        depth_mean=kfs.depth_mean.at[1].set(4.0),
        depth_sigma=kfs.depth_sigma.at[1].set(0.8),
    )
    slam_map = slam_map._replace(keyframes=kfs)
    return config, slam_map, cam, scene, (R0, t0), (R1, t1), n_pts


def test_keyframe_distances_and_need_new(two_kf_map):
    config, slam_map, cam, scene, (R0, t0), (R1, t1), n = two_kf_map
    kfs = slam_map.keyframes
    idx, d = mapmaker.closest_keyframe(kfs, R0, t0, exclude=0)
    assert int(idx) == 1 and 0.2 < float(d) < 0.6
    # At KF0's own pose, a new KF is not needed; far away it is.
    assert not bool(
        mapmaker.need_new_keyframe(kfs, R0, t0, jnp.asarray(4.0),
                                   jnp.asarray(0.1 / 4.0))
    )
    mu = jnp.asarray([1.5, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)
    dR, dt = lie.se3_exp(mu)
    Rf, tf = lie.se3_mul(dR, dt, R0, t0)
    assert bool(
        mapmaker.need_new_keyframe(kfs, Rf, tf, jnp.asarray(4.0),
                                   jnp.asarray(0.1 / 4.0))
    )


def test_thin_candidates_blocks_busy(two_kf_map):
    config, slam_map, cam, *_ = two_kf_map
    before = int(slam_map.keyframes.cand_valid[0][0].sum())
    out = mapmaker.thin_candidates(slam_map, 0, 0, radius=10)
    after = int(out.keyframes.cand_valid[0][0].sum())
    # The fixture made points at the best candidates, so most level-0
    # candidates are busy now.
    assert after < before


def test_epipolar_search_creates_points(two_kf_map):
    config, slam_map, cam, scene, (R0, t0), (R1, t1), n = two_kf_map
    sm = mapmaker.thin_candidates(slam_map, 1, 1, radius=10)
    res = mapmaker.epipolar_search(sm, 1, 0, cam, 1, config)
    n_succ = int(res.success.sum())
    assert n_succ >= 5, f"epipolar search found only {n_succ} points"
    # Triangulated points must lie near the true plane (z = 4).
    pw = np.asarray(res.pos_w)[np.asarray(res.success)]
    assert np.median(np.abs(pw[:, 2] - 4.0)) < 0.15

    sm2, new_mask = mapmaker.insert_new_points(
        sm, cam, res, 1, 0, 1, config.mapmaker.max_epi_candidates
    )
    n_new = int(new_mask.sum())
    assert n_new == min(n_succ, int((~sm.points.valid).sum()))
    assert int(sm2.points.count()) == int(sm.points.count()) + n_new
    # Each new point has exactly 2 measurements (ROOT + EPIPOLAR).
    nm = np.asarray(new_mask)
    mv = np.asarray(sm2.meas.valid)
    assert np.all(mv[nm].sum(-1) == 2)
    # Per-point sampled color (KeyFrame.cc:82-93 capability, minus the
    # reference's uninitialized-copy bug): each new point carries the
    # bilinear source-level intensity at its creation position.
    from visualslam_android_tpu.ops import image as img_ops

    got = np.asarray(sm2.points.color_gray)[nm]
    centers = np.asarray(sm2.points.center)[nm]
    want = np.asarray(img_ops.bilinear_sample(
        sm2.keyframes.pyramid[1][1], centers
    ))
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert got.std() > 1.0, "sampled colors are degenerate"


def test_refind_finds_points_in_new_kf(two_kf_map):
    config, slam_map, cam, scene, (R0, t0), (R1, t1), n = two_kf_map
    sm, found, never = mapmaker.refind_in_keyframe(
        slam_map, 1, cam, slam_map.points.valid, config
    )
    n_found = int(found.sum())
    assert n_found > 0.4 * n, f"refind found only {n_found}/{n}"
    # Found points gained a measurement in KF1.
    obs = map_store.point_observed_in(sm.meas, 1)
    assert bool(jnp.all(~found | obs))
    # never-retry excludes found points.
    assert not bool(jnp.any(found & never))


def test_handle_bad_points(two_kf_map):
    config, slam_map, *_ = two_kf_map
    pts = slam_map.points
    pts = pts._replace(
        outlier_count=pts.outlier_count.at[3].set(30),
        inlier_count=pts.inlier_count.at[3].set(2),
    )
    sm = slam_map._replace(points=pts)
    sm2, newly_bad = mapmaker.handle_bad_points(sm, config)
    assert bool(newly_bad[3])
    assert not bool(sm2.points.valid[3])
    assert not bool(jnp.any(sm2.meas.valid[3]))


def test_plane_aligner_flattens_plane(two_kf_map):
    config, slam_map, cam, *_ = two_kf_map
    R, t, ok = mapmaker.calc_plane_aligner(
        slam_map, jax.random.PRNGKey(4), config
    )
    assert bool(ok)
    sm = mapmaker.apply_global_transformation(slam_map, R, t)
    z = np.asarray(sm.points.pos_w)[np.asarray(sm.points.live())][:, 2]
    assert np.abs(np.median(z)) < 0.05
    assert np.percentile(np.abs(z), 80) < 0.1


def test_global_scale(two_kf_map):
    config, slam_map, *_ = two_kf_map
    sm = mapmaker.apply_global_scale(slam_map, 2.0)
    np.testing.assert_allclose(
        np.asarray(sm.points.pos_w), 2.0 * np.asarray(slam_map.points.pos_w),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sm.keyframes.t), 2.0 * np.asarray(slam_map.keyframes.t),
        atol=1e-5,
    )


def test_relocalizer_recovers_pose(two_kf_map):
    config, slam_map, cam, scene, (R0, t0), (R1, t1), n = two_kf_map
    # Render a frame near KF1 with a small rotation.
    w = jnp.asarray([0.0, 0.02, 0.01], jnp.float32)
    dR = lie.so3_exp(w)
    R2, t2 = dR @ R1, dR @ t1
    img = synthetic.render(
        scene, cam, R2, t2, (config.tracker.height, config.tracker.width)
    )
    frame = kf_mod.make_frame(img, config)
    s = sbi.make_sbi(frame.pyramid[-1], config.tracker.sbi_blur)
    res = relocalizer.attempt_recovery(slam_map, s.template, cam)
    assert bool(res.success)
    assert int(res.best_kf) == 1
    # Recovered rotation close to truth (translation is the KF's).
    Ri, ti = lie.se3_inverse(res.R, res.t)
    Re, _ = lie.se3_mul(R2, t2, Ri, ti)
    ang = np.linalg.norm(np.asarray(lie.so3_ln(Re)))
    assert ang < 0.02, f"reloc rotation error {ang}"


def test_build_ba_problem_masks(two_kf_map):
    config, slam_map, *_ = two_kf_map
    adjust = jnp.asarray([False, True, False, False])
    prob = mapmaker.build_ba_problem(slam_map, adjust, config)
    # KF0 fixed (not in adjust set), KF1 free.
    assert bool(prob.cam_fixed[0]) and not bool(prob.cam_fixed[1])
    # Points without a KF1 observation are excluded.
    obs1 = map_store.point_observed_in(slam_map.meas, 1)
    assert bool(jnp.all(prob.point_valid == (obs1 & slam_map.points.live())))


# ---------------------------------------------------------------------------
# Measurement-table eviction (full [N, O] rows; VERDICT r1 item 6)
# ---------------------------------------------------------------------------


def _tiny_meas(N=4, O=3):
    return map_store.MeasStore(
        kf=jnp.zeros((N, O), jnp.int32),
        uv=jnp.zeros((N, O, 2), jnp.float32),
        level=jnp.zeros((N, O), jnp.int32),
        source=jnp.zeros((N, O), jnp.int32),
        subpix=jnp.zeros((N, O), bool),
        valid=jnp.zeros((N, O), bool),
    )


def _fill(meas, n, entries):
    """entries: list of (kf, source) filling point n's row in order."""
    for o, (k, s) in enumerate(entries):
        meas = meas._replace(
            kf=meas.kf.at[n, o].set(k),
            source=meas.source.at[n, o].set(s),
            uv=meas.uv.at[n, o].set(jnp.asarray([10.0 * o, 1.0 * k])),
            valid=meas.valid.at[n, o].set(True),
        )
    return meas


def test_eviction_drops_oldest_refind_never_root():
    meas = _tiny_meas()
    # Point 0 full: ROOT, REFIND(old), REFIND(new).
    meas = _fill(meas, 0, [
        (0, map_store.SRC_ROOT),
        (1, map_store.SRC_REFIND),
        (2, map_store.SRC_REFIND),
    ])
    mask = jnp.asarray([True, False, False, False])
    uv = jnp.broadcast_to(jnp.asarray([77.0, 88.0]), (4, 2))
    out = mapmaker.add_measurements_batch(
        meas, mask, 3, uv, 1, map_store.SRC_TRACKER, True
    )
    # ROOT (slot 0) untouched; the OLDEST refind (slot 1) was evicted.
    assert int(out.source[0, 0]) == map_store.SRC_ROOT
    assert int(out.kf[0, 1]) == 3
    assert int(out.source[0, 1]) == map_store.SRC_TRACKER
    assert np.allclose(np.asarray(out.uv[0, 1]), [77.0, 88.0])
    # The newer refind (slot 2) survives.
    assert int(out.source[0, 2]) == map_store.SRC_REFIND
    assert int(out.kf[0, 2]) == 2
    assert bool(jnp.all(out.valid[0]))


def test_eviction_drops_incoming_when_lower_value():
    meas = _tiny_meas()
    # Full row of ROOT + TRAIL + EPIPOLAR: an incoming REFIND (lowest
    # value) must be dropped, leaving the row unchanged.
    meas = _fill(meas, 0, [
        (0, map_store.SRC_ROOT),
        (1, map_store.SRC_TRAIL),
        (2, map_store.SRC_EPIPOLAR),
    ])
    mask = jnp.asarray([True, False, False, False])
    uv = jnp.broadcast_to(jnp.asarray([5.0, 5.0]), (4, 2))
    out = mapmaker.add_measurements_batch(
        meas, mask, 3, uv, 0, map_store.SRC_REFIND, False
    )
    assert np.array_equal(np.asarray(out.source), np.asarray(meas.source))
    assert np.array_equal(np.asarray(out.kf), np.asarray(meas.kf))


def test_non_full_rows_use_free_slot():
    meas = _tiny_meas()
    meas = _fill(meas, 1, [(0, map_store.SRC_ROOT)])
    mask = jnp.asarray([False, True, False, False])
    uv = jnp.broadcast_to(jnp.asarray([3.0, 4.0]), (4, 2))
    out = mapmaker.add_measurements_batch(
        meas, mask, 2, uv, 1, map_store.SRC_EPIPOLAR, True
    )
    assert bool(out.valid[1, 1])
    assert int(out.kf[1, 1]) == 2
    assert int(out.source[1, 1]) == map_store.SRC_EPIPOLAR
    assert not bool(jnp.any(out.valid[jnp.asarray([0, 2, 3])]))


def test_batched_refind_matches_per_kf_loop(two_kf_map):
    """refind_in_keyframes_batched (one dispatch, vmapped search + scanned
    insertion) must replicate the sequential per-keyframe loop exactly."""
    config, slam_map, cam, scene, (R0, t0), (R1, t1), n = two_kf_map
    K = slam_map.keyframes.n_slots
    N = slam_map.points.n_slots
    mask = slam_map.points.valid

    # Sequential per-KF reference (valid KFs in index order).
    sm_seq = slam_map
    found_seq = np.zeros((K, N), bool)
    never_seq = np.zeros((K, N), bool)
    for k in np.nonzero(np.asarray(slam_map.keyframes.valid))[0]:
        sm_seq, f, nv = mapmaker.refind_in_keyframe(
            sm_seq, int(k), cam, mask, config
        )
        found_seq[k] = np.asarray(f)
        never_seq[k] = np.asarray(nv)

    mask_kn = jnp.broadcast_to(mask[None], (K, N))
    sm_b, found_b, never_b = mapmaker.refind_in_keyframes_batched(
        slam_map, cam, mask_kn, config
    )
    np.testing.assert_array_equal(found_seq, np.asarray(found_b))
    np.testing.assert_array_equal(never_seq, np.asarray(never_b))
    np.testing.assert_array_equal(
        np.asarray(sm_seq.meas.valid), np.asarray(sm_b.meas.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(sm_seq.meas.kf), np.asarray(sm_b.meas.kf)
    )
    f_any = found_seq.any(0)
    np.testing.assert_allclose(
        np.asarray(sm_seq.meas.uv)[f_any],
        np.asarray(sm_b.meas.uv)[f_any], atol=1e-5,
    )


def test_refind_pairs_matches_batched_oracle(two_kf_map):
    """frame_step's budgeted (point, keyframe)-pair re-find must replicate
    the K-lane batched oracle when the pending set fits one budget."""
    from visualslam_android_tpu.models import frame_step as fstep

    config, slam_map, cam, scene, (R0, t0), (R1, t1), n = two_kf_map
    K = slam_map.keyframes.n_slots
    N = slam_map.points.n_slots
    # copy: refind_newly donates slam_map, so passing points.valid
    # itself would alias a donated buffer
    new_points = jnp.array(slam_map.points.valid)
    never = jnp.zeros((N, K), bool)
    fail = jnp.zeros((N, K), bool)
    assert int(new_points.sum()) * 2 <= config.mapmaker.refind_pair_budget

    # Oracle: the full K-lane batched search (chunked vmap inside).
    mask_kn = jnp.broadcast_to(new_points[None], (K, N)) & ~never.T
    sm_b, found_b, never_b = mapmaker.refind_in_keyframes_batched(
        slam_map, cam, mask_kn, config
    )

    # Donating call: hand it a private copy so the shared fixture map
    # is not invalidated for later tests.
    sm_copy = jax.tree.map(jnp.array, slam_map)
    sm_p, new_out, never_p, fail_p = fstep.refind_newly(
        sm_copy, new_points, never, fail, cam, config
    )
    # Queues: all pending pairs fit the budget, so the new-queue drains
    # fully and never-retry matches the oracle's failure set.
    assert not bool(jnp.any(new_out))
    np.testing.assert_array_equal(
        np.asarray(never_p), np.asarray(never_b.T)
    )
    # Inserted measurements: same slots, same keyframes, same positions.
    np.testing.assert_array_equal(
        np.asarray(sm_p.meas.valid), np.asarray(sm_b.meas.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(sm_p.meas.kf), np.asarray(sm_b.meas.kf)
    )
    f_any = np.asarray(found_b).any(0)
    np.testing.assert_allclose(
        np.asarray(sm_p.meas.uv)[f_any],
        np.asarray(sm_b.meas.uv)[f_any], atol=1e-4,
    )


def test_refind_pairs_budget_leaves_leftovers(two_kf_map):
    """Over-budget pending pairs stay queued (and are processed by a
    later dispatch) instead of being dropped."""
    import dataclasses as _dc

    from visualslam_android_tpu.models import frame_step as fstep

    config, slam_map, cam, scene, _, _, n = two_kf_map
    small = config.replace(
        mapmaker=_dc.replace(config.mapmaker, refind_pair_budget=8)
    )
    N = slam_map.points.n_slots
    K = slam_map.keyframes.n_slots
    new_points = jnp.array(slam_map.points.valid)  # see aliasing note
    never = jnp.zeros((N, K), bool)
    fail = jnp.zeros((N, K), bool)
    sm_copy = jax.tree.map(jnp.array, slam_map)
    sm, new_out, never_out, fail_out = fstep.refind_newly(
        sm_copy, new_points, never, fail, cam, small
    )
    # 8 pairs processed; the rest of the queue survives.
    assert int(new_out.sum()) > 0
    assert int(new_out.sum()) < int(new_points.sum())
    # Draining: repeated dispatches terminate with an empty queue.
    for _ in range(2 * (int(new_points.sum()) * 2 // 8 + 2)):
        if not bool(jnp.any(new_out)):
            break
        sm, new_out, never_out, fail_out = fstep.refind_newly(
            sm, new_out, never_out, fail_out, cam, small
        )
    assert not bool(jnp.any(new_out)), "budgeted refind never drained"
