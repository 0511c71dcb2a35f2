"""Sharded BA correctness vs the single-device result (SURVEY.md §4.4:
psum-assembled Schur systems checked against the single-device oracle on a
virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualslam_android_tpu.models import bundle
from visualslam_android_tpu.parallel import sharded_ba
from tests.test_bundle import _make_problem


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(rng):
    prob, cam, pts_true, poses, _ = _make_problem(
        rng, n_cams=4, n_pts=120, perturb=0.02
    )
    res1 = bundle.bundle_adjust(prob, cam, max_iters=12, point_block=64)
    mesh = sharded_ba.make_mesh()
    res8 = sharded_ba.sharded_bundle_adjust(
        prob, cam, mesh, max_iters=12, point_block=32
    )
    rms1 = float(
        bundle.reprojection_rms(prob, cam, res1.cam_R, res1.cam_t, res1.points)
    )
    prob_pad = sharded_ba.pad_problem(prob, 8)
    rms8 = float(
        bundle.reprojection_rms(
            prob_pad, cam, res8.cam_R, res8.cam_t, res8.points
        )
    )
    # Both must converge to equivalent optima.
    assert rms8 < max(1.5 * rms1, 0.6), f"sharded rms {rms8} vs {rms1}"
    np.testing.assert_allclose(
        np.asarray(res8.cam_t[:4]), np.asarray(res1.cam_t[:4]), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(res8.cam_R[:4]), np.asarray(res1.cam_R[:4]), atol=5e-3
    )


def test_sharded_outlier_ejection(rng):
    prob, cam, _, _, corrupted = _make_problem(
        rng, noise_px=0.2, perturb=0.005, n_outlier_meas=8
    )
    mesh = sharded_ba.make_mesh()
    res = sharded_ba.sharded_bundle_adjust(
        prob, cam, mesh, max_iters=15, point_block=32
    )
    ej = np.asarray(res.outlier_meas)
    hit = sum(1 for (n, o) in corrupted if ej[n, o])
    assert hit >= 6, f"only {hit}/8 outliers ejected in sharded BA"


def test_pad_problem_preserves_solution(rng):
    prob, cam, *_ = _make_problem(rng, n_pts=100)
    padded = sharded_ba.pad_problem(prob, 8)
    assert padded.points.shape[0] % 8 == 0
    assert not bool(jnp.any(padded.point_valid[prob.points.shape[0]:]))
    res = bundle.bundle_adjust(padded, cam, max_iters=8, point_block=64)
    assert int(res.accepted) >= 1


def test_sharded_pcg_trajectory_scale(rng):
    """KITTI-style band-diagonal problem (96 KFs) through the sharded
    scatter+PCG path on the 8-device mesh: the matrix-free apply psums its
    scatter side every CG iteration; result must match the single-device
    PCG run."""
    from tests.test_bundle import _make_trajectory_problem

    prob, cam = _make_trajectory_problem(rng, n_cams=96, pts_per_cam=40)
    res1 = bundle.bundle_adjust(
        prob, cam, max_iters=5, point_block=512,
        solver="pcg", cg_iters=200,
    )
    mesh = sharded_ba.make_mesh()
    res8 = sharded_ba.sharded_bundle_adjust(
        prob, cam, mesh, max_iters=5, point_block=128,
        assembly="scatter", solver="pcg", cg_iters=200,
    )
    rms1 = float(
        bundle.reprojection_rms(prob, cam, res1.cam_R, res1.cam_t,
                                res1.points)
    )
    prob_pad = sharded_ba.pad_problem(prob, 8)
    rms8 = float(
        bundle.reprojection_rms(prob_pad, cam, res8.cam_R, res8.cam_t,
                                res8.points)
    )
    assert rms8 < max(1.2 * rms1, 0.6), f"sharded pcg rms {rms8} vs {rms1}"
    # Gauge is pinned at camera 0 only, so f32 reduction-order differences
    # accumulate along the ~24 m chain: compare at trajectory scale.
    traj_len = float(jnp.linalg.norm(res1.cam_t[-1] - res1.cam_t[0]))
    diff = float(jnp.abs(res8.cam_t - res1.cam_t).max())
    assert diff < 5e-3 * traj_len, (diff, traj_len)


def test_sharded_band_pcg_hist_matches_single_device(rng):
    """The KITTI-scale sharded configuration — solver='band_pcg' +
    sigma_mode='hist' (block-band psum once per inner iteration, local CG,
    [512]-histogram sigma psum) — must reproduce the single-device result
    of the SAME configuration (the histogram is exactly additive across
    shards, so parity is bit-level up to reduction order)."""
    prob, cam, pts_true, poses, _ = _make_problem(
        rng, n_cams=4, n_pts=120, perturb=0.02
    )
    kw = dict(max_iters=8, solver="band_pcg", band_halfwidth=4,
              sigma_mode="hist", cg_iters=120, cg_tol=1e-7)
    res1 = bundle.bundle_adjust(prob, cam, point_block=64, **kw)
    mesh = sharded_ba.make_mesh()
    res8 = sharded_ba.sharded_bundle_adjust(
        prob, cam, mesh, point_block=32, **kw
    )
    assert int(res8.accepted) >= 1
    np.testing.assert_allclose(
        np.asarray(res8.cam_t), np.asarray(res1.cam_t), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res8.cam_R), np.asarray(res1.cam_R), atol=1e-4
    )
    n = res1.points.shape[0]
    np.testing.assert_allclose(
        np.asarray(res8.points[:n]), np.asarray(res1.points), atol=1e-3
    )


# ---------------------------------------------------------------------------
# reduce_mode='halo': locality-aware band reduction (r5)
# ---------------------------------------------------------------------------


def test_band_lower_from_upper_roundtrip(rng):
    """Block symmetry reconstruction: full band == lower-from-upper of
    its own upper half, exactly (no arithmetic, only transposes)."""
    K, band = 32, 4
    S = np.zeros((K, 2 * band + 1, 6, 6), np.float32)
    for i in range(K):
        for d in range(2 * band + 1):
            j = i + d - band
            if 0 <= j < K:
                if j >= i:
                    S[i, d] = rng.normal(size=(6, 6))
    for i in range(K):
        for d in range(band):
            j = i + d - band  # j < i
            if j >= 0:
                S[i, d] = S[j, (i - j) + band].T
    rec = np.asarray(
        bundle._band_lower_from_upper(jnp.asarray(S[:, band:]), band)
    )
    np.testing.assert_array_equal(rec, S)


def test_halo_reduce_gather_equals_sum(rng):
    """The ppermute-strip + all-gather reduction equals the plain sum of
    per-device contributions when each device's contributions are
    confined to its camera block plus the halo strip."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    D, rows, halo, F = 8, 16, 5, 7
    K = D * rows
    contrib = np.zeros((D, K, F), np.float32)
    for d in range(D):
        lo, hi = d * rows, min(K, (d + 1) * rows + halo)
        contrib[d, lo:hi] = rng.normal(size=(hi - lo, F))
    mesh = sharded_ba.make_mesh()
    f = shard_map(
        lambda c: bundle._halo_reduce_gather(
            c[0], sharded_ba.AXIS, rows, halo
        ),
        mesh=mesh, in_specs=P(sharded_ba.AXIS), out_specs=P(),
        check_rep=False,
    )
    got = np.asarray(jax.jit(f)(jnp.asarray(contrib)))
    np.testing.assert_allclose(got, contrib.sum(0), atol=1e-5)


def test_pack_problem_camblock_roundtrip(rng):
    """pack + unpack is the identity on point-side arrays."""
    from tests.test_bundle import _make_trajectory_problem

    prob, cam = _make_trajectory_problem(rng, n_cams=64, pts_per_cam=6)
    packed, orig = sharded_ba.pack_problem_camblock(prob, 8, 8)
    assert packed.points.shape[0] % 8 == 0
    # Every original point appears exactly once.
    kept = orig[orig >= 0]
    assert sorted(kept.tolist()) == list(range(prob.points.shape[0]))
    fake = bundle.BAResult(
        cam_R=packed.cam_R, cam_t=packed.cam_t, points=packed.points,
        meas_valid=packed.meas_valid, outlier_meas=packed.meas_valid,
        point_outliers=jnp.arange(packed.points.shape[0], dtype=jnp.int32),
        accepted=jnp.asarray(0), converged=jnp.asarray(False),
        sigma_squared=jnp.asarray(1.0),
    )
    back = sharded_ba.unpack_point_outputs(
        fake, orig, prob.points.shape[0]
    )
    np.testing.assert_allclose(
        np.asarray(back.points), np.asarray(prob.points)
    )
    np.testing.assert_array_equal(
        np.asarray(back.meas_valid), np.asarray(prob.meas_valid)
    )


def test_sharded_band_halo_matches_band_pcg(rng):
    """reduce_mode='halo' (camera-block packing, ppermute halo strip +
    half-band all-gather) must converge to the same optimum as the
    full-band-psum band_pcg path and the single-device oracle. The
    reductions sum the same contributions in a different order, so
    parity is optimum-level (rms + pose tolerance), not bit-level."""
    from tests.test_bundle import _make_trajectory_problem

    prob, cam = _make_trajectory_problem(rng, n_cams=128, pts_per_cam=10)
    band = 16
    kw = dict(max_iters=3, point_block=256, cg_iters=150, cg_tol=1e-6)
    mesh = sharded_ba.make_mesh()
    res_psum = sharded_ba.sharded_bundle_adjust(
        prob, cam, mesh, solver="band_pcg", band_halfwidth=band,
        sigma_mode="hist", **kw,
    )
    res_halo = sharded_ba.sharded_bundle_adjust_halo(
        prob, cam, mesh, band_halfwidth=band, **kw,
    )
    assert int(res_halo.accepted) == int(res_psum.accepted)
    n = prob.points.shape[0]
    rms_psum = float(bundle.reprojection_rms(
        prob, cam, res_psum.cam_R, res_psum.cam_t, res_psum.points[:n]
    ))
    rms_halo = float(bundle.reprojection_rms(
        prob, cam, res_halo.cam_R, res_halo.cam_t, res_halo.points
    ))
    assert rms_halo < 1.05 * rms_psum + 1e-4, (rms_halo, rms_psum)
    traj_len = float(
        jnp.linalg.norm(res_psum.cam_t[-1] - res_psum.cam_t[0])
    )
    diff = float(jnp.abs(res_halo.cam_t - res_psum.cam_t).max())
    assert diff < 5e-3 * max(traj_len, 1.0), (diff, traj_len)
