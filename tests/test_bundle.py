"""Bundle adjustment tests (SURVEY.md §4.2: BA on noisy synthetic problems
must reduce reprojection error; jni/Bundle.cc semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from visualslam_android_tpu.config import CameraConfig
from visualslam_android_tpu.models import bundle
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import lie


def _make_problem(rng, n_cams=4, n_pts=120, o_max=8, noise_px=0.3,
                  perturb=0.02, n_outlier_meas=0):
    cam = cam_ops.make_camera(CameraConfig().params(), 640, 480)
    K_pad, N_pad = n_cams + 2, n_pts + 16  # padded slots
    pts_true = np.stack(
        [
            rng.uniform(-1.5, 1.5, n_pts),
            rng.uniform(-1.0, 1.0, n_pts),
            rng.uniform(3.5, 6.0, n_pts),
        ],
        axis=-1,
    ).astype(np.float32)
    poses = []
    for i in range(n_cams):
        mu = np.zeros(6, np.float32)
        mu[:3] = (0.3 * i, 0.05 * i, 0.0)
        mu[3:] = (0.0, -0.05 * i, 0.0)
        poses.append(lie.se3_exp(jnp.asarray(mu)))

    meas_kf = np.zeros((N_pad, o_max), np.int32)
    meas_uv = np.zeros((N_pad, o_max, 2), np.float32)
    meas_noise = np.ones((N_pad, o_max), np.float32)
    meas_valid = np.zeros((N_pad, o_max), bool)
    for n in range(n_pts):
        o = 0
        for k, (R, t) in enumerate(poses):
            if o >= o_max:
                break
            pc = np.asarray(R) @ pts_true[n] + np.asarray(t)
            if pc[2] <= 0.1:
                continue
            px = np.asarray(cam_ops.project(cam, jnp.asarray(pc[:2] / pc[2])))
            if not (0 <= px[0] < 640 and 0 <= px[1] < 480):
                continue
            meas_kf[n, o] = k
            meas_uv[n, o] = px + rng.normal(scale=noise_px, size=2)
            meas_valid[n, o] = True
            o += 1

    if n_outlier_meas:
        corrupted = []
        flat = [(n, o) for n in range(n_pts) for o in range(o_max)
                if meas_valid[n, o] and meas_kf[n, o] != 0]
        sel = rng.choice(len(flat), n_outlier_meas, replace=False)
        for s in sel:
            n, o = flat[s]
            meas_uv[n, o] += rng.uniform(30, 60, 2)
            corrupted.append((n, o))
    else:
        corrupted = []

    cam_R = np.stack(
        [np.asarray(p[0]) for p in poses]
        + [np.eye(3, dtype=np.float32)] * (K_pad - n_cams)
    )
    cam_t = np.stack(
        [np.asarray(p[1]) for p in poses] + [np.zeros(3, np.float32)] * (K_pad - n_cams)
    )
    # Perturb non-fixed cameras and all points.
    for k in range(1, n_cams):
        dmu = rng.normal(scale=perturb, size=6).astype(np.float32)
        dR, dt = lie.se3_exp(jnp.asarray(dmu))
        R2, t2 = lie.se3_mul(dR, dt, jnp.asarray(cam_R[k]), jnp.asarray(cam_t[k]))
        cam_R[k], cam_t[k] = np.asarray(R2), np.asarray(t2)
    pts_init = pts_true + rng.normal(scale=perturb, size=pts_true.shape).astype(
        np.float32
    )
    pts_pad = np.zeros((N_pad, 3), np.float32)
    pts_pad[:n_pts] = pts_init
    point_valid = np.zeros(N_pad, bool)
    point_valid[:n_pts] = True
    cam_fixed = np.zeros(K_pad, bool)
    cam_fixed[0] = True
    cam_fixed[n_cams:] = True
    cam_valid = np.zeros(K_pad, bool)
    cam_valid[:n_cams] = True

    prob = bundle.BAProblem(
        cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
        cam_fixed=jnp.asarray(cam_fixed), cam_valid=jnp.asarray(cam_valid),
        points=jnp.asarray(pts_pad), point_valid=jnp.asarray(point_valid),
        meas_kf=jnp.asarray(meas_kf), meas_uv=jnp.asarray(meas_uv),
        meas_sqrt_inv_noise=jnp.asarray(meas_noise),
        meas_valid=jnp.asarray(meas_valid),
    )
    return prob, cam, pts_true, poses, corrupted


def test_ba_reduces_error(rng):
    prob, cam, pts_true, poses, _ = _make_problem(rng, perturb=0.03)
    rms0 = float(bundle.reprojection_rms(prob, cam))
    res = bundle.bundle_adjust(prob, cam, max_iters=20, point_block=64)
    rms1 = float(
        bundle.reprojection_rms(prob, cam, res.cam_R, res.cam_t, res.points)
    )
    assert rms0 > 3.0  # perturbation is visible
    assert rms1 < 0.6, f"rms {rms0} -> {rms1}"
    assert int(res.accepted) >= 1


def test_ba_exact_data_converges_tight(rng):
    prob, cam, pts_true, poses, _ = _make_problem(
        rng, noise_px=0.0, perturb=0.01
    )
    res = bundle.bundle_adjust(prob, cam, max_iters=20, point_block=64)
    rms = float(
        bundle.reprojection_rms(prob, cam, res.cam_R, res.cam_t, res.points)
    )
    assert rms < 0.05
    # Recovered second camera close to truth (gauge fixed by cam0 + points'
    # good init).
    R1t, t1t = poses[1]
    Ri, ti = lie.se3_inverse(res.cam_R[1], res.cam_t[1])
    Re, te = lie.se3_mul(R1t, t1t, Ri, ti)
    err = np.asarray(lie.se3_ln(Re, te))
    assert np.abs(err).max() < 5e-3


def test_ba_fixed_camera_unchanged(rng):
    prob, cam, *_ = _make_problem(rng)
    res = bundle.bundle_adjust(prob, cam, max_iters=10, point_block=64)
    np.testing.assert_allclose(
        np.asarray(res.cam_R[0]), np.asarray(prob.cam_R[0]), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(res.cam_t[0]), np.asarray(prob.cam_t[0]), atol=0
    )


def test_ba_ejects_outliers(rng):
    prob, cam, _, _, corrupted = _make_problem(
        rng, noise_px=0.2, perturb=0.005, n_outlier_meas=10
    )
    res = bundle.bundle_adjust(prob, cam, max_iters=20, point_block=64)
    ej = np.asarray(res.outlier_meas)
    hit = sum(1 for (n, o) in corrupted if ej[n, o])
    assert hit >= 7, f"only {hit}/10 outliers ejected"
    # Ejected measurements are no longer valid.
    mv = np.asarray(res.meas_valid)
    assert not any(mv[n, o] for (n, o) in corrupted if ej[n, o])
    rms = float(
        bundle.reprojection_rms(
            prob._replace(meas_valid=res.meas_valid), cam,
            res.cam_R, res.cam_t, res.points,
        )
    )
    assert rms < 0.7


def test_ba_iteration_budget(rng):
    prob, cam, *_ = _make_problem(rng)
    res = bundle.bundle_adjust(prob, cam, max_iters=3, point_block=64)
    # Budget respected: no more than 3 inner iterations happened. The
    # counter is internal; proxy: accepted <= 3.
    assert int(res.accepted) <= 3


# ---------------------------------------------------------------------------
# Scalable paths: scatter assembly and matrix-free PCG (KITTI-scale BA)
# ---------------------------------------------------------------------------


def test_ba_scatter_assembly_matches_onehot(rng):
    prob, cam, *_ = _make_problem(rng, perturb=0.02, n_outlier_meas=4)
    res_a = bundle.bundle_adjust(prob, cam, max_iters=8, point_block=64)
    res_b = bundle.bundle_adjust(
        prob, cam, max_iters=8, point_block=64, assembly="scatter"
    )
    # Same math, different assembly order: results agree to float tolerance.
    np.testing.assert_allclose(
        np.asarray(res_a.cam_t), np.asarray(res_b.cam_t), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_a.points), np.asarray(res_b.points), atol=1e-4
    )
    assert bool((res_a.outlier_meas == res_b.outlier_meas).all())


def test_ba_pcg_solver_matches_chol(rng):
    prob, cam, *_ = _make_problem(rng, perturb=0.02)
    res_c = bundle.bundle_adjust(prob, cam, max_iters=10, point_block=64)
    res_p = bundle.bundle_adjust(
        prob, cam, max_iters=10, point_block=64, solver="pcg",
        cg_iters=300, cg_tol=1e-7,
    )
    rms_c = float(
        bundle.reprojection_rms(prob, cam, res_c.cam_R, res_c.cam_t,
                                res_c.points)
    )
    rms_p = float(
        bundle.reprojection_rms(prob, cam, res_p.cam_R, res_p.cam_t,
                                res_p.points)
    )
    assert rms_p < max(1.05 * rms_c, rms_c + 0.02), (rms_c, rms_p)
    np.testing.assert_allclose(
        np.asarray(res_c.cam_t), np.asarray(res_p.cam_t), atol=5e-3
    )


def _make_trajectory_problem(rng, n_cams=96, pts_per_cam=60, o_max=6,
                             noise_px=0.3, perturb=0.01):
    """A KITTI-like forward trajectory: each camera sees a sliding window
    of points; covisibility is band-diagonal in keyframe index (the regime
    the scatter/PCG path exists for)."""
    cam = cam_ops.make_camera(CameraConfig().params(), 640, 480)
    n_pts = n_cams * pts_per_cam
    pts_true = np.zeros((n_pts, 3), np.float32)
    poses = []
    for i in range(n_cams):
        mu = np.zeros(6, np.float32)
        mu[:3] = (0.0, 0.0, -0.25 * i)  # forward motion
        mu[4] = 0.002 * i               # slow yaw
        poses.append(lie.se3_exp(jnp.asarray(mu)))
        base = i * pts_per_cam
        pts_true[base:base + pts_per_cam] = np.stack(
            [
                rng.uniform(-2.0, 2.0, pts_per_cam),
                rng.uniform(-1.0, 1.0, pts_per_cam),
                0.25 * i + rng.uniform(3.0, 8.0, pts_per_cam),
            ],
            axis=-1,
        )

    meas_kf = np.zeros((n_pts, o_max), np.int32)
    meas_uv = np.zeros((n_pts, o_max, 2), np.float32)
    meas_valid = np.zeros((n_pts, o_max), bool)
    for n in range(n_pts):
        owner = n // pts_per_cam
        o = 0
        for k in range(max(0, owner - o_max + 1), min(n_cams, owner + 2)):
            if o >= o_max:
                break
            R, t = poses[k]
            pc = np.asarray(R) @ pts_true[n] + np.asarray(t)
            if pc[2] <= 0.5:
                continue
            px = np.asarray(cam_ops.project(cam, jnp.asarray(pc[:2] / pc[2])))
            if not (5 <= px[0] < 635 and 5 <= px[1] < 475):
                continue
            meas_kf[n, o] = k
            meas_uv[n, o] = px + rng.normal(scale=noise_px, size=2)
            meas_valid[n, o] = True
            o += 1

    cam_R = np.stack([np.asarray(p[0]) for p in poses])
    cam_t = np.stack([np.asarray(p[1]) for p in poses])
    for k in range(1, n_cams):
        dmu = rng.normal(scale=perturb, size=6).astype(np.float32)
        dR, dt = lie.se3_exp(jnp.asarray(dmu))
        R2, t2 = lie.se3_mul(dR, dt, jnp.asarray(cam_R[k]),
                             jnp.asarray(cam_t[k]))
        cam_R[k], cam_t[k] = np.asarray(R2), np.asarray(t2)
    pts_init = pts_true + rng.normal(
        scale=perturb, size=pts_true.shape
    ).astype(np.float32)

    cam_fixed = np.zeros(n_cams, bool)
    cam_fixed[0] = True
    prob = bundle.BAProblem(
        cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
        cam_fixed=jnp.asarray(cam_fixed),
        cam_valid=jnp.ones(n_cams, bool),
        points=jnp.asarray(pts_init),
        point_valid=jnp.asarray(meas_valid.any(axis=1)),
        meas_kf=jnp.asarray(meas_kf),
        meas_uv=jnp.asarray(meas_uv),
        meas_sqrt_inv_noise=jnp.ones((n_pts, o_max), jnp.float32),
        meas_valid=jnp.asarray(meas_valid),
    )
    return prob, cam


def test_ba_trajectory_scale_pcg(rng):
    """Band-diagonal trajectory problem (96 KFs, ~5.7k points) through the
    scatter+PCG path: the dense one-hot path would need an [N, O, K]
    incidence and O(N·K²) contractions here."""
    prob, cam = _make_trajectory_problem(rng)
    rms0 = float(bundle.reprojection_rms(prob, cam))
    res = bundle.bundle_adjust(
        prob, cam, max_iters=6, point_block=512,
        solver="pcg", cg_iters=200, cg_tol=1e-6,
    )
    rms1 = float(
        bundle.reprojection_rms(prob, cam, res.cam_R, res.cam_t, res.points)
    )
    assert rms0 > 1.5, rms0
    assert rms1 < 0.55, f"rms {rms0} -> {rms1}"
