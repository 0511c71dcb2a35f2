"""Two-view bootstrap: MLESAC homography estimation, Tukey-WLS refinement,
Faugeras-Lustman decomposition, and disambiguation.

Capability parity with jni/HomographyInit.{h,cc}: matches are z=1
camera-plane correspondences with per-match pixel-projection Jacobians
(HomographyMatch, HomographyInit.h:24-30); MLESAC with 300 trials of 4-point
DLT (BestHomographyFromMatches_MLESAC :216-262, HomographyFromMatches
:73-128 — null space of the stacked [2N x 9] system, zero-padded to 9 rows);
5 rounds of Tukey-weighted WLS refinement over the 9 homography entries with
prior 1 (RefineHomographyWithInliers :133-214 — without the reference's
(int) residual cast, SURVEY.md §6); the 8-way Faugeras-Lustman
decomposition (DecomposeHomography :264-377, case 1 only); and the two-stage
visibility scoring + Sampson tie-break (ChooseBestDecomposition :405-500,
SampsonusError :383-403).

TPU-native design: the serial 300-trial loop becomes one batched DLT — 300
9x9 SVDs at once; MLESAC scoring is a [300, M] dense computation;
refinement iterations and the decomposition search are fixed-shape.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from visualslam_android_tpu.ops import lie
from visualslam_android_tpu.ops import mestimator as me


class HomographyResult(NamedTuple):
    success: jnp.ndarray   # [] bool
    R: jnp.ndarray         # [3, 3] second-from-first rotation
    t: jnp.ndarray         # [3] second-from-first translation
    H: jnp.ndarray         # [3, 3] refined homography
    inliers: jnp.ndarray   # [M] bool
    normal: jnp.ndarray    # [3] plane normal of the winning decomposition
    plane_d: jnp.ndarray   # [] plane distance


def _dlt(first, second, weight=None):
    """Homography from >= 4 matches by DLT (HomographyFromMatches,
    HomographyInit.cc:73-128): null space of the [2N x 9] system via the
    SVD of A^T A (same null vector, fixed 9x9 shape so it batches)."""
    x, y = first[..., 0], first[..., 1]
    u, v = second[..., 0], second[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    row0 = jnp.stack([x, y, one, zero, zero, zero, -x * u, -y * u, -u], -1)
    row1 = jnp.stack([zero, zero, zero, x, y, one, -x * v, -y * v, -v], -1)
    A = jnp.concatenate([row0, row1], axis=-2)  # [..., 2N, 9]
    if weight is not None:
        w2 = jnp.concatenate([weight, weight], axis=-1)[..., None]
        A = A * w2
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    # Smallest eigenvector of AtA = right null vector of A.
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]
    return h.reshape(*h.shape[:-1], 3, 3)


def _transfer_error_sq(H, first, second, pixel_jac):
    """Squared pixel transfer error of second ~ H * first
    (IsHomographyInlier / MLESACScore, HomographyInit.cc:22-41)."""
    fh = jnp.concatenate(
        [first, jnp.ones((*first.shape[:-1], 1), first.dtype)], -1
    )
    v = jnp.einsum("...ij,...mj->...mi", jnp.atleast_3d(H), fh) \
        if H.ndim > 2 else jnp.einsum("ij,mj->mi", H, fh)
    z = v[..., 2]
    bad = jnp.abs(z) < 1e-12
    safe_z = jnp.where(bad, 1.0, z)
    proj = v[..., :2] / safe_z[..., None]
    err = second - proj
    perr = jnp.einsum("...mab,...mb->...ma", pixel_jac, err)
    e2 = jnp.sum(perr * perr, axis=-1)
    return jnp.where(bad, 1e12, e2)


def _refine(H, first, second, pixel_jac, inliers):
    """One Tukey-WLS refinement round (RefineHomographyWithInliers,
    HomographyInit.cc:133-214): additive 9-parameter update, prior 1."""
    dtype = H.dtype
    fh = jnp.concatenate(
        [first, jnp.ones((*first.shape[:-1], 1), dtype)], -1
    )  # [M, 3]
    v = jnp.einsum("ij,mj->mi", H, fh)
    z = v[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1.0, z)
    proj = v[:, :2] / safe_z[:, None]
    err = jnp.einsum("mab,mb->ma", pixel_jac, second - proj)  # [M, 2]
    e2 = jnp.sum(err * err, axis=-1)

    inv_z = 1.0 / safe_z
    # d proj / d H rows (HomographyInit.cc:158-182).
    zeros = jnp.zeros_like(fh)
    jx = jnp.concatenate(
        [fh * inv_z[:, None], zeros, -fh * (v[:, 0] * inv_z**2)[:, None]], -1
    )  # [M, 9]
    jy = jnp.concatenate(
        [zeros, fh * inv_z[:, None], -fh * (v[:, 1] * inv_z**2)[:, None]], -1
    )
    J = jnp.stack([jx, jy], axis=1)  # [M, 2, 9]
    J = jnp.einsum("mab,mbk->mak", pixel_jac, J)

    sigma_sq = me.find_sigma_squared(e2, inliers, me.TUKEY)
    w = me.weight(e2, jnp.maximum(sigma_sq, 1e-12), me.TUKEY)
    w = jnp.where(inliers, w, 0.0)
    A = jnp.einsum("mak,mal,m->kl", J, J, w)
    b = jnp.einsum("mak,ma,m->k", J, err, w)
    # The 9-parameter system is gauge-deficient — homography scale is
    # unobservable, J @ vec(H) = 0 — so A has one ~zero eigenvalue whose
    # f32 accumulation noise (~|A| * 1e-7, i.e. O(10) when the data terms
    # reach ~1e8 at pixel scale) can even go negative; a plain LU solve
    # returns NaN there. The reference solves the same system in double
    # with a unit prior (myWLS.h:29-62, HomographyInit.cc:186-205). The
    # f32-native equivalent: truncated eigen-solve that inverts only the
    # directions f32 actually resolves, which gauge-fixes the update.
    lam, V = jnp.linalg.eigh(A)
    lam_max = jnp.maximum(lam[-1], jnp.asarray(1e-12, dtype))
    good = lam > 1e-6 * lam_max
    inv = jnp.where(good, 1.0 / jnp.where(good, lam, 1.0), 0.0)
    upd = V @ (inv * (V.T @ b))
    Hn = H + upd.reshape(3, 3)
    # Keep the gauge direction consistent across rounds.
    return Hn / jnp.maximum(jnp.linalg.norm(Hn), 1e-12)


def _decompose(H):
    """Faugeras-Lustman 8-way decomposition (DecomposeHomography,
    HomographyInit.cc:264-377). Returns stacked (R[8,3,3], t[8,3],
    n[8,3], d[8], valid)."""
    dtype = H.dtype
    U, S, Vt = jnp.linalg.svd(H)
    V = Vt.T
    d1, d2, d3 = jnp.abs(S[0]), jnp.abs(S[1]), jnp.abs(S[2])
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-20)
    x1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom, 0.0, None))
    x3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom, 0.0, None))
    valid = (d1 - d2 > 1e-7 * d1) & (d2 - d3 > 1e-7 * d1)

    e1 = jnp.asarray([1.0, -1.0, 1.0, -1.0], dtype)
    e3 = jnp.asarray([1.0, 1.0, -1.0, -1.0], dtype)

    def case(dp_sign):
        if dp_sign > 0:
            sin_t = (d1 - d3) * x1 * x3 * e1 * e3 / d2
            cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / d2 * jnp.ones(4, dtype)
            Rp = jnp.zeros((4, 3, 3), dtype)
            Rp = Rp.at[:, 0, 0].set(cos_t).at[:, 0, 2].set(-sin_t)
            Rp = Rp.at[:, 1, 1].set(1.0)
            Rp = Rp.at[:, 2, 0].set(sin_t).at[:, 2, 2].set(cos_t)
            tp = jnp.stack(
                [(d1 - d3) * x1 * e1, jnp.zeros(4, dtype),
                 (d1 - d3) * -x3 * e3], -1)
            d = s * d2 * jnp.ones(4, dtype)
        else:
            # Rp = -I with the x/z block replaced by [cos, sin; sin, -cos]
            # (HomographyInit.cc:344-351).
            sin_p = (d1 + d3) * x1 * x3 * e1 * e3 / d2
            cos_p = (d3 * x1 * x1 - d1 * x3 * x3) / d2 * jnp.ones(4, dtype)
            Rp = jnp.zeros((4, 3, 3), dtype)
            Rp = Rp.at[:, 0, 0].set(cos_p).at[:, 0, 2].set(sin_p)
            Rp = Rp.at[:, 1, 1].set(-1.0)
            Rp = Rp.at[:, 2, 0].set(sin_p).at[:, 2, 2].set(-cos_p)
            tp = jnp.stack(
                [(d1 + d3) * x1 * e1, jnp.zeros(4, dtype),
                 (d1 + d3) * x3 * e3], -1)
            d = s * -d2 * jnp.ones(4, dtype)
        n = jnp.stack([x1 * e1, jnp.zeros(4, dtype), x3 * e3], -1)
        n = jnp.einsum("ij,kj->ki", V, n)
        R = s * jnp.einsum("ij,kjl,ml->kim", U, Rp, V)
        t = jnp.einsum("ij,kj->ki", U, tp)
        return R, t, n, d

    Rp_list, tp_list, n_list, d_list = [], [], [], []
    for sign in (1, -1):
        R, t, n, d = case(sign)
        Rp_list.append(R)
        tp_list.append(t)
        n_list.append(n)
        d_list.append(d)
    return (
        jnp.concatenate(Rp_list),
        jnp.concatenate(tp_list),
        jnp.concatenate(n_list),
        jnp.concatenate(d_list),
        valid,
    )


def _sampson_error(second, E, first):
    """SampsonusError (HomographyInit.cc:383-403), batched over matches."""
    f = jnp.concatenate(
        [first, jnp.ones((*first.shape[:-1], 1), first.dtype)], -1
    )
    sd = jnp.concatenate(
        [second, jnp.ones((*second.shape[:-1], 1), second.dtype)], -1
    )
    Ef = jnp.einsum("ij,mj->mi", E, f)
    Etsd = jnp.einsum("ji,mj->mi", E, sd)
    err = jnp.sum(Ef * sd, axis=-1)
    denom = jnp.sum(Ef[:, :2] ** 2, -1) + jnp.sum(Etsd[:, :2] ** 2, -1)
    return err * err / jnp.maximum(denom, 1e-20)


@functools.partial(
    jax.jit,
    static_argnames=("max_pixel_error", "n_trials", "refine_iters"),
)
def compute(
    first, second, pixel_jac, match_valid, key,
    max_pixel_error=5.0, n_trials=300, refine_iters=5,
) -> HomographyResult:
    """Full HomographyInit::Compute (HomographyInit.cc:43-71), batched,
    as ONE jitted program — eager, its ~400-op chain costs ~1 s of
    dispatch latency over a remote-TPU link.

    first/second [M, 2]: z=1-plane correspondences (padded, mask
    match_valid); pixel_jac [M, 2, 2]: projection derivatives at the
    second-view points (MapMaker.cc:224-231 fills these).
    """
    dtype = first.dtype
    M = first.shape[0]
    max_err_sq = jnp.asarray(max_pixel_error * max_pixel_error, dtype)

    # --- MLESAC (300 batched 4-point DLTs) ---
    p = match_valid.astype(dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, M, shape=(n_trials, 4), p=p)
    H_all = _dlt(first[idx], second[idx])  # [T, 3, 3]
    e2_all = jax.vmap(
        lambda Hh: _transfer_error_sq(Hh, first, second, pixel_jac)
    )(H_all)  # [T, M]
    scores = jnp.sum(
        jnp.where(match_valid[None], jnp.minimum(e2_all, max_err_sq), 0.0),
        axis=-1,
    )
    best = jnp.argmin(scores)
    H = H_all[best]

    # --- Inliers + 5 refinement rounds (HomographyInit.cc:50-58) ---
    e2 = _transfer_error_sq(H, first, second, pixel_jac)
    inliers = match_valid & (e2 < max_err_sq)
    for _ in range(refine_iters):
        H = _refine(H, first, second, pixel_jac, inliers)

    # --- Decomposition (8 candidates) ---
    R8, t8, n8, d8, decomp_ok = _decompose(H)

    # --- Two-stage visibility scoring (ChooseBestDecomposition) ---
    fh = jnp.concatenate([first, jnp.ones((M, 1), dtype)], -1)
    # Stage 1: sign of (H row3 . x) / d.
    hrow3 = jnp.einsum("j,mj->m", H[2], fh)  # [M]
    vis1 = (hrow3[None, :] / d8[:, None]) > 0.0  # [8, M]
    score1 = jnp.sum(vis1 & match_valid[None], axis=-1)
    top4 = jax.lax.top_k(score1, 4)[1]
    # Stage 2 on the top 4: sign of (x . n) / d.
    xn = jnp.einsum("kj,mj->km", n8[top4], fh)
    vis2 = (xn / d8[top4][:, None]) > 0.0
    score2 = jnp.sum(vis2 & match_valid[None], axis=-1)
    order2 = jax.lax.top_k(score2, 2)[1]
    i0, i1 = top4[order2[0]], top4[order2[1]]
    s0 = score2[order2[0]].astype(dtype)
    s1 = score2[order2[1]].astype(dtype)
    ratio = s1 / jnp.maximum(s0, 1.0)

    # Sampson tie-break (HomographyInit.cc:455-496).
    def essential(Ri, ti):
        return jnp.stack(
            [jnp.cross(ti, Ri[:, j]) for j in range(3)], axis=-1
        )

    limit = max_err_sq * 4.0
    samp = []
    for i in (i0, i1):
        E = essential(R8[i], t8[i])
        se = _sampson_error(second, E, first)
        samp.append(
            jnp.sum(jnp.where(match_valid, jnp.minimum(se, limit), 0.0))
        )
    pick_second = (ratio >= 0.9) & (samp[1] < samp[0])
    win = jnp.where(pick_second, i1, i0)

    success = decomp_ok & (jnp.sum(inliers) >= 4)
    return HomographyResult(
        success=success,
        R=R8[win], t=t8[win], H=H,
        inliers=inliers,
        normal=n8[win], plane_d=d8[win],
    )
