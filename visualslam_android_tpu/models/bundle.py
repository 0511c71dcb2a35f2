"""Levenberg-Marquardt bundle adjustment with Schur complement.

Capability parity with jni/Bundle.{h,cc} (Hartley & Zisserman MVG Algorithm
A6.4, as the reference implements it):

- per-measurement 2x6 camera (A) and 2x3 point (B) Jacobians with the
  sqrt-Tukey weight folded in (Do_LM_Step, Bundle.cc:241-321);
- robust sigma from the Tukey MAD estimator with minimum 0.4
  (Bundle.cc:209-227);
- accumulators U (per camera), V (per point), eps_a, eps_b, W = A^T B;
- inner lambda loop: V* = V(1+lambda*diag), reduced camera system
  S = U* - sum_p W V*^-1 W^T assembled over camera pairs
  (Bundle.cc:327-434), solved for the camera update, points
  back-substituted (Bundle.cc:437-462); step accepted iff the robust
  objective decreased, lambda schedule x0.3 on success / x(doubling
  factor) on failure (Bundle.cc:469-514, ModifyLambda_* :609-617);
- convergence on squared update < 1e-6, max 20 total inner iterations
  (Bundle.cc:65-66);
- fixed cameras excluded from the update (identity rows in our fixed-shape
  S instead of removed rows);
- measurement ejection: z <= 0 or zero Tukey weight marks the measurement
  bad; bad measurements are removed at the end of each LM step and
  reported with per-point outlier counts (Bundle.cc:516-531,
  GetOutliers/GetOutlierMeasurements :620-640).

TPU-native design (SURVEY.md §7.6/§7.9): measurements live in a point-major
[N, O] table; U/V/eps are segment-sums; the Schur correction is assembled
per point BLOCK as dense one-hot contractions (two MXU matmuls per block,
scanned over blocks) instead of per-camera-pair scripts — the same blocked
sum that later shards across devices with a psum. S is solved with a
Cholesky factorization rather than the reference's dense inverse
(Bundle.cc:437). The abort-signal (Bundle.cc:154) becomes the bounded
`max_iters` budget: the mapmaker runs BA in bounded chunks between frames.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import lie
from visualslam_android_tpu.ops import mestimator as me
from visualslam_android_tpu.ops import wls as wls_ops

MIN_SIGMA_SQ = 0.16  # (0.4)^2, Bundle.cc:224


class BAProblem(NamedTuple):
    """Fixed-shape bundle problem."""

    cam_R: jnp.ndarray      # [K, 3, 3]
    cam_t: jnp.ndarray      # [K, 3]
    cam_fixed: jnp.ndarray  # [K] bool (includes invalid slots)
    cam_valid: jnp.ndarray  # [K] bool
    points: jnp.ndarray     # [N, 3]
    point_valid: jnp.ndarray  # [N] bool
    meas_kf: jnp.ndarray    # [N, O] int32
    meas_uv: jnp.ndarray    # [N, O, 2] level-0 pixels
    meas_sqrt_inv_noise: jnp.ndarray  # [N, O] (1/2^level)
    meas_valid: jnp.ndarray  # [N, O] bool


class BAResult(NamedTuple):
    cam_R: jnp.ndarray
    cam_t: jnp.ndarray
    points: jnp.ndarray
    meas_valid: jnp.ndarray       # with ejected measurements cleared
    outlier_meas: jnp.ndarray     # [N, O] measurements ejected this run
    point_outliers: jnp.ndarray   # [N] int32 ejected-obs count per point
    accepted: jnp.ndarray         # [] int32 accepted LM steps
    converged: jnp.ndarray        # [] bool
    sigma_squared: jnp.ndarray    # [] final robust sigma^2


def _project_all(cam, R, t, pts, prob: BAProblem):
    """Project every measurement; returns (pc [N,O,3], err [N,O,2] noise-
    scaled, err_sq [N,O], bad [N,O])."""
    Rm = R[prob.meas_kf]  # [N, O, 3, 3]
    tm = t[prob.meas_kf]
    pc = jnp.einsum("noij,nj->noi", Rm, pts) + tm
    z_bad = pc[..., 2] <= 0
    safe_z = jnp.where(z_bad, 1.0, pc[..., 2])
    m = pc[..., :2] / safe_z[..., None]
    px = cam_ops.project(cam, m)
    err = (prob.meas_uv - px) * prob.meas_sqrt_inv_noise[..., None]
    err_sq = jnp.sum(err * err, axis=-1)
    return pc, err, err_sq, z_bad


def _jacobians(cam, pc, Rm, sqrt_w, sqrt_inv_noise, cam_fixed_m):
    """A [N,O,2,6], B [N,O,2,3] with sqrt-weight and noise folded in
    (Bundle.cc:269-302). A is zeroed for fixed cameras."""
    z_ok = pc[..., 2] > 0
    safe_z = jnp.where(z_ok, pc[..., 2], 1.0)
    inv_z = 1.0 / safe_z
    m = pc[..., :2] * inv_z[..., None]
    flat = m.reshape(-1, 2)
    _, derivs = cam_ops.project_derivs(cam, flat)
    derivs = derivs.reshape(*m.shape[:-1], 2, 2)
    derivs = derivs * sqrt_w[..., None, None]  # weight folded into derivs

    x, y = pc[..., 0], pc[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    cam_motions = [
        (one, zero, zero), (zero, one, zero), (zero, zero, one),
        (zero, -pc[..., 2], y), (pc[..., 2], zero, -x), (-y, x, zero),
    ]

    def in_plane(mx, my, mz):
        return jnp.stack(
            [(mx - x * mz * inv_z) * inv_z, (my - y * mz * inv_z) * inv_z],
            axis=-1,
        )

    A = jnp.stack(
        [jnp.einsum("noab,nob->noa", derivs, in_plane(*mo))
         for mo in cam_motions],
        axis=-1,
    )  # [N, O, 2, 6]
    A = A * sqrt_inv_noise[..., None, None]
    A = jnp.where(cam_fixed_m[..., None, None], 0.0, A)

    # B: derivative wrt point position = columns of R (Bundle.cc:294-302).
    Bcols = []
    for mcol in range(3):
        v = Rm[..., :, mcol]  # [N, O, 3]
        Bcols.append(
            jnp.einsum(
                "noab,nob->noa", derivs,
                in_plane(v[..., 0], v[..., 1], v[..., 2]),
            )
        )
    B = jnp.stack(Bcols, axis=-1) * sqrt_inv_noise[..., None, None]
    return A, B


def _schur_blocks(C, Y, W, eps_b, block: int):
    """Scan over point blocks accumulating the Schur correction
    S_corr [K, 6, K, 6] and E_corr [K, 6]. C [N, O, K] one-hot camera
    incidence; Y = W V^-1. Each block is two dense contractions (MXU) —
    the blocked sum that later shards across devices with a psum."""
    N, O, K = C.shape
    n_blocks = -(-N // block)
    pad = n_blocks * block - N

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    Cp, Yp, Wp = pad0(C), pad0(Y), pad0(W)

    E_corr = jnp.einsum("nok,noab,nb->ka", C, Y, eps_b)

    def body(S_acc, idx):
        sl = lambda x: lax.dynamic_slice_in_dim(x, idx * block, block)
        Cb, Yb, Wb = sl(Cp), sl(Yp), sl(Wp)
        G = jnp.einsum("nok,noab->nkab", Cb, Yb)   # [B, K, 6, 3]
        Hm = jnp.einsum("nok,noab->nkab", Cb, Wb)  # [B, K, 6, 3]
        return S_acc + jnp.einsum("nkab,nlcb->kalc", G, Hm), None

    S_corr, _ = lax.scan(
        body, jnp.zeros((K, 6, K, 6), C.dtype), jnp.arange(n_blocks)
    )
    return S_corr, E_corr


def _e_corr_scatter(meas_kf, Y, eps_b, K):
    """E_corr [K, 6] by scatter-add: Y is already zero for bad/fixed
    measurements (the weights are folded into A/B), so garbage kf indices
    on dead slots contribute zeros."""
    e = jnp.einsum("noab,nb->noa", Y, eps_b)
    return jnp.zeros((K, 6), Y.dtype).at[meas_kf.reshape(-1)].add(
        e.reshape(-1, 6)
    )


def _schur_blocks_scatter(meas_kf, Y, W, eps_b, K, block: int):
    """Schur correction assembled by per-point camera-PAIR blocks scattered
    into S_corr [K, 6, K, 6] — the sparse-aware analog of the reference's
    off-diagonal scripts (jni/Bundle.cc:400-426,580-607). Unlike the
    one-hot path (O(N·O·K) memory, O(N·K²) FLOPs) this is O(N·O²) work:
    the right shape once K grows past local-BA size (KITTI-scale global
    BA, SURVEY.md §7 'sparse Schur structure at scale')."""
    N, O = meas_kf.shape
    n_blocks = -(-N // block)
    pad = n_blocks * block - N

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    kfp, Yp, Wp = pad0(meas_kf), pad0(Y), pad0(W)
    E_corr = _e_corr_scatter(meas_kf, Y, eps_b, K)

    def body(S_acc, idx):
        sl = lambda x: lax.dynamic_slice_in_dim(x, idx * block, block)
        kfb, Yb, Wb = sl(kfp), sl(Yp), sl(Wp)
        # T[n, o, p] = Y[n, o] W[n, p]^T — all O x O camera pairs of each
        # point in one batched contraction.
        T = jnp.einsum("noab,npcb->nopac", Yb, Wb)  # [B, O, O, 6, 6]
        ii = jnp.broadcast_to(kfb[:, :, None], T.shape[:3]).reshape(-1)
        jj = jnp.broadcast_to(kfb[:, None, :], T.shape[:3]).reshape(-1)
        return S_acc.at[ii, :, jj, :].add(T.reshape(-1, 6, 6)), None

    S_corr, _ = lax.scan(
        body, jnp.zeros((K, 6, K, 6), Y.dtype), jnp.arange(n_blocks)
    )
    return S_corr, E_corr


def _schur_blocks_band(meas_kf, Y, W, eps_b, K, band: int, block: int):
    """Schur correction in BLOCK-BAND form: S_band [K, 2*band+1, 6, 6]
    where S_band[i, d] is the (i, i+d-band) camera-pair block. For
    odometry-style maps every co-observing camera pair is within a small
    index offset, so psumming the band (K*(2*band+1)*36 floats) replaces
    psumming the dense [K,6,K,6] correction (K*K*36) — the collective
    payload drops by K/(2*band+1), which is what makes sharded global BA
    scale (see parallel/sharded_ba.comm_bytes_per_lm_step). Pairs outside
    the band are DROPPED — callers must check max_pair_offset() <= band
    (models/slam.py does) or results are silently wrong."""
    N, O = meas_kf.shape
    n_blocks = -(-N // block)
    pad = n_blocks * block - N

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    kfp, Yp, Wp = pad0(meas_kf), pad0(Y), pad0(W)
    E_corr = _e_corr_scatter(meas_kf, Y, eps_b, K)

    def body(S_acc, idx):
        sl = lambda x: lax.dynamic_slice_in_dim(x, idx * block, block)
        kfb, Yb, Wb = sl(kfp), sl(Yp), sl(Wp)
        T = jnp.einsum("noab,npcb->nopac", Yb, Wb)  # [B, O, O, 6, 6]
        ii = jnp.broadcast_to(kfb[:, :, None], T.shape[:3]).reshape(-1)
        jj = jnp.broadcast_to(kfb[:, None, :], T.shape[:3]).reshape(-1)
        dd = jj - ii + band  # out-of-range scatters drop
        return S_acc.at[ii, dd].add(
            T.reshape(-1, 6, 6), mode="drop"
        ), None

    S_band, _ = lax.scan(
        body, jnp.zeros((K, 2 * band + 1, 6, 6), Y.dtype),
        jnp.arange(n_blocks),
    )
    return S_band, E_corr


def _band_to_dense(S_band, K, band: int):
    """Reconstruct the dense correction [K, 6, K, 6] from its block band —
    local (post-psum) work, no communication."""
    ii = jnp.broadcast_to(
        jnp.arange(K)[:, None], (K, 2 * band + 1)
    )
    jj = ii + jnp.arange(-band, band + 1)[None, :]
    ok = (jj >= 0) & (jj < K)
    vals = jnp.where(ok[..., None, None], S_band, 0.0)
    return jnp.zeros((K, 6, K, 6), S_band.dtype).at[
        ii.reshape(-1), :, jnp.clip(jj, 0, K - 1).reshape(-1), :
    ].add(vals.reshape(-1, 6, 6))


def _halo_reduce_gather(x, axis_name, rows: int, halo: int):
    """Locality-aware replacement for `psum(x)` when each device's
    contributions to the camera-indexed array x [K, F] are confined to
    rows [k0, k1 + halo) of its OWN contiguous camera block [k0, k1)
    (points packed by min observing camera — pack_problem_camblock in
    parallel/sharded_ba.py). Then the only cross-device overlap is the
    `halo`-row strip a device spills into its RIGHT neighbor's block, so
    the full-payload ring all-reduce (2(D-1)/D · K·F bytes on the wire)
    collapses to ONE one-directional ppermute of the strip (halo·F)
    plus a tiled all-gather of the owned rows ((D-1)/D · K·F) — ~2.4x
    less wire traffic, and the big win is composing it with the
    symmetric-half band trick (_gather_band_sym) which halves K·F too.

    The reference assembles this same reduced system serially in one
    address space (jni/Bundle.cc:353-437); the halo structure is the
    TPU-native expression of its camera-pair locality ("scripts" over
    temporally-near keyframes)."""
    D = lax.psum(1, axis_name)
    if rows * D != x.shape[0] or halo > rows:
        raise ValueError(
            f"halo reduce needs K == rows*D and halo <= rows; got "
            f"K={x.shape[0]}, rows={rows}, D={D}, halo={halo}"
        )
    idx = lax.axis_index(axis_name)
    strip = lax.dynamic_slice_in_dim(x, (idx + 1) * rows, halo)
    recv = lax.ppermute(
        strip, axis_name, perm=[(d, d + 1) for d in range(D - 1)]
    )
    own = lax.dynamic_slice_in_dim(x, idx * rows, rows)
    own = own.at[:halo].add(recv)
    return lax.all_gather(own, axis_name, axis=0, tiled=True)


def _band_lower_from_upper(S_half, band: int):
    """Reconstruct the full block band [K, 2*band+1, 6, 6] from its
    upper half S_half [K, band+1, 6, 6] (offsets 0..band) using block
    symmetry S[i, i-d] = S[i-d, i]^T — so only the half band ever rides
    the interconnect."""
    K = S_half.shape[0]
    dd = jnp.arange(band)            # dense column 0..band-1
    delta = band - dd                # positive offset band..1
    src_i = jnp.arange(K)[:, None] - delta[None, :]     # [K, band]
    vals = S_half[jnp.clip(src_i, 0, K - 1), delta]     # [K, band, 6, 6]
    vals = jnp.where(
        (src_i >= 0)[..., None, None],
        jnp.swapaxes(vals, -1, -2), 0.0,
    )
    return jnp.concatenate([vals, S_half], axis=1)


def max_pair_offset(meas_kf, meas_valid) -> int:
    """Largest |i - j| over co-observing camera pairs (host-side helper
    for choosing assembly='band'). NumPy, not traced."""
    import numpy as np

    kf = np.asarray(meas_kf)
    mv = np.asarray(meas_valid)
    any_valid = mv.any(axis=1)
    if not any_valid.any():
        return 0
    hi = np.where(mv, kf, np.iinfo(np.int32).min).max(axis=1)
    lo = np.where(mv, kf, np.iinfo(np.int32).max).min(axis=1)
    return int((hi - lo)[any_valid].max())


def _cg_loop(apply_S, prec, b, cg_iters: int, cg_tol: float):
    """Preconditioned conjugate gradients on S x = b (S SPD via apply_S)."""
    b_sq = jnp.sum(b * b)
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = prec(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def cond(s):
        x, r, z, p, rz, i = s
        return (i < cg_iters) & (jnp.sum(r * r) > cg_tol * cg_tol * b_sq)

    def body(s):
        x, r, z, p, rz, i = s
        Ap = apply_S(p)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(denom == 0.0, 1.0, denom)
        alpha = jnp.where(denom == 0.0, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(rz == 0.0, 1.0, rz)
        beta = jnp.where(rz == 0.0, 0.0, beta)
        p = z + beta * p
        return (x, r, z, p, rz_new, i + 1)

    x, _, _, _, _, _ = lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, jnp.asarray(0, jnp.int32))
    )
    return x


def _pcg_camera_solve(U_star, free, meas_kf, W, Vinv, b, pa,
                      cg_iters: int, cg_tol: float):
    """Matrix-free block-Jacobi-preconditioned CG on the reduced camera
    system S x = b, never forming S. One apply is two gathers/scatters and
    three small batched contractions over the measurement table — O(N·O)
    per iteration regardless of K, so global BA scales to KITTI-size maps
    (500+ keyframes) where a dense [6K x 6K] assembly (the reference's
    jni/Bundle.cc:353-437) is prohibitive. With a mesh axis, the scatter
    side of the apply is psummed: each device holds a point shard, x is
    replicated, and CG runs in lockstep on identical replicated state."""
    dtype = b.dtype
    K = U_star.shape[0]
    eye6 = jnp.eye(6, dtype=dtype)
    Y = jnp.einsum("noab,nbc->noac", W, Vinv)
    Mblk = jnp.where(free[:, None, None], U_star + 1e-9 * eye6[None],
                     eye6[None] * jnp.ones((K, 1, 1), dtype))
    Minv = jnp.linalg.inv(Mblk)

    kf_flat = meas_kf.reshape(-1)

    def apply_S(x):
        g = x[meas_kf]                                # [N, O, 6]
        u = jnp.einsum("noab,noa->nb", W, g)          # [N, 3]
        corr = jnp.einsum("noab,nb->noa", Y, u)       # [N, O, 6]
        corr = pa(jnp.zeros_like(x).at[kf_flat].add(corr.reshape(-1, 6)))
        out = jnp.einsum("kab,kb->ka", U_star, x) + 1e-9 * x - corr
        return jnp.where(free[:, None], out, x)

    def prec(r):
        return jnp.einsum("kab,kb->ka", Minv, r)

    b = jnp.where(free[:, None], b, 0.0)
    return _cg_loop(apply_S, prec, b, cg_iters, cg_tol)


def _band_pcg_solve(U_star, S_band, free, band: int, b,
                    cg_iters: int, cg_tol: float):
    """Block-Jacobi-preconditioned CG on the REPLICATED block-band reduced
    system (S_band already psummed). Unlike _pcg_camera_solve no
    collectives run inside the CG loop — each device iterates on identical
    local state — and one apply is a banded block matvec, K*(2*band+1)
    6x6 blocks: ~(6K)^3/3 / (cg_iters*K*(2P+1)*72) ≈ 50x fewer replicated
    FLOPs than the dense Cholesky it replaces at K=512, P=16. This is the
    Amdahl term of sharded global BA (every device repeats the camera
    solve), so shrinking it is what strong scaling needs."""
    dtype = b.dtype
    K = U_star.shape[0]
    eye6 = jnp.eye(6, dtype=dtype)
    offs = jnp.arange(-band, band + 1)
    jj = jnp.arange(K)[:, None] + offs[None, :]        # [K, 2P+1]
    in_rng = (jj >= 0) & (jj < K)
    jj_c = jnp.clip(jj, 0, K - 1)
    col_ok = in_rng & free[jj_c]                       # mask non-free cols
    Sb = jnp.where(col_ok[..., None, None], S_band, 0.0)

    def apply_S(x):
        xm = jnp.where(free[:, None], x, 0.0)
        g = xm[jj_c]                                   # [K, 2P+1, 6]
        corr = jnp.einsum("kdab,kdb->ka", Sb, g)
        out = jnp.einsum("kab,kb->ka", U_star, xm) + 1e-9 * xm - corr
        return jnp.where(free[:, None], out, x)

    # Diagonal block of S = U* - S_corr[i, i] — a strictly better
    # preconditioner than U* alone.
    Mblk = U_star - Sb[:, band] + 1e-9 * eye6[None]
    Mblk = jnp.where(free[:, None, None], Mblk,
                     eye6[None] * jnp.ones((K, 1, 1), dtype))
    Minv = jnp.linalg.inv(Mblk)

    def prec(r):
        return jnp.einsum("kab,kb->ka", Minv, r)

    b = jnp.where(free[:, None], b, 0.0)
    return _cg_loop(apply_S, prec, b, cg_iters, cg_tol)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iters", "point_block", "axis_name",
        "assembly", "solver", "cg_iters", "cg_tol",
        "update_conv", "min_sigma_sq", "lambda_init", "lambda_good",
        "lambda_factor_init", "band_halfwidth", "sigma_mode",
        "reduce_mode", "shard_rows",
    ),
)
def bundle_adjust(
    prob: BAProblem, cam: cam_ops.Camera,
    max_iters: int = 20, point_block: int = 1024,
    axis_name=None,
    assembly: str = "onehot", solver: str = "chol",
    cg_iters: int = 250, cg_tol: float = 1e-6,
    update_conv: float = 1e-6, min_sigma_sq: float = MIN_SIGMA_SQ,
    lambda_init: float = 1e-4, lambda_good: float = 0.3,
    lambda_factor_init: float = 2.0,
    band_halfwidth: int = 16,
    sigma_mode: str = "gather",
    reduce_mode: str = "psum",
    shard_rows: int = 0,
) -> BAResult:
    """Full Bundle::Compute (Bundle.cc:136-178) as a jitted fixed-shape
    program. max_iters bounds TOTAL inner iterations (the reference's
    mgvnMaxIterations); run repeatedly with small budgets to emulate the
    abort signal.

    With `axis_name` set, the problem's point/measurement arrays are the
    LOCAL shard of a mesh axis (see parallel/sharded_ba.py): camera-side
    accumulators (U, eps_a, Schur correction, objective sums) are psummed
    over the axis, the replicated reduced system is solved identically on
    every device, and point back-substitution stays local — the
    TPU-native realization of SURVEY.md §2's "sharded global BA".

    Scale knobs (SURVEY.md §7 "sparse Schur structure at scale"):
    - assembly: "onehot" (dense MXU contractions per point block; right
      for local-BA K), "scatter" (per-point camera-pair blocks scattered
      into S; O(N·O²) instead of O(N·K²), right for large K), or "band"
      (block-band form [K, 2*band_halfwidth+1, 6, 6]: psums K/(2P+1)x
      less than the dense correction — the multi-chip scaling path for
      odometry-band maps; requires max_pair_offset <= band_halfwidth);
    - solver: "chol" (dense Cholesky of the [6K, 6K] reduced system),
      "pcg" (matrix-free block-Jacobi CG; never forms S, but pays one
      [K,6] psum per CG iteration when sharded), or "band_pcg" (psum the
      block band once per inner iteration, then CG locally on the
      replicated band with ZERO in-loop collectives — the fastest
      absolute path for odometry-band maps; requires max_pair_offset <=
      band_halfwidth like assembly="band");
    - sigma_mode: "gather" (exact masked median of the globally gathered
      error table — bit-identical to the single-device result) or "hist"
      (additive log2-histogram median, one [512] psum instead of an
      N*O-float all-gather; sigma within a few percent — the KITTI-scale
      sharded setting);
    - reduce_mode: "psum" (contribution arrays all-reduced — correct for
      ANY point-to-device assignment) or "halo" (band_pcg only; requires
      points packed by min observing camera into contiguous camera
      blocks of `shard_rows` cameras per device — see
      parallel/sharded_ba.pack_problem_camblock. The band/U/eps
      reductions become one right-neighbor ppermute of the
      band_halfwidth-row halo strip plus a tiled all-gather of the
      owned rows, and only the UPPER half band rides the wire (block
      symmetry reconstructs the rest) — ~4x less interconnect traffic
      than psumming the full band, which is what turns sharded band BA
      from a net loss into an absolute wall-clock win at D>=4).
    """
    dtype = prob.points.dtype
    N, O = prob.meas_kf.shape
    K = prob.cam_R.shape[0]

    if reduce_mode == "halo" and (
        axis_name is None or solver != "band_pcg" or shard_rows <= 0
    ):
        raise ValueError(
            "reduce_mode='halo' requires axis_name, solver='band_pcg' "
            "and shard_rows=K/D (camera-block-packed points)"
        )

    def _pa(x):
        return lax.psum(x, axis_name) if axis_name is not None else x

    meas_valid0 = prob.meas_valid & prob.point_valid[:, None]
    cam_fixed_m = prob.cam_fixed[prob.meas_kf]

    class _S(NamedTuple):
        R: jnp.ndarray
        t: jnp.ndarray
        pts: jnp.ndarray
        meas_valid: jnp.ndarray
        ejected: jnp.ndarray
        lam: jnp.ndarray
        lam_factor: jnp.ndarray
        counter: jnp.ndarray
        accepted: jnp.ndarray
        converged: jnp.ndarray
        sigma_sq: jnp.ndarray

    def lm_step(s: _S) -> _S:
        # ---- Projection + robust sigma (Bundle.cc:209-227) ----
        pc, err, err_sq, z_bad = _project_all(cam, s.R, s.t, s.pts, prob)
        ok = s.meas_valid & ~z_bad
        if sigma_mode == "hist":
            # Additive log-histogram median: one [bins] psum instead of
            # all-gathering every shard's error table (the largest
            # collective of the gather path at KITTI scale).
            sigma_sq = me.find_sigma_squared_hist(
                err_sq, ok, me.TUKEY, axis_name=axis_name
            )
        else:
            err_sq_g, ok_g = err_sq.reshape(-1), ok.reshape(-1)
            if axis_name is not None:
                # The MAD sigma needs the global error distribution.
                err_sq_g = lax.all_gather(err_sq_g, axis_name).reshape(-1)
                ok_g = lax.all_gather(ok_g, axis_name).reshape(-1)
            sigma_sq = me.find_sigma_squared(err_sq_g, ok_g, me.TUKEY)
        sigma_sq = jnp.maximum(sigma_sq, min_sigma_sq)
        sqrt_w = me.square_root_weight(err_sq, sigma_sq, me.TUKEY)
        bad = s.meas_valid & (z_bad | (sqrt_w == 0.0))
        good = s.meas_valid & ~bad
        current_error = _pa(
            jnp.sum(
                jnp.where(
                    good, me.objective_score(err_sq, sigma_sq, me.TUKEY), 0.0
                )
            )
            + jnp.sum(bad.astype(dtype))
        )

        # ---- Jacobians + accumulators (Bundle.cc:241-321) ----
        Rm = s.R[prob.meas_kf]
        A, B = _jacobians(
            cam, pc, Rm, jnp.where(good, sqrt_w, 0.0),
            prob.meas_sqrt_inv_noise, cam_fixed_m,
        )
        gmask = good[..., None]
        eps = jnp.where(gmask, err * sqrt_w[..., None], 0.0)
        A = jnp.where(gmask[..., None], A, 0.0)
        B = jnp.where(gmask[..., None], B, 0.0)

        kf_flat = prob.meas_kf.reshape(-1)
        U = jnp.zeros((K, 6, 6), dtype).at[kf_flat].add(
            jnp.einsum("nora,norb->noab", A, A).reshape(-1, 6, 6)
        )
        eps_a = jnp.zeros((K, 6), dtype).at[kf_flat].add(
            jnp.einsum("nora,nor->noa", A, eps).reshape(-1, 6)
        )
        if reduce_mode == "halo":
            flat = _halo_reduce_gather(
                jnp.concatenate([U.reshape(K, 36), eps_a], axis=1),
                axis_name, shard_rows, band_halfwidth,
            )
            U = flat[:, :36].reshape(K, 6, 6)
            eps_a = flat[:, 36:]
        else:
            U, eps_a = _pa(U), _pa(eps_a)
        V = jnp.einsum("nora,norb->nab", B, B)  # [N, 3, 3]
        eps_b = jnp.einsum("nora,nor->na", B, eps)
        W = jnp.einsum("nora,norb->noab", A, B)  # [N, O, 6, 3]

        # One-hot camera incidence for the Schur correction (only the
        # dense-assembly path materializes it).
        if solver not in ("pcg", "band_pcg") and assembly == "onehot":
            C = (
                jax.nn.one_hot(prob.meas_kf, K, dtype=dtype)
                * (good & ~cam_fixed_m).astype(dtype)[..., None]
            )

        # ---- Inner lambda loop (Bundle.cc:327-514) ----
        class _I(NamedTuple):
            lam: jnp.ndarray
            lam_factor: jnp.ndarray
            counter: jnp.ndarray
            converged: jnp.ndarray
            hit_max: jnp.ndarray
            new_error: jnp.ndarray
            R_new: jnp.ndarray
            t_new: jnp.ndarray
            pts_new: jnp.ndarray

        def inner_body(i: _I) -> _I:
            # V* inverse: diagonal scaled by (1 + lambda); zero inverse if
            # V is singular-ish (Bundle.cc:333-349).
            Vs = V + i.lam * V * jnp.eye(3, dtype=dtype)[None]
            diag_prod = V[:, 0, 0] * V[:, 1, 1] * V[:, 2, 2]
            singular = diag_prod == 0.0
            Vs_safe = jnp.where(
                singular[:, None, None], jnp.eye(3, dtype=dtype)[None], Vs
            )
            Vinv = jnp.where(
                singular[:, None, None], 0.0, wls_ops.inv3x3(Vs_safe)
            )

            Y = jnp.einsum("noab,nbc->noac", W, Vinv)  # [N, O, 6, 3]

            # U with lambda-scaled diagonal; fixed/invalid cameras take no
            # update.
            lam_eye = 1.0 + i.lam * jnp.eye(6, dtype=dtype)[None]
            U_star = U * lam_eye
            free = prob.cam_valid & ~prob.cam_fixed

            if solver == "pcg":
                # KITTI-scale path: never form S.
                E_corr = _pa(_e_corr_scatter(prob.meas_kf, Y, eps_b, K))
                E = jnp.where(free[:, None], eps_a - E_corr, 0.0)
                cam_upd = _pcg_camera_solve(
                    U_star, free, prob.meas_kf, W, Vinv, E, _pa,
                    cg_iters, cg_tol,
                )
            elif solver == "band_pcg":
                # Odometry-band path: reduce the block band once, then CG
                # locally with zero in-loop collectives.
                S_band, E_corr = _schur_blocks_band(
                    prob.meas_kf, Y, W, eps_b, K, band_halfwidth,
                    point_block,
                )
                if reduce_mode == "halo":
                    # Only the upper half band + E_corr ride the wire;
                    # block symmetry rebuilds the lower half locally.
                    S_half = S_band[:, band_halfwidth:]
                    flat = _halo_reduce_gather(
                        jnp.concatenate(
                            [S_half.reshape(K, -1), E_corr], axis=1
                        ),
                        axis_name, shard_rows, band_halfwidth,
                    )
                    S_half = flat[:, :-6].reshape(
                        K, band_halfwidth + 1, 6, 6
                    )
                    E_corr = flat[:, -6:]
                    S_band = _band_lower_from_upper(
                        S_half, band_halfwidth
                    )
                else:
                    S_band, E_corr = _pa(S_band), _pa(E_corr)
                E = jnp.where(free[:, None], eps_a - E_corr, 0.0)
                cam_upd = _band_pcg_solve(
                    U_star, S_band, free, band_halfwidth, E,
                    cg_iters, cg_tol,
                )
            else:
                if assembly == "band":
                    # psum the block band, reconstruct dense locally.
                    S_band, E_corr = _schur_blocks_band(
                        prob.meas_kf, Y, W, eps_b, K, band_halfwidth,
                        point_block,
                    )
                    S_band, E_corr = _pa(S_band), _pa(E_corr)
                    S_corr = _band_to_dense(S_band, K, band_halfwidth)
                elif assembly == "scatter":
                    S_corr, E_corr = _schur_blocks_scatter(
                        prob.meas_kf, Y, W, eps_b, K, point_block
                    )
                    S_corr, E_corr = _pa(S_corr), _pa(E_corr)
                else:
                    S_corr, E_corr = _schur_blocks(
                        C, Y, W, eps_b, point_block
                    )
                    S_corr, E_corr = _pa(S_corr), _pa(E_corr)

                S = -S_corr  # [K, 6, K, 6]
                kk = jnp.arange(K)
                S = S.at[kk, :, kk, :].add(U_star)
                eyeK = jnp.eye(6, dtype=dtype)[None] * jnp.ones(
                    (K, 1, 1), dtype
                )
                S = jnp.where(
                    free[:, None, None, None] & free[None, None, :, None],
                    S,
                    0.0,
                )
                S = S.at[kk, :, kk, :].add(
                    jnp.where(free[:, None, None], 0.0, eyeK)
                )
                E = jnp.where(free[:, None], eps_a - E_corr, 0.0)

                Sm = S.reshape(K * 6, K * 6)
                Sm = Sm + 1e-9 * jnp.eye(K * 6, dtype=dtype)
                L, low = jax.scipy.linalg.cho_factor(Sm, lower=True)
                cam_upd = jax.scipy.linalg.cho_solve(
                    (L, low), E.reshape(-1)
                ).reshape(K, 6)

            # Back-substitute points (Bundle.cc:440-462).
            dc = cam_upd[prob.meas_kf]  # [N, O, 6]
            wtd = jnp.einsum("noab,noa->nob", W, dc)  # [N, O, 3]
            v3 = eps_b - jnp.sum(wtd, axis=1)
            pt_upd = jnp.einsum("nab,nb->na", Vinv, v3)

            pt_upd = jnp.where(prob.point_valid[:, None], pt_upd, 0.0)
            upd_sq = jnp.sum(cam_upd * cam_upd) + _pa(
                jnp.sum(pt_upd * pt_upd)
            )
            converged = upd_sq < update_conv

            dR, dt = lie.se3_exp(cam_upd)
            R_new, t_new = lie.se3_mul(dR, dt, s.R, s.t)
            R_new = jnp.where(free[:, None, None], R_new, s.R)
            t_new = jnp.where(free[:, None], t_new, s.t)
            pts_new = s.pts + jnp.where(
                prob.point_valid[:, None], pt_upd, 0.0
            )

            # FindNewError (Bundle.cc:537-561): same sigma, +1 per z-bad.
            _, _, err_sq_new, z_bad_new = _project_all(
                cam, R_new, t_new, pts_new, prob
            )
            ok_new = good & ~z_bad_new
            new_error = _pa(
                jnp.sum(
                    jnp.where(
                        ok_new,
                        me.objective_score(err_sq_new, sigma_sq, me.TUKEY),
                        0.0,
                    )
                )
                + jnp.sum((good & z_bad_new).astype(dtype))
                + jnp.sum(bad.astype(dtype))
            )

            worse = new_error > current_error
            lam = jnp.where(worse, i.lam * i.lam_factor, i.lam)
            lam_factor = jnp.where(worse, i.lam_factor * 2.0, i.lam_factor)
            counter = i.counter + 1
            return _I(
                lam=lam, lam_factor=lam_factor, counter=counter,
                converged=i.converged | converged,
                hit_max=counter >= max_iters,
                new_error=new_error,
                R_new=R_new, t_new=t_new, pts_new=pts_new,
            )

        def inner_cond(i: _I):
            return (
                (i.new_error > current_error)
                & ~i.converged
                & ~i.hit_max
            )

        init = _I(
            lam=s.lam, lam_factor=s.lam_factor, counter=s.counter,
            converged=jnp.asarray(False),
            hit_max=s.counter >= max_iters,
            new_error=current_error + 9999.0,
            R_new=s.R, t_new=s.t, pts_new=s.pts,
        )
        fin = lax.while_loop(inner_cond, inner_body, init)

        # Accept if improved (Bundle.cc:504-514).
        good_step = fin.new_error < current_error
        lam = jnp.where(good_step, fin.lam * lambda_good, fin.lam)
        lam_factor = jnp.where(
            good_step, lambda_factor_init, fin.lam_factor
        )
        R_out = jnp.where(good_step, fin.R_new, s.R)
        t_out = jnp.where(good_step, fin.t_new, s.t)
        pts_out = jnp.where(good_step, fin.pts_new, s.pts)

        # Eject outliers (Bundle.cc:516-531).
        meas_valid = s.meas_valid & ~bad
        ejected = s.ejected | bad
        return _S(
            R=R_out, t=t_out, pts=pts_out,
            meas_valid=meas_valid, ejected=ejected,
            lam=lam, lam_factor=lam_factor,
            counter=fin.counter,
            accepted=s.accepted + good_step.astype(jnp.int32),
            converged=fin.converged,
            sigma_sq=sigma_sq,
        )

    def outer_cond(s: _S):
        return ~s.converged & (s.counter < max_iters)

    init = _S(
        R=prob.cam_R, t=prob.cam_t, pts=prob.points,
        meas_valid=meas_valid0,
        ejected=jnp.zeros((N, O), bool),
        lam=jnp.asarray(lambda_init, dtype),
        lam_factor=jnp.asarray(lambda_factor_init, dtype),
        counter=jnp.asarray(0, jnp.int32),
        accepted=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False),
        sigma_sq=jnp.asarray(min_sigma_sq, dtype),
    )
    fin = lax.while_loop(outer_cond, lm_step, init)

    return BAResult(
        cam_R=fin.R, cam_t=fin.t, points=fin.pts,
        meas_valid=fin.meas_valid,
        outlier_meas=fin.ejected,
        point_outliers=jnp.sum(fin.ejected.astype(jnp.int32), axis=-1),
        accepted=fin.accepted,
        converged=fin.converged,
        sigma_squared=fin.sigma_sq,
    )


def reprojection_rms(prob: BAProblem, cam: cam_ops.Camera,
                     R=None, t=None, pts=None):
    """Diagnostic: noise-scaled RMS reprojection error over valid
    measurements."""
    R = prob.cam_R if R is None else R
    t = prob.cam_t if t is None else t
    pts = prob.points if pts is None else pts
    _, _, err_sq, z_bad = _project_all(cam, R, t, pts, prob)
    ok = prob.meas_valid & prob.point_valid[:, None] & ~z_bad
    n = jnp.maximum(jnp.sum(ok), 1)
    return jnp.sqrt(jnp.sum(jnp.where(ok, err_sq, 0.0)) / n)
