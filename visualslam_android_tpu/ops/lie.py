"""Batched Lie-group operations: SO(3), SE(3), SO(2), SE(2).

Capability parity with the reference's header-only Lie classes
``mySO3/mySE3/mySO2/mySE2`` (jni/RT.h:15,237,416,491): exp/ln with Taylor
branches near the identity (RT.h:132-208, :318-383), inverse, composition,
and generator fields (RT.h:70-77, :285-295). Unlike the reference's scalar
Eigen code, every op here is batched over arbitrary leading axes and safe to
differentiate (`jnp.where` guards with safe denominators, no data-dependent
branching), so the whole pose pipeline jits.

Conventions: rotations are 3x3 (2x2) matrices; SE(3) elements are dicts-free
(R, t) tuples or stacked [..., 3, 4] matrices; tangent vectors follow PTAM's
ordering mu = [translation, rotation] for SE(3) (RT.h:318-352).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat3(w):
    """Skew-symmetric matrix of w[..., 3] (generator field combination,
    jni/RT.h:70-77)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee3(W):
    """Inverse of hat3: extract w[...,3] from a skew matrix W[...,3,3]."""
    return jnp.stack(
        [W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1
    )


def _sinc_coeffs(theta_sq):
    """A = sin(t)/t, B = (1-cos(t))/t^2 with Taylor branches.

    Mirrors the small-angle handling of mySO3::exp (jni/RT.h:132-163) which
    switches series at t^2 = 1e-8 / 1e-6.
    """
    small = theta_sq < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    a_big = jnp.sin(theta) / jnp.where(small, 1.0, theta)
    b_big = (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta_sq)
    a_small = 1.0 - theta_sq / 6.0 * (1.0 - theta_sq / 20.0)
    b_small = 0.5 * (1.0 - theta_sq / 12.0 * (1.0 - theta_sq / 30.0))
    return jnp.where(small, a_small, a_big), jnp.where(small, b_small, b_big)


def so3_exp(w):
    """Rodrigues formula: w[..., 3] -> R[..., 3, 3] (jni/RT.h:132-163)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B = _sinc_coeffs(theta_sq)
    W = hat3(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_ln(R):
    """Log map R[..., 3, 3] -> w[..., 3] (jni/RT.h:165-208).

    Uses the antisymmetric part for the axis, with the standard
    near-pi fallback via the symmetric part.
    """
    cos_angle = jnp.clip(
        0.5 * (R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0), -1.0, 1.0
    )
    w_asym = 0.5 * vee3(R - jnp.swapaxes(R, -1, -2))
    sin_angle = jnp.linalg.norm(w_asym, axis=-1)
    angle = jnp.arctan2(sin_angle, cos_angle)

    # Regular branch: scale the antisymmetric part by angle/sin(angle).
    safe_sin = jnp.where(sin_angle < _EPS, 1.0, sin_angle)
    scale_reg = jnp.where(
        sin_angle < _EPS,
        # Taylor of angle/sin(angle) around 0 (valid only when angle small).
        1.0 + angle * angle / 6.0,
        angle / safe_sin,
    )
    w_reg = w_asym * scale_reg[..., None]

    # Near-pi branch (cos < 0 roughly): axis from the symmetric part.
    # B = (R + R^T)/2 - cos*I has eigen-structure (1-cos) * axis axis^T.
    Bm = 0.5 * (R + jnp.swapaxes(R, -1, -2)) - cos_angle[..., None, None] * jnp.eye(
        3, dtype=R.dtype
    )
    diag = jnp.stack([Bm[..., 0, 0], Bm[..., 1, 1], Bm[..., 2, 2]], axis=-1)
    denom = jnp.clip(1.0 - cos_angle, _EPS, None)
    axis_sq = jnp.clip(diag / denom[..., None], 0.0, None)
    axis_abs = jnp.sqrt(axis_sq)
    # Fix signs using the off-diagonal products and the antisymmetric part.
    k = jnp.argmax(axis_abs, axis=-1)
    row = jnp.take_along_axis(
        0.5 * (Bm + jnp.swapaxes(Bm, -1, -2)),
        k[..., None, None].repeat(3, axis=-1),
        axis=-2,
    )[..., 0, :]
    axis_signed = jnp.sign(
        jnp.take_along_axis(row, k[..., None], axis=-1)
    ) * row / jnp.clip(
        jnp.linalg.norm(row, axis=-1, keepdims=True), _EPS, None
    )
    # Orient consistently with the antisymmetric part (sin >= 0 convention).
    dot = jnp.sum(axis_signed * w_asym, axis=-1, keepdims=True)
    axis_signed = jnp.where(dot < 0, -axis_signed, axis_signed)
    w_pi = axis_signed * angle[..., None]

    near_pi = cos_angle < -0.9
    return jnp.where(near_pi[..., None], w_pi, w_reg)


def _v_matrix(w):
    """Left Jacobian V of SE(3) exp: integrates rotation for translation
    (jni/RT.h:318-352 uses the equivalent closed form)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B = _sinc_coeffs(theta_sq)
    small = theta_sq < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    c_big = (1.0 - A) / jnp.where(small, 1.0, theta_sq)
    c_small = 1.0 / 6.0 * (1.0 - theta_sq / 20.0 * (1.0 - theta_sq / 42.0))
    C = jnp.where(small, c_small, c_big)
    W = hat3(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def _v_inv_matrix(w):
    """Inverse left Jacobian, used by se3_ln (jni/RT.h:354-383)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    half = 0.5 * theta
    # coef = (1 - theta*cot(theta/2)/2) / theta^2
    cot = jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half))
    coef_big = (1.0 - 0.5 * theta * cot) / jnp.where(small, 1.0, theta_sq)
    coef_small = 1.0 / 12.0 * (1.0 + theta_sq / 60.0 * (1.0 + theta_sq / 42.0))
    coef = jnp.where(small, coef_small, coef_big)
    W = hat3(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + coef[..., None, None] * W2


def se3_exp(mu):
    """mu[..., 6] = [t(3), w(3)] -> (R[...,3,3], t[...,3]).

    PTAM tangent ordering: translation first, rotation second
    (jni/RT.h:318-352; myWLS pose updates use the same ordering).
    """
    rho, w = mu[..., :3], mu[..., 3:]
    R = so3_exp(w)
    V = _v_matrix(w)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_ln(R, t):
    """(R, t) -> mu[..., 6] = [t(3), w(3)] (jni/RT.h:354-383)."""
    w = so3_ln(R)
    Vinv = _v_inv_matrix(w)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, w], axis=-1)


def se3_matrix(R, t):
    """Stack (R, t) into [..., 3, 4]."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


def se3_unstack(T):
    return T[..., :3], T[..., 3]


def se3_mul(Ra, ta, Rb, tb):
    """Composition a * b (apply b first): (RaRb, Ra tb + ta)."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, x):
    """Transform points x[..., 3]."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


def se3_identity(batch_shape=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return R, t


# --- SO(2) / SE(2): used by SmallBlurryImage ESM alignment
# (jni/RT.h:416-489, SmallBlurryImage.cc:99-222,245-333). ---


def so2_exp(theta):
    """theta[...] -> R[..., 2, 2] (jni/RT.h:459-465)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def so2_ln(R):
    return jnp.arctan2(R[..., 1, 0], R[..., 0, 0])


def se2_exp(mu):
    """mu[..., 3] = [tx, ty, theta] -> (R[...,2,2], t[...,2]).

    Matches mySE2::exp semantics (jni/RT.h:491+): translation integrated
    through the rotation's V matrix.
    """
    rho, theta = mu[..., :2], mu[..., 2]
    small = jnp.abs(theta) < 1e-6
    safe = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 1.0 - theta * theta / 6.0, jnp.sin(safe) / safe)
    B = jnp.where(small, 0.5 * theta, (1.0 - jnp.cos(safe)) / safe)
    V = jnp.stack(
        [jnp.stack([A, -B], axis=-1), jnp.stack([B, A], axis=-1)], axis=-2
    )
    return so2_exp(theta), jnp.einsum("...ij,...j->...i", V, rho)


def se2_ln(R, t):
    theta = so2_ln(R)
    small = jnp.abs(theta) < 1e-6
    safe = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 1.0 - theta * theta / 6.0, jnp.sin(safe) / safe)
    B = jnp.where(small, 0.5 * theta, (1.0 - jnp.cos(safe)) / safe)
    det = A * A + B * B
    Vinv = (
        jnp.stack(
            [jnp.stack([A, B], axis=-1), jnp.stack([-B, A], axis=-1)], axis=-2
        )
        / det[..., None, None]
    )
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, theta[..., None]], axis=-1)


def se2_mul(Ra, ta, Rb, tb):
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se2_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_generator_field(pos_h, i):
    """Generator field i applied to homogeneous pos[..., 4] -> [..., 4].

    Mirrors mySE3::generator_field (jni/RT.h:285-295): generators 0-2 are
    translations, 3-5 rotations. Used to form tracking Jacobians
    (jni/TrackerData.h:104-132).
    """
    zeros = jnp.zeros_like(pos_h)
    if i < 3:
        return zeros.at[..., i].set(pos_h[..., 3])
    j, k = (i - 3 + 1) % 3, (i - 3 + 2) % 3
    out = zeros.at[..., j].set(-pos_h[..., k])
    return out.at[..., k].set(pos_h[..., j])
