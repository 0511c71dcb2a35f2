"""SmallBlurryImage (SBI): tiny blurred frame thumbnails, ESM SE(2)
alignment, and the SE(2)->SE(3) rotation lift.

Capability parity with jni/SmallBlurryImage.{h,cc}: template construction
(MakeFromKF, SmallBlurryImage.cc:20-55: half of pyramid level 3, zero-mean,
Gaussian-blurred), gradient jacobians (MakeJacs :58-78), ZMSSD (:82-94),
4-DoF ESM alignment a la Benhimane & Malis (IteratePosRelToTarget :99-222,
parameters [tx, ty, theta, mean-offset], JTJ accumulated per pixel), and
SE3fromSE2 (:245-333: two points rotated about the center, 3 WLS iterations
on SO(3) with prior 10).

TPU-native design: the per-pixel double loops become whole-image masked
reductions; each ESM iteration is a fixed-shape batched computation inside
``lax.fori_loop``; relocalization scoring vmaps ZMSSD and alignment over all
keyframe SBIs at once (jni/Relocaliser.cc:46-58 scores serially).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import image as img_ops
from visualslam_android_tpu.ops import lie


class SBI(NamedTuple):
    template: jnp.ndarray  # [h, w] zero-mean blurred f32
    jacs: jnp.ndarray      # [h, w, 2] (gx, gy) gradients of template


def make_template(level3_img, blur_sigma=0.75):
    """Half-sample pyramid level 3, subtract the mean, blur
    (SmallBlurryImage.cc:20-55; kernel radius 4 matches the reference's
    9x9 cv::GaussianBlur for sigma <= 2)."""
    small = img_ops.half_sample(level3_img)
    tmpl = small - jnp.mean(small)
    # Fixed radius 4 like the reference's Size(9,9); replicate border.
    return _blur_radius4(tmpl, blur_sigma)


def _blur_radius4(img, sigma):
    x = jnp.arange(-4, 5, dtype=img.dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)

    def conv1d(im, axis):
        pad = [(0, 0)] * im.ndim
        pad[axis] = (4, 4)
        imp = jnp.pad(im, pad, mode="edge")
        out = jnp.zeros_like(im)
        for i in range(9):
            sl = [slice(None)] * im.ndim
            sl[axis] = slice(i, i + im.shape[axis])
            out = out + k[i] * imp[tuple(sl)]
        return out

    return conv1d(conv1d(img, -1), -2)


def make_jacs(template):
    """Central differences WITHOUT the 1/2 factor, zero on the 1px border
    (MakeJacs, SmallBlurryImage.cc:58-78)."""
    h, w = template.shape
    gx = jnp.zeros_like(template)
    gx = gx.at[:, 1:-1].set(template[:, 2:] - template[:, :-2])
    gy = jnp.zeros_like(template)
    gy = gy.at[1:-1, :].set(template[2:, :] - template[:-2, :])
    ys, xs = jnp.mgrid[0:h, 0:w]
    interior = (xs >= 1) & (xs < w - 1) & (ys >= 1) & (ys < h - 1)
    return jnp.stack(
        [jnp.where(interior, gx, 0.0), jnp.where(interior, gy, 0.0)], axis=-1
    )


def make_sbi(level3_img, blur_sigma=0.75) -> SBI:
    tmpl = make_template(level3_img, blur_sigma)
    return SBI(template=tmpl, jacs=make_jacs(tmpl))


def zmssd(a_template, b_template):
    """Plain SSD of zero-mean templates (SmallBlurryImage.cc:82-94).
    Batched over leading axes."""
    d = a_template - b_template
    return jnp.sum(d * d, axis=(-2, -1))


_OUT_OF_IMAGE = -9e20


def esm_align(cur_template, target: SBI, n_iterations=6):
    """Align `cur_template` to `target` with 4-DoF ESM
    (IteratePosRelToTarget, SmallBlurryImage.cc:99-222).

    Returns (se2[3] = [tx, ty, theta] of the C-to-C warp about the image
    center, final_score). The mean-offset nuisance parameter is estimated
    internally as in the reference.
    """
    h, w = cur_template.shape
    dtype = cur_template.dtype
    center = jnp.array([w / 2.0, h / 2.0], dtype)
    ys, xs = jnp.mgrid[0:h, 0:w]
    grid = jnp.stack([xs, ys], axis=-1).astype(dtype)  # [h, w, 2] (x, y)
    interior = (
        (xs >= 1) & (xs < w - 1) & (ys >= 1) & (ys < h - 1)
    )

    tj = target.jacs

    def body(_, state):
        se2_ctoc, mean_offset, _ = state
        # se2XForm = WfromC * CtoC * WfromC^-1 (translation by center).
        Rc, tc = lie.se2_exp(se2_ctoc)
        t_x = tc + center - Rc @ center
        # Warp current template: warped(x, y) = cur(t_x + Rc @ (x, y)).
        src = t_x + jnp.einsum("ij,hwj->hwi", Rc, grid)
        src_ok = (
            (src[..., 0] >= 0)
            & (src[..., 1] >= 0)
            & (src[..., 0] < w - 1)
            & (src[..., 1] < h - 1)
        )
        warped = jnp.where(
            src_ok, img_ops.bilinear_sample(cur_template, src), _OUT_OF_IMAGE
        )
        # A pixel participates if it and its 4-neighbors are in-warp
        # (the reference's l+r+u+d+here < -9999.9 check, :160-165).
        nsum = (
            warped
            + jnp.roll(warped, 1, axis=1)
            + jnp.roll(warped, -1, axis=1)
            + jnp.roll(warped, 1, axis=0)
            + jnp.roll(warped, -1, axis=0)
        )
        valid = interior & (nsum > -9999.9)

        gx_cur = jnp.roll(warped, -1, axis=1) - jnp.roll(warped, 1, axis=1)
        gy_cur = jnp.roll(warped, -1, axis=0) - jnp.roll(warped, 1, axis=0)
        gx = 0.25 * (gx_cur + tj[..., 0])
        gy = 0.25 * (gy_cur + tj[..., 1])

        jac_rot = -(ys.astype(dtype) - center[1]) * gx + (
            xs.astype(dtype) - center[0]
        ) * gy
        ones = jnp.ones_like(gx)
        J = jnp.stack([gx, gy, jac_rot, ones], axis=-1)  # [h, w, 4]

        diff = warped - target.template + mean_offset
        vf = valid.astype(dtype)
        score = jnp.sum(vf * diff * diff)

        Jv = J * vf[..., None]
        JTJ = jnp.einsum("hwi,hwj->ij", Jv, J)
        JTe = jnp.einsum("hwi,hw->i", Jv, diff)
        update = jnp.linalg.solve(
            JTJ + 1e-8 * jnp.eye(4, dtype=dtype), JTe
        )

        Ru, tu = lie.se2_exp(
            jnp.concatenate([-update[:2], -update[2:3]])
        )
        Rc2, tc2 = lie.se2_mul(Rc, tc, Ru, tu)
        return lie.se2_ln(Rc2, tc2), mean_offset - update[3], score

    init = (jnp.zeros(3, dtype), jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
    se2, _, score = lax.fori_loop(0, n_iterations, body, init)
    return se2, score


def se3_from_se2(se2, cam_full: cam_ops.Camera, sbi_shape):
    """Lift an SBI-plane SE(2) to a camera SO(3) rotation
    (SE3fromSE2, SmallBlurryImage.cc:245-333): project two points +/-5px
    about the center through the SBI-scaled camera and run 3 WLS
    iterations on SO(3) with prior 10.

    Returns (R[3,3], t=0[3]).
    """
    h, w = sbi_shape
    dtype = se2.dtype
    scale = w / cam_full.size[0]
    cam = cam_ops.scale_camera(cam_full, scale)
    center = jnp.array([w / 2.0, h / 2.0], dtype)
    pts = jnp.array([[5.0, 0.0], [-5.0, 0.0]], dtype)
    R2, t2 = lie.se2_exp(se2)
    turned = center + jnp.einsum("ij,nj->ni", R2, pts) + t2  # [2, 2]
    orig = center + pts
    m_orig = cam_ops.unproject(cam, orig)  # [2, 2] z=1 plane
    p3 = jnp.concatenate([m_orig, jnp.ones((2, 1), dtype)], axis=-1)  # [2, 3]

    def body(_, R):
        pc = jnp.einsum("ij,nj->ni", R, p3)  # [2, 3]
        m = pc[:, :2] / pc[:, 2:3]
        px, Jpx = cam_ops.project_derivs(cam, m)
        err = (turned - px).reshape(-1)  # [4]
        inv_z = 1.0 / pc[:, 2]
        # d m / d w via SO3 generator fields (SmallBlurryImage.cc:303-315).
        rows = []
        for g_idx in range(3):
            gen = jnp.stack(
                [
                    lie.se3_generator_field(
                        jnp.concatenate([pc[n], jnp.ones(1, dtype)]), 3 + g_idx
                    )[:3]
                    for n in range(2)
                ]
            )  # [2, 3]
            dm = jnp.stack(
                [
                    (gen[:, 0] - pc[:, 0] * gen[:, 2] * inv_z) * inv_z,
                    (gen[:, 1] - pc[:, 1] * gen[:, 2] * inv_z) * inv_z,
                ],
                axis=-1,
            )  # [2, 2]
            rows.append(jnp.einsum("nab,nb->na", Jpx, dm).reshape(-1))  # [4]
        J = jnp.stack(rows, axis=-1)  # [4, 3]
        JTJ = J.T @ J + 10.0 * jnp.eye(3, dtype=dtype)
        JTe = J.T @ err
        res = jnp.linalg.solve(JTJ, JTe)
        return lie.so3_exp(res) @ R

    R = lax.fori_loop(0, 3, body, jnp.eye(3, dtype=dtype))
    return R, jnp.zeros(3, dtype)


def score_against_all(cur_template, kf_templates, kf_valid):
    """ZMSSD of the current SBI against every keyframe SBI at once —
    the batched replacement for Relocaliser::ScoreKFs
    (jni/Relocaliser.cc:46-58). Invalid slots score +inf."""
    scores = zmssd(kf_templates, cur_template[None])
    return jnp.where(kf_valid, scores, jnp.inf)
