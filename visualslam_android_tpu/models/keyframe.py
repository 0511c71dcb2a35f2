"""Frame front-end: build FrameData / FrameExtras and insert keyframes.

Capability parity with KeyFrame::MakeKeyFrame_Lite (jni/KeyFrame.cc:5-51:
pyramid + per-level FAST with thresholds 10/15/15/10) and
MakeKeyFrame_Rest (jni/KeyFrame.cc:53-101: nonmax suppression, Shi-Tomasi
candidates with score > 70 and border 10, SBI + jacs), plus the
scene-depth statistics refresh (MapMaker::RefreshSceneDepth,
jni/MapMaker.cc:1236-1252).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from visualslam_android_tpu.config import SLAMConfig
from visualslam_android_tpu.models import map_store
from visualslam_android_tpu.models.map_store import (
    FrameData,
    FrameExtras,
    KeyFrameStore,
    SLAMMap,
)
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import fast, image, sbi
from visualslam_android_tpu.ops.levels import level_zero_pos


@functools.partial(jax.jit, static_argnames=("config",))
def make_frame(img, config: SLAMConfig) -> FrameData:
    """MakeKeyFrame_Lite equivalent (jni/KeyFrame.cc:5-51): pyramid + dense
    FAST corner masks at the reference's per-level thresholds."""
    tc = config.tracker
    pyramid = tuple(image.make_pyramid(img, tc.n_levels))
    masks, scores = [], []
    for lvl, thresh in zip(pyramid, tc.fast_thresholds):
        m, s = fast.detect(lvl, int(thresh))
        masks.append(m)
        scores.append(s)
    return FrameData(
        pyramid=pyramid, corner_mask=tuple(masks), corner_score=tuple(scores)
    )


@functools.partial(jax.jit, static_argnames=("config",))
def make_frame_extras(frame: FrameData, config: SLAMConfig) -> FrameExtras:
    """MakeKeyFrame_Rest equivalent (jni/KeyFrame.cc:53-101): nonmax
    corners re-scored with barrier 10 (fast_nonmax call, KeyFrame.cc:62),
    Shi-Tomasi candidates (score > 70, border 10), SBI + jacs."""
    tc, mc = config.tracker, config.mapmaker
    nonmax, cand_xy, cand_valid, cand_score = [], [], [], []
    for lvl_idx, (lvl, cmask) in enumerate(
        zip(frame.pyramid, frame.corner_mask)
    ):
        # The reference re-scores with barrier 10 for nonmax regardless of
        # the detection threshold (KeyFrame.cc:62).
        _, score10 = fast.detect(lvl, 10)
        kept = fast.nonmax_3x3(cmask, score10)
        nonmax.append(kept)
        st = image.shi_tomasi_dense(lvl, 3)
        cand_mask = kept & (st > mc.shi_tomasi_threshold)
        xy, valid = fast.top_k_corners(
            cand_mask, st, tc.max_corners_per_level[lvl_idx],
            border=mc.candidate_border,
        )
        cand_xy.append(xy)
        cand_valid.append(valid)
        sc = st[xy[:, 1], xy[:, 0]]
        cand_score.append(jnp.where(valid, sc, 0.0))
    s = sbi.make_sbi(frame.pyramid[-1], tc.sbi_blur)
    return FrameExtras(
        nonmax_mask=tuple(nonmax),
        cand_xy=tuple(cand_xy),
        cand_valid=tuple(cand_valid),
        cand_score=tuple(cand_score),
        sbi_template=s.template,
        sbi_jacs=s.jacs,
    )


def insert_keyframe(
    kfs: KeyFrameStore, slot, frame: FrameData, extras: FrameExtras,
    R, t, fixed=False,
) -> KeyFrameStore:
    """Write a keyframe into slot (functional update)."""
    return kfs._replace(
        valid=kfs.valid.at[slot].set(True),
        fixed=kfs.fixed.at[slot].set(fixed),
        R=kfs.R.at[slot].set(R),
        t=kfs.t.at[slot].set(t),
        pyramid=tuple(
            p.at[slot].set(f) for p, f in zip(kfs.pyramid, frame.pyramid)
        ),
        corner_mask=tuple(
            m.at[slot].set(f)
            for m, f in zip(kfs.corner_mask, frame.corner_mask)
        ),
        cand_xy=tuple(
            c.at[slot].set(x) for c, x in zip(kfs.cand_xy, extras.cand_xy)
        ),
        cand_valid=tuple(
            c.at[slot].set(v)
            for c, v in zip(kfs.cand_valid, extras.cand_valid)
        ),
        sbi_template=kfs.sbi_template.at[slot].set(extras.sbi_template),
        sbi_jacs=kfs.sbi_jacs.at[slot].set(extras.sbi_jacs),
    )


def refresh_scene_depth(slam_map: SLAMMap, kf_idx) -> SLAMMap:
    """Batched MapMaker::RefreshSceneDepth (jni/MapMaker.cc:1236-1252):
    mean/sigma of the depth (camera z) of the points measured in this KF."""
    pts, kfs, meas = slam_map.points, slam_map.keyframes, slam_map.meas
    observed = map_store.point_observed_in(meas, kf_idx) & pts.live()
    pc = (
        jnp.einsum("ij,nj->ni", kfs.R[kf_idx], pts.pos_w) + kfs.t[kf_idx]
    )
    z = pc[:, 2]
    w = observed.astype(z.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(w * z) / n
    sq = jnp.sum(w * z * z) / n
    sigma = jnp.sqrt(jnp.maximum(sq - mean * mean, 1e-12))
    kfs = kfs._replace(
        depth_mean=kfs.depth_mean.at[kf_idx].set(mean),
        depth_sigma=kfs.depth_sigma.at[kf_idx].set(sigma),
    )
    return slam_map._replace(keyframes=kfs)


def candidate_rays(cam: cam_ops.Camera, cand_xy, level):
    """Unit rays for new map points made from candidates
    (MapPoint v3Center_NC / right / down, set at point creation e.g.
    jni/MapMaker.cc:300-320): unproject the candidate center and its
    one-pixel neighbors at the source level, normalized, z toward +1.

    cand_xy [C, 2] level coords; returns (center_nc, right_nc, down_nc)
    each [C, 3] unit vectors, and normal_nc = (0, 0, -1).
    """
    scale = 2.0**level
    zero = level_zero_pos(cand_xy.astype(jnp.float32), level)

    def ray(px):
        m = cam_ops.unproject(cam, px)
        v = jnp.concatenate([m, jnp.ones((*m.shape[:-1], 1), m.dtype)], -1)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    center = ray(zero)
    right = ray(zero + jnp.asarray([scale, 0.0], zero.dtype))
    down = ray(zero + jnp.asarray([0.0, scale], zero.dtype))
    normal = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, -1.0], zero.dtype), center.shape
    )
    return center, right, down, normal
