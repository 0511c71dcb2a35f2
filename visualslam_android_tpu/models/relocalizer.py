"""Relocalization after lost tracking.

Capability parity with jni/Relocaliser.{h,cc}: ZMSSD the current frame's
SmallBlurryImage against every keyframe's (ScoreKFs, Relocaliser.cc:46-58 —
here one batched reduction instead of a serial loop), ESM-align to the best
match (6 iterations), lift the SE(2) to a camera rotation and compose with
the keyframe pose (AttemptRecovery :17-42), accept when the alignment score
is below 9e6 (:37 — deliberately permissive, acknowledged in the reference,
SURVEY.md §6). The reference's `mnBest = true` constructor bug (ctor :10)
is not replicated.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from visualslam_android_tpu.models.map_store import SLAMMap
from visualslam_android_tpu.ops import camera as cam_ops
from visualslam_android_tpu.ops import lie
from visualslam_android_tpu.ops import sbi as sbi_ops


class RelocResult(NamedTuple):
    success: jnp.ndarray  # [] bool (score < 9e6 and any valid KF)
    R: jnp.ndarray        # [3, 3] recovered camera-from-world
    t: jnp.ndarray        # [3]
    best_kf: jnp.ndarray  # [] int32
    score: jnp.ndarray    # [] ESM final score


@jax.jit
def attempt_recovery(
    slam_map: SLAMMap, cur_sbi_template, cam: cam_ops.Camera,
    max_score=9e6,
) -> RelocResult:
    kfs = slam_map.keyframes
    scores = sbi_ops.score_against_all(
        cur_sbi_template, kfs.sbi_template, kfs.valid
    )
    best = jnp.argmin(scores)
    target = sbi_ops.SBI(
        template=kfs.sbi_template[best], jacs=kfs.sbi_jacs[best]
    )
    se2, esm_score = sbi_ops.esm_align(cur_sbi_template, target, 6)
    Rr, tr = sbi_ops.se3_from_se2(se2, cam, cur_sbi_template.shape)
    R, t = lie.se3_mul(Rr, tr, kfs.R[best], kfs.t[best])
    any_kf = jnp.any(kfs.valid)
    return RelocResult(
        success=any_kf & (esm_score < max_score),
        R=R, t=t, best_kf=best.astype(jnp.int32), score=esm_score,
    )
