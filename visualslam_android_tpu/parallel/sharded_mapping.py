"""Distributed mapping-stage work: re-find and epipolar search sharded
over a device mesh.

SURVEY.md §2 ("parallelism strategies") calls for three distributed
components: sharded global BA (parallel/sharded_ba.py), sharded
re-find / epipolar search (this file), and replicated tracking. Both
kernels here are embarrassingly parallel along their batch axis — no
collectives are needed; the win is purely dividing the work:

- re-find (MapMaker::ReFind_Common, jni/MapMaker.cc:967-1036): each
  device takes a POINT shard (the point store and point-major measurement
  table rows), the target keyframe's pyramid/corner masks are replicated,
  and every device matches its own points. Measurement writes are
  row-local, so the updated measurement table is simply the shards
  reassembled.
- epipolar search (MapMaker::AddPointEpipolar, jni/MapMaker.cc:525-703):
  each device takes a CANDIDATE block of the source keyframe against the
  replicated target level; the dense [C, H, W] ZMSSD over the epipolar
  band is the dominant cost and splits evenly over C.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from visualslam_android_tpu.models import mapmaker
from visualslam_android_tpu.models.map_store import SLAMMap

AXIS = "points"


def _map_specs(slam_map: SLAMMap, axis):
    """PartitionSpecs for a SLAMMap: point-major stores sharded on their
    leading (point) dim, keyframe store and scalars replicated."""
    pts_spec = jax.tree.map(lambda _: P(axis), slam_map.points)
    kfs_spec = jax.tree.map(lambda _: P(), slam_map.keyframes)
    meas_spec = jax.tree.map(lambda _: P(axis), slam_map.meas)
    return SLAMMap(
        points=pts_spec, keyframes=kfs_spec, meas=meas_spec, good=P()
    )


def sharded_refind_in_keyframe(
    slam_map: SLAMMap, kf_idx, cam, point_mask, config, mesh: Mesh,
):
    """mapmaker.refind_in_keyframe with the point axis sharded over
    `mesh`. Requires the point capacity to divide the mesh size (map
    capacities are powers of two). Returns the same
    (slam_map, found, never_retry_new) with point-major outputs
    reassembled across shards."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    N = slam_map.points.n_slots
    assert N % n_dev == 0, (N, n_dev)

    map_in = _map_specs(slam_map, axis)
    out_specs = (map_in, P(axis), P(axis))

    fn = shard_map(
        lambda sm, kfi, msk: mapmaker.refind_in_keyframe(
            sm, kfi, cam, msk, config
        ),
        mesh=mesh,
        in_specs=(map_in, P(), P(axis)),
        out_specs=out_specs,
        check_rep=False,
    )
    return jax.jit(fn)(slam_map, jnp.asarray(kf_idx, jnp.int32), point_mask)


def sharded_refind_scalable(
    slam_map: SLAMMap, kf_idx, cam, point_mask, config, mesh: Mesh,
):
    """Memory-scalable sharded ReFind: the KEYFRAME PYRAMID STORE is
    sharded over the mesh (each device holds K/D pyramids), not
    replicated — the fix for the round-1 design where every device held
    every pyramid (memory-prohibitive at the map sizes that motivate
    sharding). Two explicit phases:

    1. slab exchange: each device extracts the template source slabs for
       points whose source keyframe lives in ITS pyramid shard, then a
       psum_scatter over the point axis hands every device the compact
       [N/D, G, G] slabs for its point shard — the only cross-device
       traffic derived from pyramids (O(N*G^2/D) per device, independent
       of K);
    2. point-sharded search: the single target keyframe's pyramid is
       broadcast from its owner (psum of one non-zero contribution,
       O(H*W)), and each device runs the point-major search core on its
       shard.

    Returns (found [N], pos_zero [N, 2], search_level [N],
    did_subpix [N]) reassembled across shards; the caller inserts
    measurements (point-major, cheap) exactly like refind_in_keyframe.
    """
    axis = mesh.axis_names[0]
    D = mesh.devices.size
    pts, kfs = slam_map.points, slam_map.keyframes
    N, K = pts.n_slots, kfs.n_slots
    assert N % D == 0, (N, D)
    kf_idx = jnp.asarray(kf_idx, jnp.int32)
    R, t = kfs.R[kf_idx], kfs.t[kf_idx]  # tiny: replicate

    pyramid, corner_mask = kfs.pyramid, kfs.corner_mask
    pad = (-K) % D
    if pad:
        # Fewer KF slots than devices: pad the KF axis with empty frames
        # (only the padded STORE layout changes; indices stay valid).
        pad0 = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        pyramid = tuple(pad0(p) for p in pyramid)
        corner_mask = tuple(pad0(c) for c in corner_mask)
        K += pad
    K_loc = K // D

    pts_spec = jax.tree.map(lambda _: P(axis), pts)
    pyr_spec = jax.tree.map(lambda _: P(axis), kfs.pyramid)
    cmask_spec = jax.tree.map(lambda _: P(axis), kfs.corner_mask)

    def extract_phase(pyramid_shard, source_kf, source_level, center):
        me = jax.lax.axis_index(axis)
        lo = me * K_loc
        local_kf = source_kf - lo
        own = (local_kf >= 0) & (local_kf < K_loc)
        safe_kf = jnp.clip(local_kf, 0, K_loc - 1)
        slabs = mapmaker.match.extract_template_slabs(
            pyramid_shard, safe_kf, source_level, center
        )
        zeroed = mapmaker.match.TemplateSlabs(
            regions=jnp.where(own[:, None, None], slabs.regions, 0.0),
            base=jnp.where(own[:, None], slabs.base, 0),
            dims=jnp.where(own[:, None], slabs.dims, 0.0),
        )
        return jax.tree.map(
            lambda x: jax.lax.psum_scatter(
                x, axis, scatter_dimension=0, tiled=True
            ),
            zeroed,
        )

    def search_phase(pts_shard, slabs_shard, active_shard, pyramid_shard,
                     cmask_shard, kf_idx_, R_, t_):
        me = jax.lax.axis_index(axis)
        lo = me * K_loc
        own = (kf_idx_ >= lo) & (kf_idx_ < lo + K_loc)
        safe = jnp.clip(kf_idx_ - lo, 0, K_loc - 1)

        def bcast(stack, is_bool=False):
            sl = jax.lax.dynamic_index_in_dim(
                stack, safe, keepdims=False
            )
            contrib = jnp.where(
                own, sl.astype(jnp.float32) if is_bool else sl, 0
            )
            out = jax.lax.psum(contrib, axis)
            return (out > 0.5) if is_bool else out

        target_pyr = tuple(bcast(p) for p in pyramid_shard)
        target_cmask = tuple(bcast(c, is_bool=True) for c in cmask_shard)
        return mapmaker._refind_search_core(
            pts_shard, slabs_shard, R_, t_, target_pyr, target_cmask, cam,
            active_shard, config,
        )

    extract = shard_map(
        extract_phase, mesh=mesh,
        in_specs=(pyr_spec, P(), P(), P()),
        out_specs=jax.tree.map(lambda _: P(axis), mapmaker.match.TemplateSlabs(
            regions=0, base=0, dims=0)),
        check_rep=False,
    )
    search = shard_map(
        search_phase, mesh=mesh,
        in_specs=(
            pts_spec,
            jax.tree.map(lambda _: P(axis), mapmaker.match.TemplateSlabs(
                regions=0, base=0, dims=0)),
            P(axis), pyr_spec, cmask_spec, P(), P(), P(),
        ),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_rep=False,
    )

    @jax.jit
    def run(pts_, pyramid, cmask, active, kf_idx_, R_, t_):
        slabs = extract(
            pyramid, pts_.source_kf, pts_.source_level, pts_.center
        )
        return search(pts_, slabs, active, pyramid, cmask, kf_idx_, R_, t_)

    already = mapmaker.map_store.point_observed_in(slam_map.meas, kf_idx)
    active = point_mask & pts.live() & ~already
    return run(pts, pyramid, corner_mask, active, kf_idx, R, t)


def sharded_epipolar_search(
    slam_map: SLAMMap, src_kf, target_kf, cam, level: int, config,
    mesh: Mesh,
) -> mapmaker.EpipolarResult:
    """mapmaker.epipolar_search with the candidate axis sharded over
    `mesh`: each device evaluates its candidate block's epipolar-band
    ZMSSD against the replicated target level."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    kfs = slam_map.keyframes
    dtype = kfs.t.dtype

    src_kf = jnp.asarray(src_kf, jnp.int32)
    # Same top-candidate bounding as the unsharded epipolar_search (the
    # parity contract), applied BEFORE the candidate axis is sharded.
    cand_xy, cand_ok = mapmaker.select_top_candidates(
        kfs.cand_xy[level][src_kf].astype(dtype),
        kfs.cand_valid[level][src_kf],
        config.mapmaker.max_epi_candidates,
    )
    C = cand_xy.shape[0]
    pad = (-C) % n_dev
    if pad:
        cand_xy = jnp.pad(cand_xy, ((0, pad), (0, 0)))
        cand_ok = jnp.pad(cand_ok, (0, pad))

    map_repl = jax.tree.map(lambda _: P(), slam_map)
    res_spec = mapmaker.EpipolarResult(
        success=P(axis), pos_w=P(axis), src_uv=P(axis), target_uv=P(axis)
    )

    fn = shard_map(
        lambda sm, cxy, cok: mapmaker.epipolar_search_cands(
            sm, src_kf, jnp.asarray(target_kf, jnp.int32), cam, level,
            config, cxy, cok,
        ),
        mesh=mesh,
        in_specs=(map_repl, P(axis), P(axis)),
        out_specs=res_spec,
        check_rep=False,
    )
    res = jax.jit(fn)(slam_map, cand_xy, cand_ok)
    if pad:
        res = mapmaker.EpipolarResult(*(x[:C] for x in res))
    return res
