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
    cand_xy = kfs.cand_xy[level][src_kf].astype(dtype)
    cand_ok = kfs.cand_valid[level][src_kf]
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
