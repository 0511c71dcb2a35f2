"""Sharded mapping-stage correctness vs the single-device result on the
virtual 8-device CPU mesh (SURVEY.md §2: "sharded re-find/epipolar
search"; §4.4 multi-host-without-a-cluster strategy)."""

import jax.numpy as jnp
import numpy as np

from visualslam_android_tpu.models import map_store, mapmaker
from visualslam_android_tpu.parallel import sharded_ba, sharded_mapping

from tests.test_mapmaker import two_kf_map  # fixture  # noqa: F401


def test_sharded_refind_matches_single_device(two_kf_map):  # noqa: F811
    config, slam_map, cam, scene, (R0, t0), (R1, t1), n = two_kf_map
    sm1, found1, never1 = mapmaker.refind_in_keyframe(
        slam_map, 1, cam, slam_map.points.valid, config
    )
    mesh = sharded_ba.make_mesh()
    sm8, found8, never8 = sharded_mapping.sharded_refind_in_keyframe(
        slam_map, 1, cam, slam_map.points.valid, config, mesh
    )
    np.testing.assert_array_equal(np.asarray(found1), np.asarray(found8))
    np.testing.assert_array_equal(np.asarray(never1), np.asarray(never8))
    np.testing.assert_array_equal(
        np.asarray(sm1.meas.valid), np.asarray(sm8.meas.valid)
    )
    f = np.asarray(found1)
    np.testing.assert_allclose(
        np.asarray(sm1.meas.uv)[f], np.asarray(sm8.meas.uv)[f], atol=1e-4
    )


def test_sharded_epipolar_matches_single_device(two_kf_map):  # noqa: F811
    config, slam_map, cam, scene, (R0, t0), (R1, t1), n = two_kf_map
    sm = mapmaker.thin_candidates(slam_map, 1, 1, radius=10)
    res1 = mapmaker.epipolar_search(sm, 1, 0, cam, 1, config)
    mesh = sharded_ba.make_mesh()
    res8 = sharded_mapping.sharded_epipolar_search(
        sm, 1, 0, cam, 1, config, mesh
    )
    np.testing.assert_array_equal(
        np.asarray(res1.success), np.asarray(res8.success)
    )
    s = np.asarray(res1.success)
    np.testing.assert_allclose(
        np.asarray(res1.pos_w)[s], np.asarray(res8.pos_w)[s], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res1.target_uv)[s], np.asarray(res8.target_uv)[s],
        atol=1e-3,
    )


def test_scalable_refind_matches_single_device(two_kf_map):  # noqa: F811
    """sharded_refind_scalable (pyramid store SHARDED over the mesh, slab
    exchange + target broadcast) must reproduce the replicated-map refind
    search exactly."""
    config, slam_map, cam, scene, (R0, t0), (R1, t1), n = two_kf_map
    sm1, found1, never1 = mapmaker.refind_in_keyframe(
        slam_map, 1, cam, slam_map.points.valid, config
    )
    mesh = sharded_ba.make_mesh()
    found, pos_zero, search_level, did_subpix = (
        sharded_mapping.sharded_refind_scalable(
            slam_map, 1, cam, slam_map.points.valid, config, mesh
        )
    )
    np.testing.assert_array_equal(np.asarray(found1), np.asarray(found))
    # Reconstruct the measurement insertion the replicated path did.
    meas = mapmaker.add_measurements_batch(
        slam_map.meas, found, 1, pos_zero, search_level,
        mapmaker.SRC_REFIND, did_subpix,
    )
    np.testing.assert_array_equal(
        np.asarray(sm1.meas.valid), np.asarray(meas.valid)
    )
    f = np.asarray(found1)
    np.testing.assert_allclose(
        np.asarray(sm1.meas.uv)[f], np.asarray(meas.uv)[f], atol=1e-4
    )
