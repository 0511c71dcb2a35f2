"""Map save/load round trip (capability gap filled per SURVEY.md §5)."""

import numpy as np

from visualslam_android_tpu.utils import fixtures, serialization


def test_map_round_trip(tmp_path, rng):
    config = fixtures.small_config()
    slam_map, cam, scene, pose0, n = fixtures.build_fixed_map(config, rng)
    path = tmp_path / "map.npz"
    serialization.save_map(path, slam_map, config)
    loaded, config2 = serialization.load_map(path)
    assert config2 == config
    import jax

    for a, b in zip(jax.tree.leaves(slam_map), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_version_check(tmp_path, rng):
    config = fixtures.small_config()
    slam_map, *_ = fixtures.build_fixed_map(config, rng)
    path = tmp_path / "map.npz"
    serialization.save_map(path, slam_map, config)
    # Corrupt the version.
    data = dict(np.load(path))
    data["__version__"] = np.asarray(999)
    np.savez_compressed(path, **data)
    import pytest

    with pytest.raises(ValueError):
        serialization.load_map(path)
