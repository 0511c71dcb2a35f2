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


def test_text_export_matches_reference_format(tmp_path, rng):
    """SaveMap-style dump (jni/MapMaker.cc:1254-1286): map.dump lines are
    'x y z  level'; keyframes/<i>.info is the 3x4 [R|t]."""
    config = fixtures.small_config()
    slam_map, *_ = fixtures.build_fixed_map(config, rng)
    serialization.export_map_text(str(tmp_path), slam_map)

    n_live = int(np.asarray(slam_map.points.live()).sum())
    with open(tmp_path / "map.dump") as f:
        lines = [l.split() for l in f if l.strip()]
    assert len(lines) == n_live
    live_idx = np.nonzero(np.asarray(slam_map.points.live()))[0]
    pos = np.asarray(slam_map.points.pos_w)[live_idx]
    got = np.asarray([[float(v) for v in l[:3]] for l in lines])
    np.testing.assert_allclose(got, pos, rtol=1e-6)
    levels = [int(l[3]) for l in lines]
    np.testing.assert_array_equal(
        levels, np.asarray(slam_map.points.source_level)[live_idx]
    )

    kf_idx = np.nonzero(np.asarray(slam_map.keyframes.valid))[0]
    for i in kf_idx:
        rows = []
        with open(tmp_path / "keyframes" / f"{i}.info") as f:
            for line in f:
                rows.append([float(v) for v in line.split()])
        M = np.asarray(rows)
        assert M.shape == (3, 4)
        np.testing.assert_allclose(
            M[:, :3], np.asarray(slam_map.keyframes.R)[i], rtol=1e-6
        )
        np.testing.assert_allclose(
            M[:, 3], np.asarray(slam_map.keyframes.t)[i], rtol=1e-6
        )
