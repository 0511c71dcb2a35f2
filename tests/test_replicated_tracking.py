"""Replicated tracking over the virtual 8-device CPU mesh (SURVEY.md §2
parallelism table, row "replicated tracking"): S independent streams,
stream axis sharded over the mesh, shared map replicated. The sharded
result must match running each stream's full TrackFrame hot path
serially on one device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualslam_android_tpu.models import keyframe as kf_mod
from visualslam_android_tpu.ops import lie
from visualslam_android_tpu.parallel import replicated_tracking as rt
from visualslam_android_tpu.utils import fixtures, synthetic

N_STREAMS = 8
N_FRAMES = 3


@pytest.fixture(scope="module")
def streams():
    rng = np.random.default_rng(5)
    config = fixtures.small_config(128, 96)
    slam_map, cam, scene, (R0, t0), n = fixtures.build_fixed_map(config, rng)
    shape = (config.tracker.height, config.tracker.width)
    # Each stream follows its own camera path near the map pose.
    imgs = np.zeros((N_FRAMES, N_STREAMS, *shape), np.float32)
    for s in range(N_STREAMS):
        for f in range(N_FRAMES):
            mu = jnp.asarray(
                [0.02 * s - 0.07, 0.01 * f, 0.015 * s * f / 4,
                 0.01 * np.sin(s), 0.02 * np.cos(f + s), 0.0],
                jnp.float32,
            ) * 0.5
            dR, dt = lie.se3_exp(mu)
            Rk, tk = lie.se3_mul(dR, dt, R0, t0)
            imgs[f, s] = np.asarray(
                synthetic.render(scene, cam, Rk, tk, shape)
            )
    return config, slam_map, cam, (R0, t0), imgs


def test_replicated_matches_serial(streams):
    config, slam_map, cam, (R0, t0), imgs = streams
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(N_STREAMS))

    # Serial reference: each stream stepped alone (batch of one looped
    # on the default device) through the same vmapped step fn.
    state_serial = rt.init_streams(N_STREAMS, R0, t0, config)
    outs_serial = []
    for f in range(N_FRAMES):
        per_stream = []
        new_states = []
        for s in range(N_STREAMS):
            st1 = jax.tree.map(lambda x: x[s : s + 1], state_serial)
            st1_new, out1 = rt.stream_step(
                imgs[f, s : s + 1], st1, slam_map, cam,
                keys[s : s + 1], config,
            )
            new_states.append(st1_new)
            per_stream.append(out1)
        state_serial = jax.tree.map(
            lambda *xs: jnp.concatenate(xs), *new_states
        )
        outs_serial.append(
            jax.tree.map(lambda *xs: jnp.concatenate(xs), *per_stream)
        )

    # Replicated: all streams per step, sharded over the 8-device mesh.
    mesh = rt.make_mesh()
    step = rt.replicated_step_fn(mesh, config)
    state = rt.init_streams(N_STREAMS, R0, t0, config)
    for f in range(N_FRAMES):
        state, out = step(jnp.asarray(imgs[f]), state, slam_map, cam, keys)
        ref = outs_serial[f]
        np.testing.assert_array_equal(
            np.asarray(ref.n_found), np.asarray(out.n_found)
        )
        np.testing.assert_array_equal(
            np.asarray(ref.quality), np.asarray(out.quality)
        )
        np.testing.assert_allclose(
            np.asarray(ref.t), np.asarray(out.t), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ref.R), np.asarray(out.R), atol=1e-4
        )

    # The streams actually tracked (non-trivial outputs).
    assert int(np.asarray(out.n_found).min()) > 10
    assert np.asarray(out.quality).min() >= 1


def test_stream_axis_is_sharded(streams):
    """The compiled step really lays the stream axis out over the mesh
    (one stream per device), not replicated everywhere."""
    config, slam_map, cam, (R0, t0), imgs = streams
    mesh = rt.make_mesh()
    step = rt.replicated_step_fn(mesh, config)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(N_STREAMS))
    state = rt.init_streams(N_STREAMS, R0, t0, config)
    state, out = step(jnp.asarray(imgs[0]), state, slam_map, cam, keys)
    shard_shapes = {
        sh.data.shape for sh in state.sbi_last.template.addressable_shards
    }
    assert len(mesh.devices.ravel()) == 8
    h, w = state.sbi_last.template.shape[1:]
    assert shard_shapes == {(1, h, w)}
