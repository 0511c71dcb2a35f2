"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware (SURVEY.md §4.4).

Note: some installed pytest plugins (jaxtyping) import jax before this
conftest runs, so setting JAX_PLATFORMS in os.environ alone is too late —
jax binds that env var to its config at import time. Backends initialize
lazily, so updating jax.config here (before any op runs) still takes effect.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA:CPU compiles are slow on this box
# (the AOT kernel set mismatches the host ISA, so everything JITs);
# cached executables make repeat suite runs minutes instead of tens.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
