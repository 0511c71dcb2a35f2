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
# NOTE: do NOT enable the persistent compilation cache here. On this host
# XLA:CPU executables sometimes SEGFAULT when deserialized from the cache
# (reproducible in compilation_cache.get_executable_and_time — the
# AOT machine-feature mismatch the cpu_aot_loader warns about). The cache
# stays enabled for the TPU bench (bench.py), where reload is reliable
# and saves a ~20-minute compile.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
