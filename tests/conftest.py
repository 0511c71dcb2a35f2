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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Pin the CPU codegen ISA to a baseline the host always has. This is what
# makes the PERSISTENT COMPILATION CACHE safe on CPU: without it XLA:CPU
# AOT-compiles against the build machine's feature set and deserialized
# executables could SIGILL on this host (the r2-r4 reason the cache was
# TPU-only, which left the integration tier recompiling ~an hour of
# programs every run). With compile and load pinned to the same ISA the
# cache round-trips reliably (verified cross-process), and the suite's
# big module fixtures compile once per TREE instead of once per RUN.
if "xla_cpu_max_isa" not in _flags:
    _flags = (_flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = _flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
