"""Test configuration: force a virtual 8-device CPU platform and float64.

Multi-device sharding logic is exercised on a virtual CPU mesh via
``--xla_force_host_platform_device_count`` (the standard way to test
mesh/sharding code without a TPU pod); float64 is enabled because golden
parity with the CPU/LAPACK reference (BASELINE.md, ≤1e-6 ATE) requires it.
This must run before jax initialises its backends, hence the env mutation at
import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The CI/dev image pins JAX_PLATFORMS=axon via sitecustomize, which overrides
# the env var set above — force CPU through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: DISABLED for the test suite. This
# jaxlib's XLA:CPU executable serialize/deserialize is unreliable in
# long-running processes — with ~150 tests' worth of loaded executables,
# cache writes (executable.serialize) and reads intermittently
# segfault/abort, at deterministic-looking but state-dependent points
# (observed across fresh host-native cache dirs, so not cross-machine
# feature mismatch). Opt back in for quick local iteration with
# GPS_SLAM_TPU_TEST_CACHE=1; see ROADMAP.md for the investigation notes.
if os.environ.get("GPS_SLAM_TPU_TEST_CACHE") == "1":
    _cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Make the repo root importable regardless of pytest invocation directory.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_fixture(name: str) -> str:
    """Path to a shipped KITTI seq-04 fixture file (SURVEY.md §2.3)."""
    return os.path.join(REFERENCE_DIR, name)
