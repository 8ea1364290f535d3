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

# Persistent compilation cache: the associative-scan programs are expensive
# to compile; caching them across test processes cuts suite time ~10x.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
# Threshold 0: tests drive much of the library EAGERLY, so a module's cost
# is hundreds of sub-second per-op compiles — with the default 1 s floor
# none of them persisted and every clear_caches() re-paid them all.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# XLA:CPU JIT stability: this jaxlib segfaults in backend_compile (or in
# executable serialize/deserialize) on whichever program is compiled after
# ~100 tests' worth of live executables accumulate in one process — the
# crash point moves with test order, every ≤half-suite run passes, and a
# cache-disabled run crashes identically, so it is the cumulative live JIT
# state, not the cache (see ROADMAP.md; standalone repro attempt:
# tools/repro_jaxlib_crash.py). Mitigation: drop every live compiled
# program between test modules; the persistent cache makes the recompiles
# cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_live_jit_state_per_module():
    # Re-pin the suite cache each module: the in-process CLI tests call
    # utils.cache.enable_persistent_cache(), which would otherwise repoint
    # every later module at the user cache with the 1 s threshold (leaving
    # the suite's eager-op compiles uncached — measured +4 min of suite).
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    yield
    # Measured both cadences on this host: clearing every 4th module (to
    # save re-deserializations) is a net LOSS (13:39 vs 12:17 suite) — the
    # accumulated live executables degrade XLA:CPU well before they crash
    # it (test_kalman_parallel golden parity 24 s → 75 s). Per-module
    # clearing is both the stability mitigation and the fast option.
    # GPS_SLAM_KEEP_JIT_STATE=1 disables it — the standalone repro hook for
    # the crash (run the full suite with it set; see ROADMAP).
    if not os.environ.get("GPS_SLAM_KEEP_JIT_STATE"):
        jax.clear_caches()

# Make the repo root importable regardless of pytest invocation directory.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_fixture(name: str) -> str:
    """Path to a shipped KITTI seq-04 fixture file (SURVEY.md §2.3)."""
    return os.path.join(REFERENCE_DIR, name)
