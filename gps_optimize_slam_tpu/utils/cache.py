"""Persistent XLA compilation cache for user-facing entry points.

The fused pipeline programs are expensive to compile (XLA:CPU takes minutes
for the associative-scan paths on small hosts; TPU compiles cross the
tunnel); the persistent cache makes every invocation after the first load
in milliseconds. Keyed by host CPU feature flags: XLA:CPU compiles with
-march=native but omits the exact feature set from its cache key, so
entries from a different machine could load mis-featured code
(SIGILL/segfault risk per XLA's own warning) — the tag partitions them.
"""

from __future__ import annotations

import hashlib
import os


def enable_persistent_cache(cache_root: str | None = None) -> str:
    """Point jax at a per-CPU-feature persistent compilation cache
    directory (created if needed) and return its path."""
    import jax

    tag = "generic"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.sha1(line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    root = cache_root or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "gps_optimize_slam_tpu",
        "jax_cache",
    )
    cache = os.path.join(root, tag)
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache
