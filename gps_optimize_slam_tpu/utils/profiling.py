"""Profiling/observability utilities (SURVEY §5: the reference has none).

* ``wallclock`` — robust wall-clock timing of jitted callables with
  compile/run separation and forced materialisation. On the tunneled axon
  platform `block_until_ready` can return before execution completes, so a
  leaf is pulled to host to guarantee completion (measured: a 390 ms batch
  "finishing" in 0.1 ms without this).
* ``device_time`` — sustained per-call device time: chains K invocations in
  ONE dispatch via `lax.fori_loop` (key-folded so XLA cannot CSE the body),
  amortising per-dispatch RTT.
* ``trace`` — context manager around jax.profiler for on-device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import numpy as np

import jax
import jax.numpy as jnp


def _force(result) -> None:
    """Guarantee completion: block, then fetch one leaf element."""
    jax.block_until_ready(result)
    leaves = jax.tree.leaves(result)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


def wallclock(fn: Callable, *args, runs: int = 10, **kwargs) -> Dict[str, float]:
    """Time ``fn(*args, **kwargs)`` → dict(compile_s, median_ms, min_ms)."""
    t0 = time.perf_counter()
    _force(fn(*args, **kwargs))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _force(fn(*args, **kwargs))
        times.append((time.perf_counter() - t0) * 1e3)
    return {
        "compile_s": compile_s,
        "median_ms": float(np.median(times)),
        "min_ms": float(np.min(times)),
    }


def device_time(fn_of_key: Callable, chain: int = 20, runs: int = 5) -> float:
    """Sustained per-call device milliseconds for ``fn_of_key(key) -> pytree``.

    The callable must consume the PRNG key (folded per iteration) so the
    loop body cannot be hoisted or CSE'd.
    """

    @jax.jit
    def chained(key):
        def body(i, acc):
            out = fn_of_key(jax.random.fold_in(key, i))
            leaf = jax.tree.leaves(out)[0]
            return acc + jnp.sum(leaf).astype(jnp.float32)

        return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

    key = jax.random.PRNGKey(0)
    _force(chained(key))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _force(chained(key))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times)) / chain


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
