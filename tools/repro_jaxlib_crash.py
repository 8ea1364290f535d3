#!/usr/bin/env python
"""Standalone repro attempt for the XLA:CPU long-process JIT crash.

Context (ROADMAP.md, tests/conftest.py): during round-2 development this
jaxlib segfaulted inside ``backend_compile`` (or executable
serialize/deserialize) on whichever program compiled after roughly one
hundred tests' worth of live executables had accumulated in a single
process. Observed properties:

* the crash point MOVED with test order (it is the cumulative state, not
  any one program);
* every run of ≤ half the suite passed;
* disabling the persistent compilation cache did not help (ruling the
  cache out);
* an autouse module-scoped ``jax.clear_caches()`` made the full suite
  stable — the standing mitigation.

ROUND-5 UPDATE: the crash now has a deterministic SUITE-LEVEL repro —
``GPS_SLAM_KEEP_JIT_STATE=1 python -m pytest tests/ -q`` (env var disables
the conftest mitigation) aborts 2/2 runs at ~60-68% of the suite with
"Fatal Python error: Aborted" inside
``jax/_src/compilation_cache.py get_executable_and_time`` (persistent-
cache executable deserialize) during a ``fuse_core`` compile. Use that for
an upstream report; this script remains the (still non-reproducing)
minimal-stream attempt.

This script reproduces those conditions WITHOUT the test suite: it
compiles a stream of DISTINCT non-trivial programs (associative-scan
Kalman-like bodies, spline solves, vmapped RANSAC-like bodies — the same
program families the suite compiles) in one process, holding every
executable live, until either a crash (repro: exit via signal) or a bound
is hit (no repro on this jaxlib: prints CLEAN).

    python tools/repro_jaxlib_crash.py [--programs 400] [--clear-every 0]

``--clear-every K > 0`` applies the mitigation (clear_caches every K
programs) — expected to survive arbitrarily long. Run under a crash
handler to collect the backtrace for an upstream jax/jaxlib issue:

    ulimit -c unlimited; python tools/repro_jaxlib_crash.py || echo "exit $?"
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def build_program(i: int):
    """A distinct moderately-sized program per i (shape + constant salt),
    shaped like the suite's hot families: scans, associative scans, vmapped
    least squares, small linear solves."""
    import jax
    import jax.numpy as jnp

    n = 64 + (i % 13) * 8
    salt = 1.0 + 0.01 * i
    fam = i % 4

    if fam == 0:

        @jax.jit
        def prog(x):
            def step(c, xi):
                c = c * 0.99 + xi * salt
                return c, c

            _, ys = jax.lax.scan(step, jnp.zeros(3), x)
            return jnp.sum(ys)

        arg = jnp.asarray(np.random.default_rng(i).normal(size=(n, 3)))
    elif fam == 1:

        @jax.jit
        def prog(x):
            def comb(a, b):
                return {"m": a["m"] * b["m"], "v": a["v"] * b["m"] + b["v"] * salt}

            e = {"m": x[:, 0], "v": x[:, 1]}
            out = jax.lax.associative_scan(comb, e)
            return jnp.sum(out["v"])

        arg = jnp.asarray(np.random.default_rng(i).normal(size=(n, 2)))
    elif fam == 2:

        @jax.jit
        def prog(x):
            def trial(row):
                A = jnp.stack([row**k for k in range(3)], -1)
                c, *_ = jnp.linalg.lstsq(A, row * salt)
                return jnp.sum(c)

            return jnp.sum(jax.vmap(trial)(x))

        arg = jnp.asarray(np.random.default_rng(i).normal(size=(16, n)))
    else:

        @jax.jit
        def prog(x):
            A = x @ x.T + salt * jnp.eye(x.shape[0], dtype=x.dtype)
            return jnp.sum(jnp.linalg.solve(A, x))

        arg = jnp.asarray(np.random.default_rng(i).normal(size=(24, n)))
    return prog, arg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs", type=int, default=400)
    ap.add_argument(
        "--clear-every",
        type=int,
        default=0,
        help="apply the conftest mitigation every K programs (0 = off)",
    )
    args = ap.parse_args()

    import jax

    live = []  # hold every executable live, like one long pytest process
    for i in range(args.programs):
        prog, arg = build_program(i)
        out = prog(arg)  # compile happens here — the observed crash site
        jax.block_until_ready(out)
        live.append((prog, arg))
        if args.clear_every and (i + 1) % args.clear_every == 0:
            jax.clear_caches()
            live.clear()
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{args.programs} programs compiled+live", flush=True)

    print(
        f"CLEAN: {args.programs} distinct live executables in one process, "
        f"no crash on jaxlib {jax.__version__} "
        f"(mitigation every {args.clear_every or 'never'})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
