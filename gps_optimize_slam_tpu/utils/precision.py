"""Matmul-precision control.

On TPU, float32 `dot`/`matmul` default to bfloat16 multiplication (8-bit
mantissa, ~4e-3 relative) on the MXU. For bulk neural-net FLOPs that is the
right trade; for this framework's estimation math (covariance products,
Umeyama cross-covariances, Jacobi rotations, spline solves) it silently
destroys the f32 error budget — measured ~0.4 m trajectory deviation on
KITTI-04 from this alone. Every public jitted entry point is therefore
traced under `jax.default_matmul_precision("highest")` (3-pass bf16 ≡ f32
accuracy); the matrices here are tiny, so the extra passes are free.
"""

from __future__ import annotations

import functools

import jax


def highp(fn):
    """Decorator: trace ``fn`` under highest matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
