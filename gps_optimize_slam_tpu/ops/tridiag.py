"""Parallel tridiagonal solver: the Thomas algorithm as associative scans.

The spline systems in ops.alignment are (block-)tridiagonal after
eliminating the not-a-knot corners; a dense solve is O(M³) and unusable at
the 10⁴-10⁵ GPS samples the scale-out configs target. The classic Thomas
algorithm is O(M) but sequential; here each of its three recurrences is
re-expressed as an associative scan → O(M) work, O(log M) depth, pure XLA:

1. forward pivots  b'_i = b_i − a_i·c_{i-1}/b'_{i-1} — a Möbius (linear
   fractional) recurrence, lifted to 2×2 matrix prefix products on
   homogeneous coordinates (normalised per combine; projective scale
   invariance keeps the normalisation associative);
2. forward RHS     d'_i = d_i − (a_i/b'_{i-1})·d'_{i-1} — affine scan;
3. back-substitution x_i = (d'_i − c_i·x_{i+1})/b'_i — reverse affine scan.

Rows with a_i = c_i = 0 (identity/passive rows, segment boundaries) reset
all three recurrences, so independent segments decouple exactly — no
special casing needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.utils.precision import highp


def _mobius_combine(e1, e2):
    """(later ∘ earlier) 2×2 homogeneous products with normalisation."""
    m = e2 @ e1
    scale = jnp.max(jnp.abs(m), axis=(-1, -2), keepdims=True)
    return m / jnp.maximum(scale, jnp.finfo(m.dtype).tiny)


def _affine_combine(e1, e2):
    a1, b1 = e1
    a2, b2 = e2
    return a2 * a1, a2 * b1 + b2


@highp
def tridiag_solve(
    a: jnp.ndarray,  # (n,) sub-diagonal (a[0] ignored/0)
    b: jnp.ndarray,  # (n,) diagonal
    c: jnp.ndarray,  # (n,) super-diagonal (c[-1] ignored/0)
    d: jnp.ndarray,  # (n, k) right-hand sides
) -> jnp.ndarray:
    """Solve the tridiagonal system in O(log n) depth. Multi-RHS."""
    n = b.shape[0]
    dtype = b.dtype

    # --- 1. pivots b' via projective prefix products ---
    a0 = a.at[0].set(0.0)
    cm1 = jnp.concatenate([jnp.zeros((1,), dtype), c[:-1]])  # c_{i-1}
    T = jnp.stack(
        [
            jnp.stack([b, -a0 * cm1], axis=-1),
            jnp.stack([jnp.ones((n,), dtype), jnp.zeros((n,), dtype)], axis=-1),
        ],
        axis=-2,
    )  # (n, 2, 2); T_i · [b'_{i-1}, 1]ᵀ ∝ [b'_i, 1]ᵀ
    P = jax.lax.associative_scan(_mobius_combine, T)
    # Apply to the initial homogeneous vector [1, 0]ᵀ.
    bp = P[:, 0, 0] / P[:, 1, 0]

    # --- 2. forward-eliminated RHS d' (affine scan) ---
    bpm1 = jnp.concatenate([jnp.ones((1,), dtype), bp[:-1]])
    w = a0 / bpm1
    alpha = -w[:, None]
    _, dp = jax.lax.associative_scan(_affine_combine, (alpha, d))

    # --- 3. back substitution (reverse affine scan) ---
    alpha_b = (-c / bp)[:, None].at[-1].set(0.0)
    beta_b = dp / bp[:, None]
    _, x = jax.lax.associative_scan(_affine_combine, (alpha_b, beta_b), reverse=True)
    return x
