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

Off-CPU each scan runs as ONE Pallas VMEM ladder (ops.pallas_scan) instead
of ~2·log₂n slice/combine fusion rounds — the spline solve is
latency-bound on those rounds at production sizes (measured 0.69 ms for
the three lax scans at all-KITTI batch shapes). The Möbius identity is
projective (the combine normalises), which the ladder's identity padding
respects because the consumed quantity b' = p00/p10 is scale-invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.utils.precision import highp

_MOBIUS_IDENTITY = (1.0, 0.0, 0.0, 1.0)


def _scan_impl(platform: str, identity):
    """lax.associative_scan on CPU; the single-kernel Pallas ladder (with
    lax fallback for ineligible trees) elsewhere. ``platform`` must be the
    COMPILE platform (resolved by the caller — see utils.backend)."""
    if platform not in ("cpu",):
        from gps_optimize_slam_tpu.ops.pallas_scan import make_scan_fn

        return make_scan_fn(identity)
    return jax.lax.associative_scan


def _mobius_combine(e1, e2):
    """(later ∘ earlier) 2×2 homogeneous products with normalisation.

    SoA layout: the 2×2 matrix is four separate (n,) components — batched
    (n,2,2) arrays put the matrix in TPU minor dims where 2 lanes pad to 128
    (same finding as ops.kalman_parallel / linalg3.svd3x3)."""
    p00, p01, p10, p11 = e1
    q00, q01, q10, q11 = e2
    m00 = q00 * p00 + q01 * p10
    m01 = q00 * p01 + q01 * p11
    m10 = q10 * p00 + q11 * p10
    m11 = q10 * p01 + q11 * p11
    scale = jnp.maximum(
        jnp.maximum(jnp.abs(m00), jnp.abs(m01)),
        jnp.maximum(jnp.abs(m10), jnp.abs(m11)),
    )
    inv = 1.0 / jnp.maximum(scale, jnp.finfo(m00.dtype).tiny)
    return (m00 * inv, m01 * inv, m10 * inv, m11 * inv)


def _affine_combine(e1, e2):
    """Affine composition on (alpha, (beta_0..beta_{k-1})) SoA leaves."""
    a1, b1 = e1
    a2, b2 = e2
    return a2 * a1, tuple(a2 * x + y for x, y in zip(b1, b2))


@highp
def tridiag_solve(
    a: jnp.ndarray,  # (n,) sub-diagonal (a[0] ignored/0)
    b: jnp.ndarray,  # (n,) diagonal
    c: jnp.ndarray,  # (n,) super-diagonal (c[-1] ignored/0)
    d: jnp.ndarray,  # (n, k) right-hand sides
    platform: str = "cpu",
) -> jnp.ndarray:
    """Solve the tridiagonal system in O(log n) depth. Multi-RHS.

    ``platform`` gates the single-kernel Pallas ladder swap for the three
    scans and must name the COMPILE platform (callers resolve — "cpu" keeps
    plain lax, the exact path golden tests pin)."""
    n = b.shape[0]
    dtype = b.dtype
    k = d.shape[1]
    mobius_scan = _scan_impl(platform, _MOBIUS_IDENTITY)
    affine_scan = _scan_impl(platform, (1.0, (0.0,) * k))

    # --- 1. pivots b' via projective prefix products (SoA components) ---
    a0 = a.at[0].set(0.0)
    cm1 = jnp.concatenate([jnp.zeros((1,), dtype), c[:-1]])  # c_{i-1}
    # T_i = [[b_i, -a_i·c_{i-1}], [1, 0]]; T_i · [b'_{i-1}, 1]ᵀ ∝ [b'_i, 1]ᵀ
    T = (b, -a0 * cm1, jnp.ones((n,), dtype), jnp.zeros((n,), dtype))
    p00, _, p10, _ = mobius_scan(_mobius_combine, T)
    # Apply to the initial homogeneous vector [1, 0]ᵀ.
    bp = p00 / p10

    # --- 2. forward-eliminated RHS d' (affine scan, per-column leaves) ---
    d_cols = tuple(d[:, i] for i in range(k))
    bpm1 = jnp.concatenate([jnp.ones((1,), dtype), bp[:-1]])
    alpha = -(a0 / bpm1)
    _, dp = affine_scan(_affine_combine, (alpha, d_cols))

    # --- 3. back substitution (reverse affine scan) ---
    alpha_b = (-c / bp).at[-1].set(0.0)
    inv_bp = 1.0 / bp
    beta_b = tuple(x * inv_bp for x in dp)
    _, x = affine_scan(_affine_combine, (alpha_b, beta_b), reverse=True)
    return jnp.stack(x, axis=-1)
