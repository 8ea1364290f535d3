"""Small fixed-size linear algebra owned by the framework.

``svd3x3`` replaces ``jnp.linalg.svd`` for the 3×3 covariance in Umeyama:
XLA's general SVD lowering on the TPU backend loses catastrophic precision
in float32 on ill-conditioned 3×3 matrices (measured: rotation entries off
by ~0.9 on the KITTI-04 covariance, whose σ₁/σ₃ ≈ 1e5 — trajectory almost
planar). A ONE-SIDED (Hestenes) Jacobi SVD is branch-free, uses only
+ * / sqrt (no transcendentals — immune to the platform's degraded
transcendental emulation), achieves high RELATIVE accuracy even for tiny
singular values (it never forms HᵀH, so the condition number is not
squared), converges to float precision in a fixed number of sweeps for 3×3,
and fuses/batches trivially — 1000 RANSAC trials become one elementwise
program instead of 1000 general-SVD calls.

Rutishauser rotation (classic Jacobi): τ=(β−α)/(2γ),
t = sign(τ)/(|τ|+√(1+τ²)), c=1/√(1+t²), s=t·c.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from gps_optimize_slam_tpu.utils.precision import highp

_JACOBI_SWEEPS = 12  # 3×3 converges in ~4 sweeps; extras are nearly free


def inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate/cofactor) inverse of 3×3 matrices, batched.

    XLA lowers ``jnp.linalg.inv`` on (B,3,3) to a generic batched LU — slow
    on TPU for millions of tiny matrices (the associative Kalman combine
    inverts one per element per scan level). The adjugate form is ~20
    fused elementwise ops on the VPU.
    """
    m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    m10, m11, m12 = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    m20, m21, m22 = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    c00 = m11 * m22 - m12 * m21
    c01 = m02 * m21 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c10 = m12 * m20 - m10 * m22
    c11 = m00 * m22 - m02 * m20
    c12 = m02 * m10 - m00 * m12
    c20 = m10 * m21 - m11 * m20
    c21 = m01 * m20 - m00 * m21
    c22 = m00 * m11 - m01 * m10
    det = m00 * c00 + m01 * c10 + m02 * c20
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def _rotation(alpha, beta, gamma, eps):
    """Branch-free (c, s) that orthogonalises a column pair with
    ⟨a_p,a_p⟩=α, ⟨a_q,a_q⟩=β, ⟨a_p,a_q⟩=γ; identity when |γ| ~ 0."""
    small = jnp.abs(gamma) <= eps * jnp.sqrt(alpha * beta) + jnp.finfo(
        gamma.dtype
    ).tiny
    gamma_safe = jnp.where(small, 1.0, gamma)
    tau = (beta - alpha) / (2.0 * gamma_safe)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)
    return c, s


@highp
def svd3x3(
    H: jnp.ndarray, unroll: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SVD of 3×3 matrices: H = U @ diag(S) @ Vt, batched over leading dims.

    Thin packing wrapper over ``svd3x3_soa`` (see there for the algorithm
    and the TPU layout rationale; ``unroll`` there for when to unroll).
    """
    cols = tuple(tuple(H[..., r, c] for r in range(3)) for c in range(3))
    u0, u1, u2, (s0, s1, s2), v0, v1, v2 = svd3x3_soa(cols, unroll=unroll)
    U = jnp.stack(
        [jnp.stack(u0, axis=-1), jnp.stack(u1, axis=-1), jnp.stack(u2, axis=-1)],
        axis=-1,
    )
    S = jnp.stack([s0, s1, s2], axis=-1)
    Vt = jnp.stack(
        [jnp.stack(v0, axis=-1), jnp.stack(v1, axis=-1), jnp.stack(v2, axis=-1)],
        axis=-2,
    )
    return U, S, Vt


def svd3x3_soa(cols, unroll: bool = False):
    """SVD on structure-of-arrays 3×3 matrices.

    ``unroll=True`` inlines the Jacobi sweeps as straight-line code instead
    of a ``fori_loop`` — same operations in the same order (few-ulp
    differences from XLA's per-compilation FMA/fusion choices: measured
    ≤1e-14 f64 / ≤2e-6 f32 on unit-normal inputs), but XLA
    fuses the whole sweep chain into ~one kernel instead of one launch
    per iteration. Use for SCALAR (non-vmapped)
    calls on a latency-critical path — the round-5 stage split measured
    the RANSAC tail's two sequential scalar SVD chains at ~0.47 ms of the
    0.99 ms fused step while the vmapped thousand-trial stages were free.
    Keep the default (fori) inside vmapped trial fits: the unrolled form
    ballooned TPU compile time there (the original reason for the loop).

    ``cols`` is the matrix as 3 columns, each a 3-tuple of (...) arrays.
    Returns ``(u0, u1, u2, (s0, s1, s2), v0, v1, v2)`` — U and V columns as
    3-tuples, singular values descending, H = U·diag(S)·Vᵀ.

    One-sided Jacobi: right-rotate column pairs of A (=H·V accumulated)
    until mutually orthogonal; then σᵢ=‖aᵢ‖, uᵢ=aᵢ/σᵢ. Near-zero columns
    are completed by cross products — their sign may differ from LAPACK's,
    which is exactly the ambiguity the Umeyama/Kabsch det-correction
    absorbs (paired sign flips of (uᵢ, vᵢ) leave the SVD valid).

    LAYOUT: everything is 18 structure-of-arrays components — batched
    (B,3,3) arrays put the matrix in the minor dims, where TPU tiling pads
    3 lanes to 128 and every rotation becomes a padded matmul (measured:
    16.8 ms for the vmapped thousand-trial RANSAC's SVDs; SoA form ~1 ms).
    Every operation below is a fully lane-packed (B,)-elementwise
    multiply-add.
    """
    import jax

    dtype = cols[0][0].dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    one = jnp.ones_like(cols[0][0])
    zero = jnp.zeros_like(one)
    vcols = [
        (one, zero, zero),
        (zero, one, zero),
        (zero, zero, one),
    ]

    def _dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def _rot_pair(cp, cq):
        """Rotate a column pair to mutual orthogonality; returns (c, s)."""
        alpha = _dot(cp, cp)
        beta = _dot(cq, cq)
        gamma = _dot(cp, cq)
        return _rotation(alpha, beta, gamma, eps)

    def _apply(cp, cq, c, s):
        new_p = tuple(c * x - s * y for x, y in zip(cp, cq))
        new_q = tuple(s * x + c * y for x, y in zip(cp, cq))
        return new_p, new_q

    def one_sweep(_, carry):
        a0, a1, a2, v0, v1, v2 = carry
        c, s = _rot_pair(a0, a1)
        a0, a1 = _apply(a0, a1, c, s)
        v0, v1 = _apply(v0, v1, c, s)
        c, s = _rot_pair(a0, a2)
        a0, a2 = _apply(a0, a2, c, s)
        v0, v2 = _apply(v0, v2, c, s)
        c, s = _rot_pair(a1, a2)
        a1, a2 = _apply(a1, a2, c, s)
        v1, v2 = _apply(v1, v2, c, s)
        return (a0, a1, a2, v0, v1, v2)

    # fori_loop keeps the traced program one sweep long (the unrolled form
    # ballooned TPU compile time inside vmapped RANSAC); unroll=True trades
    # that for a single fused kernel on scalar latency-critical calls.
    carry = (cols[0], cols[1], cols[2], vcols[0], vcols[1], vcols[2])
    if unroll:
        for _ in range(_JACOBI_SWEEPS):
            carry = one_sweep(None, carry)
        a0, a1, a2, v0, v1, v2 = carry
    else:
        a0, a1, a2, v0, v1, v2 = jax.lax.fori_loop(
            0, _JACOBI_SWEEPS, one_sweep, carry
        )

    # Sort columns by descending norm with a 3-element compare-swap network
    # (no gathers).
    s0 = jnp.sqrt(_dot(a0, a0))
    s1 = jnp.sqrt(_dot(a1, a1))
    s2 = jnp.sqrt(_dot(a2, a2))

    def _cswap(sa, sb, ca, cb, va, vb):
        swap = sb > sa
        sa2 = jnp.where(swap, sb, sa)
        sb2 = jnp.where(swap, sa, sb)
        ca2 = tuple(jnp.where(swap, y, x) for x, y in zip(ca, cb))
        cb2 = tuple(jnp.where(swap, x, y) for x, y in zip(ca, cb))
        va2 = tuple(jnp.where(swap, y, x) for x, y in zip(va, vb))
        vb2 = tuple(jnp.where(swap, x, y) for x, y in zip(va, vb))
        return sa2, sb2, ca2, cb2, va2, vb2

    s0, s1, a0, a1, v0, v1 = _cswap(s0, s1, a0, a1, v0, v1)
    s1, s2, a1, a2, v1, v2 = _cswap(s1, s2, a1, a2, v1, v2)
    s0, s1, a0, a1, v0, v1 = _cswap(s0, s1, a0, a1, v0, v1)

    tol = eps * 8.0
    good0 = s0 > (s0 * tol + tiny)
    good1 = s1 > (s0 * tol + tiny)
    good2 = s2 > (s0 * tol + tiny)

    u0 = tuple(x / jnp.where(good0, s0, 1.0) for x in a0)
    u0 = tuple(
        jnp.where(good0, x, e)
        for x, e in zip(u0, (jnp.ones_like(s0), zero, zero))
    )

    def _cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    def _norm(a):
        return jnp.sqrt(_dot(a, a))

    u1_raw = tuple(x / jnp.where(good1, s1, 1.0) for x in a1)
    proj = _dot(u1_raw, u0)
    u1_raw = tuple(x - proj * y for x, y in zip(u1_raw, u0))
    n1 = _norm(u1_raw)
    alt = _cross(u0, (zero, jnp.ones_like(s0), zero))
    alt_n = _norm(alt)
    alt2 = _cross(u0, (zero, zero, jnp.ones_like(s0)))
    use_alt = alt_n > 0.1
    alt = tuple(jnp.where(use_alt, x, y) for x, y in zip(alt, alt2))
    alt_nn = _norm(alt)
    alt = tuple(x / alt_nn for x in alt)
    ok1 = good1 & (n1 > tol)
    n1_safe = jnp.where(ok1, n1, 1.0)
    u1 = tuple(jnp.where(ok1, x / n1_safe, y) for x, y in zip(u1_raw, alt))

    u2 = _cross(u0, u1)
    n2 = _norm(u2)
    u2 = tuple(x / n2 for x in u2)
    # When σ₃ is significant, match the cross-product's sign to H's actual
    # action (A's third column) so H = U·S·Vt holds exactly; when σ₃ ~ 0 the
    # sign is arbitrary (absorbed downstream by the det correction).
    dot2 = _dot(u2, a2)
    sign2 = jnp.where(good2 & (dot2 < 0), -1.0, 1.0)
    u2 = tuple(x * sign2 for x in u2)

    return u0, u1, u2, (s0, s1, s2), v0, v1, v2
