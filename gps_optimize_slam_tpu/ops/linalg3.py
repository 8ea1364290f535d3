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
def svd3x3(H: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SVD of 3×3 matrices: H = U @ diag(S) @ Vt, batched over leading dims.

    One-sided Jacobi: right-rotate column pairs of A (=H·V accumulated)
    until mutually orthogonal; then σᵢ=‖aᵢ‖, uᵢ=aᵢ/σᵢ. Near-zero columns
    are completed by cross products — their sign may differ from LAPACK's,
    which is exactly the ambiguity the Umeyama/Kabsch det-correction
    absorbs (paired sign flips of (uᵢ, vᵢ) leave the SVD valid).
    """
    import jax

    dtype = H.dtype
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)

    def one_sweep(_, AV):
        A, V = AV
        for p, q in ((0, 1), (0, 2), (1, 2)):
            ap = A[..., :, p]
            aq = A[..., :, q]
            alpha = jnp.sum(ap * ap, axis=-1)
            beta = jnp.sum(aq * aq, axis=-1)
            gamma = jnp.sum(ap * aq, axis=-1)
            c, s = _rotation(alpha, beta, gamma, eps)
            G = jnp.broadcast_to(jnp.eye(3, dtype=dtype), H.shape)
            G = G.at[..., p, p].set(c)
            G = G.at[..., q, q].set(c)
            G = G.at[..., p, q].set(s)
            G = G.at[..., q, p].set(-s)
            A = A @ G
            V = V @ G
        return A, V

    # fori_loop keeps the traced program one sweep long (the unrolled form
    # ballooned TPU compile time inside vmapped RANSAC).
    A, V = jax.lax.fori_loop(
        0,
        _JACOBI_SWEEPS,
        one_sweep,
        (H, jnp.broadcast_to(jnp.eye(3, dtype=dtype), H.shape)),
    )

    S = jnp.linalg.norm(A, axis=-2)  # column norms
    order = jnp.argsort(-S, axis=-1)
    S = jnp.take_along_axis(S, order, axis=-1)
    A = jnp.take_along_axis(A, order[..., None, :], axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)

    tol = eps * 8.0
    smax = S[..., 0:1]
    good = S > (smax * tol + jnp.finfo(dtype).tiny)

    u0 = A[..., :, 0] / jnp.where(good[..., 0:1], S[..., 0:1], 1.0)
    e0 = jnp.zeros_like(u0).at[..., 0].set(1.0)
    u0 = jnp.where(good[..., 0:1], u0, e0)

    u1_raw = A[..., :, 1] / jnp.where(good[..., 1:2], S[..., 1:2], 1.0)
    u1_raw = u1_raw - jnp.sum(u1_raw * u0, axis=-1, keepdims=True) * u0
    n1 = jnp.linalg.norm(u1_raw, axis=-1, keepdims=True)
    alt = jnp.cross(u0, jnp.zeros_like(u0).at[..., 1].set(1.0))
    alt_n = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(u0, jnp.zeros_like(u0).at[..., 2].set(1.0))
    alt = jnp.where(alt_n > 0.1, alt, alt2)
    alt = alt / jnp.linalg.norm(alt, axis=-1, keepdims=True)
    ok1 = good[..., 1:2] & (n1 > tol)
    u1 = jnp.where(ok1, u1_raw / jnp.where(ok1, n1, 1.0), alt)

    u2 = jnp.cross(u0, u1)
    u2 = u2 / jnp.linalg.norm(u2, axis=-1, keepdims=True)
    # When σ₃ is significant, match the cross-product's sign to H's actual
    # action (A's third column) so H = U·S·Vt holds exactly; when σ₃ ~ 0 the
    # sign is arbitrary (absorbed downstream by the det correction).
    dot2 = jnp.sum(u2 * A[..., :, 2], axis=-1, keepdims=True)
    sign2 = jnp.where(good[..., 2:3] & (dot2 < 0), -1.0, 1.0)
    u2 = u2 * sign2

    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, S, jnp.swapaxes(V, -1, -2)
