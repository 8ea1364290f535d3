"""Quaternion algebra as pure, vmappable jax.numpy ops.

Convention: quaternions are stored ``[qx, qy, qz, qw]`` (scalar-last), the
same convention as scipy.spatial.transform.Rotation used by the reference
(EKFGPSSLAM.py:4). Rotations act on column vectors: ``rotate(q, v) = R(q) v``.

Replaces the reference's scipy `Rotation` usage (EKFGPSSLAM.py:77-105,
461-467, 679-826) with fused elementwise math that XLA can vectorise on the
VPU — no per-pose Python object churn.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

IDENTITY = (0.0, 0.0, 0.0, 1.0)

_EPS_NORM = 1e-9


def identity_like(q: jnp.ndarray) -> jnp.ndarray:
    """Identity quaternion broadcast to q's shape."""
    out = jnp.zeros_like(q)
    return out.at[..., 3].set(1.0)


def norm(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(q, axis=-1)


def normalize(q: jnp.ndarray, eps: float = _EPS_NORM) -> jnp.ndarray:
    """Normalise; near-zero-norm quaternions become identity.

    Matches ExtendedKalmanFilter.normalize_quaternion
    (reference: EKFGPSSLAM.py:697-700): ``q/|q|`` if ``|q| > 1e-9`` else
    ``[0,0,0,1]``.
    """
    n = norm(q)[..., None]
    safe = jnp.where(n > eps, n, 1.0)
    return jnp.where(n > eps, q / safe, identity_like(q))


def mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2 in xyzw layout: R(q1 q2) = R(q1) R(q2)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def inv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a (possibly non-unit) quaternion."""
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return conj(q) / n2


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q: ``R(q) v``.

    Uses the expanded two-cross-product form (no matrix materialisation):
    v' = v + 2 w (u × v) + 2 u × (u × v), u = q.xyz.
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion → 3×3 rotation matrix (batched)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """3×3 rotation matrix → unit quaternion xyzw (batched, branchless).

    Shepperd-style: build all four candidate quaternions scaled by
    (4 component²) and select the one keyed by the largest diagonal
    combination — numerically stable for every rotation.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Candidate quaternions, each scaled by 4*component (unnormalised).
    qw = jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1.0 + tr], axis=-1)
    qx = jnp.stack([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    qy = jnp.stack([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20], axis=-1)
    qz = jnp.stack([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01], axis=-1)

    # Discriminants: which candidate has the largest leading term.
    d = jnp.stack(
        [
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
            1.0 + tr,
        ],
        axis=-1,
    )
    choice = jnp.argmax(d, axis=-1)
    cands = jnp.stack([qx, qy, qz, qw], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, choice[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalise sign: non-negative scalar part (w), matching scipy's
    # from_matrix output convention.
    sign = jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return q * sign


def nlerp(q1: jnp.ndarray, q2: jnp.ndarray, weight_q2) -> jnp.ndarray:
    """Normalised linear interpolation with hemisphere flip.

    Matches quaternion_nlerp (reference: EKFGPSSLAM.py:94-105): flips q2 if
    dot<0, clips the weight to [0,1], and if the interpolated norm collapses
    (<1e-9) returns q1 for w<0.5 else q2.
    """
    w = jnp.clip(jnp.asarray(weight_q2), 0.0, 1.0)
    dot = jnp.sum(q1 * q2, axis=-1, keepdims=True)
    q2f = jnp.where(dot < 0.0, -q2, q2)
    q = (1.0 - w) * q1 + w * q2f
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    fallback = jnp.where(jnp.asarray(weight_q2) < 0.5, q1, q2)
    safe = jnp.where(n < _EPS_NORM, 1.0, n)
    return jnp.where(n < _EPS_NORM, fallback, q / safe)


def yaw(q: jnp.ndarray) -> jnp.ndarray:
    """First angle of scipy's ``as_euler('zyx')`` — the "yaw" used by the
    sharp-turn detector (reference: EKFGPSSLAM.py:819-820).

    Note scipy's lowercase axis string means EXTRINSIC rotations
    (R = Rx·Ry·Rz), so the z angle is atan2(−m01, m00) =
    atan2(2(wz − xy), 1 − 2(y² + z²)) — not the intrinsic-yaw formula.
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z - x * y), 1.0 - 2.0 * (y * y + z * z))


def wrap_angle(a: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle(s) to (-pi, pi] via atan2 (reference: EKFGPSSLAM.py:822)."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def exp_map(omega: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential: rotation vector (axis·angle, rad) → unit quaternion.

    Taylor-guarded near zero INCLUDING gradients (the "double-where" trick:
    the sqrt never sees 0, so jvp/vjp at ω = 0 stay finite — required by the
    pose-graph Gauss-Newton retraction, which differentiates through this at
    exactly ω = 0)."""
    theta2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = theta2 < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    # sin(θ/2)/θ with series 1/2 − θ²/48; cos(θ/2) with series 1 − θ²/8.
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(theta / 2.0) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(theta / 2.0))
    return jnp.concatenate([omega * k, w], axis=-1)


def log_map(q: jnp.ndarray) -> jnp.ndarray:
    """SO(3) logarithm: unit quaternion → rotation vector (rad).

    Hemisphere-canonicalised (w ≥ 0) so the result is the minimal rotation;
    Taylor/double-where guarded near identity so gradients stay finite at
    the zero rotation."""
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    v = q[..., :3]
    w = jnp.clip(q[..., 3:4], -1.0, 1.0)
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = vn2 < 1e-18
    vn = jnp.sqrt(jnp.where(small, 1.0, vn2))
    theta = 2.0 * jnp.arctan2(vn, w)
    # Near identity w ≈ 1: log(q) ≈ 2v/w (relative error O(vn²)).
    w_safe = jnp.where(w > 0.5, w, 1.0)
    scale = jnp.where(small, 2.0 / w_safe, theta / vn)
    return v * scale
