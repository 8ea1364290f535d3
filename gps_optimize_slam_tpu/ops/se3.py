"""SE(3)/Sim(3) pose operations as vectorised jax.numpy transforms.

Replaces the reference's per-pose Python loops (calculate_relative_pose
EKFGPSSLAM.py:77-92, transform_trajectory EKFGPSSLAM.py:461-467) with
batched ops that XLA fuses into a handful of VPU kernels.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from gps_optimize_slam_tpu.ops import quaternion as quat

_EPS_NORM = 1e-9


def relative_pose(
    pos1: jnp.ndarray,
    quat1: jnp.ndarray,
    pos2: jnp.ndarray,
    quat2: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Relative motion pose1 → pose2 expressed in pose1's local frame.

    Δp = R(q1)⁻¹ (p2 − p1), Δq = q1⁻¹ ⊗ q2.

    Degenerate (near-zero-norm) input quaternions yield zero motion
    (Δp = 0, Δq = identity), mirroring the reference's ValueError fallback
    (EKFGPSSLAM.py:84-86). Broadcasts over leading batch dims.
    """
    n1 = quat.norm(quat1)
    n2 = quat.norm(quat2)
    valid = (n1 > _EPS_NORM) & (n2 > _EPS_NORM)

    q1u = quat.normalize(quat1)
    q2u = quat.normalize(quat2)
    q1_inv = quat.conj(q1u)
    delta_pos_local = quat.rotate(q1_inv, pos2 - pos1)
    delta_q = quat.mul(q1_inv, q2u)

    zero_pos = jnp.zeros_like(delta_pos_local)
    ident = quat.identity_like(delta_q)
    v = valid[..., None]
    return jnp.where(v, delta_pos_local, zero_pos), jnp.where(v, delta_q, ident)


def relative_poses_along(
    positions: jnp.ndarray, quaternions: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-step relative motions along a trajectory.

    Returns (delta_pos[N-1,3], delta_quat[N-1,4]) where entry i is the motion
    pose i → pose i+1 in pose i's frame — the EKF's motion input stream
    (reference hot-loop call site EKFGPSSLAM.py:866).
    """
    return relative_pose(
        positions[:-1], quaternions[:-1], positions[1:], quaternions[1:]
    )


def compose(
    pos: jnp.ndarray,
    q: jnp.ndarray,
    delta_pos_local: jnp.ndarray,
    delta_q: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compose a local-frame motion onto a pose (EKF predict step motion
    model, reference EKFGPSSLAM.py:702-711)."""
    new_pos = pos + quat.rotate(q, delta_pos_local)
    new_q = quat.normalize(quat.mul(q, delta_q))
    return new_pos, new_q


def transform_trajectory(
    positions: jnp.ndarray,
    quaternions: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    scale,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply a Sim(3) transform (R, t, s) to a whole trajectory.

    p' = s · p Rᵀ + t; q' = quat(R) ⊗ q. One batched matmul + one batched
    quaternion product — replaces the reference's per-pose Python loop
    (EKFGPSSLAM.py:461-467).
    """
    new_pos = scale * (positions @ R.T) + t
    q_R = quat.from_matrix(R)
    new_quat = quat.mul(q_R, quaternions)
    return new_pos, new_quat
