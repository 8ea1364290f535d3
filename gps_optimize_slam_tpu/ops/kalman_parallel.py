"""Temporally-parallel EKF fusion via `lax.associative_scan` (log-depth).

The sequential `ops.kalman` scans cost O(N) depth — ~270 dependent steps of
tiny matrix math dominate the device time on TPU. This module computes the
SAME filter in O(log N) depth (Särkkä & García-Fernández, "Temporal
Parallelization of Bayesian Smoothers", IEEE TAC 2021), exploiting structure
specific to this problem:

* The 7×7 covariance stays block-diagonal forever: P₀ and Q are diagonal
  (config), H = [I₃ 0] observes positions only, so the Kalman gain's
  quaternion rows are identically zero — updates NEVER touch the quaternion
  state, and the quaternion covariance stays diagonal with a closed-form
  cumsum trajectory.
* Hence the fused quaternion chain is pure dead-reckoning:
  q_k = normalize(q₀ ⊗ δq₁ ⊗ … ⊗ δq_k) — an associative product scan
  (normalize∘⊗ is associative in exact arithmetic).
* Given the quaternions, the world-frame motion deltas d_k = R(q_{k-1})·δp_k
  are a vmap, and the position filter becomes an AFFINE Kalman filter
  (F = I, H = I₃) — exactly the associative-filtering setting, with
  five-tuple elements (A, b, C, η, J) combined in parallel.

Valid whenever transition blending is off (effective transition steps ≡ 0 —
the reference's own default everywhere, SURVEY Q5); `fuse_core` selects this
path statically from the config. Matches the sequential scans to float
round-off (tested ≤1e-8 in f64 across outage/RTS scenarios, and the golden
seq-04 trajectory to ≤1e-6).

The RTS backward pass reuses the same structure: gains decompose into a 3×3
position gain E_k = P_f[k]·P_p[k+1]⁻¹ (batched inverse, no scan) and a
diagonal quaternion gain α_f[k]/α_f[k+1]; the state-only backward recursion
is a short sequential scan kept for bit-faithful per-step quaternion
renormalisation, and is skipped entirely (`lax.cond`) when no outage
segment needs smoothing.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.ops import quaternion as quat
from gps_optimize_slam_tpu.ops import se3
from gps_optimize_slam_tpu.ops.kalman import (
    FusionControls,
    ekf_params,
    precompute_controls,
)
from gps_optimize_slam_tpu.utils.precision import highp


def _combine_filter(e1, e2):
    """Associative combination of filtering elements (Särkkä eq. 10)."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    I = jnp.broadcast_to(jnp.eye(3, dtype=A1.dtype), A1.shape)
    M = jnp.linalg.inv(I + C1 @ J2)
    Mt = jnp.swapaxes(M, -1, -2)  # (I + J2 C1)⁻¹ for symmetric C1, J2
    A2M = A2 @ M
    A = A2M @ A1
    b = (A2M @ (b1 + (C1 @ eta2[..., None])[..., 0])[..., None])[..., 0] + b2
    C = A2M @ C1 @ jnp.swapaxes(A2, -1, -2) + C2
    A1tMt = jnp.swapaxes(A1, -1, -2) @ Mt
    eta = (A1tMt @ (eta2 - (J2 @ b1[..., None])[..., 0])[..., None])[..., 0] + eta1
    J = A1tMt @ J2 @ A1 + J1
    return A, b, C, eta, J


@highp
def parallel_quat_chain(init_quat: jnp.ndarray, dq: jnp.ndarray) -> jnp.ndarray:
    """q_k = normalize(q₀ ⊗ δq₁ ⊗ … ⊗ δq_k) for all k, in log depth."""
    qs = jnp.concatenate([quat.normalize(init_quat)[None], dq], axis=0)
    return jax.lax.associative_scan(lambda a, b: quat.normalize(quat.mul(a, b)), qs)


@highp
def parallel_position_filter(
    m0: jnp.ndarray,  # (3,)
    P0: jnp.ndarray,  # (3,3)
    d: jnp.ndarray,  # (N-1,3) world-frame motion deltas
    Qd: jnp.ndarray,  # (N-1,3,3) per-step process noise (Q_pos·dt)
    R: jnp.ndarray,  # (3,3)
    z: jnp.ndarray,  # (N-1,3) measurements (arbitrary where invalid)
    avail: jnp.ndarray,  # (N-1,) bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Filtered means/covs (N,3)/(N,3,3) of the affine KF x←x+d, H=I."""
    n1 = d.shape[0]
    dtype = d.dtype
    I = jnp.eye(3, dtype=dtype)
    Ib = jnp.broadcast_to(I, (n1, 3, 3))

    S = Qd + R  # (N-1,3,3)
    S_inv = jnp.linalg.inv(S)
    K = Qd @ S_inv
    IK = Ib - K
    zc = z - d
    a = jnp.where(avail[:, None, None], IK, Ib)
    b = jnp.where(
        avail[:, None], (IK @ d[..., None])[..., 0] + (K @ z[..., None])[..., 0], d
    )
    C = jnp.where(avail[:, None, None], IK @ Qd, Qd)
    eta = jnp.where(avail[:, None], (S_inv @ zc[..., None])[..., 0], 0.0)
    J = jnp.where(avail[:, None, None], S_inv, 0.0)

    # Prior as element 0: (A=0, b=m₀, C=P₀, η=0, J=0).
    A_all = jnp.concatenate([jnp.zeros((1, 3, 3), dtype), a])
    b_all = jnp.concatenate([m0[None], b])
    C_all = jnp.concatenate([P0[None], C])
    eta_all = jnp.concatenate([jnp.zeros((1, 3), dtype), eta])
    J_all = jnp.concatenate([jnp.zeros((1, 3, 3), dtype), J])

    _, m_f, P_f, _, _ = jax.lax.associative_scan(
        _combine_filter, (A_all, b_all, C_all, eta_all, J_all)
    )
    return m_f, P_f


@highp
def fuse_ekf_rts_parallel(
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    slam_quat: jnp.ndarray,
    sim3_pos: jnp.ndarray,
    sim3_quat: jnp.ndarray,
    aligned_gps: jnp.ndarray,
    valid_mask: jnp.ndarray,
    ekf_cfg: EKFConfig = EKFConfig(),
    rts_cfg: RTSDecisionConfig = RTSDecisionConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Log-depth equivalent of ``kalman.fuse_ekf_rts`` for hard-update
    configs (effective transition steps ≡ 0; guaranteed statically when
    rts_cfg.default_ekf_transition_steps_on_sharp_turn == 0)."""
    if rts_cfg.default_ekf_transition_steps_on_sharp_turn != 0:
        raise ValueError(
            "parallel scan requires hard updates (transition steps == 0); "
            "use kalman.fuse_ekf_rts for blending configs"
        )
    n = slam_times.shape[0]
    dtype = slam_pos.dtype

    controls = precompute_controls(
        slam_times, slam_quat, aligned_gps, valid_mask, rts_cfg
    )
    params = ekf_params(ekf_cfg, dtype=dtype)
    Q_pos = params.Q_per_sec[:3, :3]
    Q_quat_diag = jnp.diag(params.Q_per_sec)[3:]
    P0_pos = params.P0[:3, :3]
    alpha0 = jnp.diag(params.P0)[3:]
    R = params.R

    # --- quaternion chain + world-frame deltas (all parallel) ---
    dp, dq = se3.relative_poses_along(slam_pos, slam_quat)
    q_f = parallel_quat_chain(sim3_quat[0], dq)  # (N,4)
    d = quat.rotate(q_f[:-1], dp)  # (N-1,3)

    dt = jnp.maximum(1e-6, slam_times[1:] - slam_times[:-1])
    Qd = Q_pos[None] * dt[:, None, None]
    z = jnp.nan_to_num(aligned_gps[1:], nan=0.0)
    avail = controls.avail[1:]

    m_f, P_f = parallel_position_filter(
        sim3_pos[0], P0_pos, d, Qd, R, z, avail
    )

    # --- RTS backward over outage segments (state-only) ---
    # Predicted stats: m_p[k+1] = m_f[k] + d_k, P_p[k+1] = P_f[k] + Qd_k;
    # quaternion covariance is diagonal and measurement-independent:
    # α_f[k] = α₀ + Σ Q_q·dt (= α_p[k] — updates don't touch it).
    m_p_next = m_f[:-1] + d  # (N-1,3) = m_p[1..N-1]
    P_p_next = P_f[:-1] + Qd
    E = P_f[:-1] @ jnp.linalg.inv(P_p_next)  # (N-1,3,3) position gains
    cum_t = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(dt)])  # (N,)
    alpha_f = alpha0[None, :] + cum_t[:, None] * Q_quat_diag[None, :]  # (N,4)
    a_quat = alpha_f[:-1] / alpha_f[1:]  # (N-1,4) diagonal quat gains

    member = controls.rts_member
    end = controls.rts_end

    def run_rts(_):
        xs = dict(
            m_f=m_f[:-1],
            q_f=q_f[:-1],
            E=E,
            a=a_quat,
            m_p_next=m_p_next,
            q_p_next=q_f[1:],
            end_next=end[1:],
            m_f_next=m_f[1:],
            q_f_next=q_f[1:],
            member=member[:-1],
            is_end=end[:-1],
        )

        def step(carry, x):
            m_next_sm, q_next_sm = carry
            m_next = jnp.where(x["end_next"], x["m_f_next"], m_next_sm)
            q_next = jnp.where(x["end_next"], x["q_f_next"], q_next_sm)
            m_int = x["m_f"] + (x["E"] @ (m_next - x["m_p_next"])[..., None])[..., 0]
            q_int = quat.normalize(x["q_f"] + x["a"] * (q_next - x["q_p_next"]))
            interior = x["member"] & ~x["is_end"]
            m_sm = jnp.where(interior, m_int, x["m_f"])
            q_sm = jnp.where(interior, q_int, x["q_f"])
            return (m_sm, q_sm), (m_sm, q_sm)

        _, (m_rev, q_rev) = jax.lax.scan(
            step, (m_f[-1], q_f[-1]), xs, reverse=True
        )
        return (
            jnp.concatenate([m_rev, m_f[-1:]]),
            jnp.concatenate([q_rev, q_f[-1:]]),
        )

    m_out, q_out = jax.lax.cond(
        jnp.any(member),
        run_rts,
        lambda _: (m_f, q_f),
        operand=None,
    )
    use = member[:, None]
    return (
        jnp.where(use, m_out, m_f),
        jnp.where(use, q_out, q_f),
    )
