"""EKF + RTS trajectory fusion as `lax.scan` programs.

TPU-native re-architecture of the reference's hot path (ExtendedKalmanFilter
EKFGPSSLAM.py:679-772, rts_smoother_segment :777-803, sharp-turn detector
:808-826, and the apply_ekf_correction orchestrator :831-935):

The reference drives a Python loop with data-dependent branching (outage
bookkeeping, recovery analysis, per-segment RTS that overwrites history).
The key observation making this XLA-native: **every control decision depends
only on the GPS validity mask and the raw SLAM stream — both known before
the filter runs.** So the whole pipeline becomes:

1. ``precompute_controls`` — vectorised outage/recovery/sharp-turn analysis
   (cummax run-labelling + segment reductions, no loops);
2. one forward `lax.scan` (predict / masked update / transition blending);
3. one backward `lax.scan` applying ALL per-outage RTS segments at once
   (segments are disjoint, so a single reverse pass with boundary resets is
   exactly equivalent to the reference's per-segment smoothing — including
   quirk Q8, whose filtered-history overwrite is provably inert because
   later segments never read earlier segments' indices);
4. a masked combine.

State layout matches the reference: ``[x y z qx qy qz qw]`` with the
quaternion filtered as a raw 4-vector + renormalisation, F = I for the
covariance (quirk Q7), position-only H = [I₃ 0], Joseph-form update.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.utils.precision import highp
from gps_optimize_slam_tpu.ops import quaternion as quat
from gps_optimize_slam_tpu.ops import se3


class EKFParams(NamedTuple):
    P0: jnp.ndarray  # (7,7) initial covariance
    Q_per_sec: jnp.ndarray  # (7,7) process noise per second
    R: jnp.ndarray  # (3,3) measurement noise


def ekf_params(cfg: EKFConfig, dtype=jnp.float64) -> EKFParams:
    return EKFParams(
        P0=jnp.diag(jnp.asarray(cfg.initial_cov_diag, dtype)),
        Q_per_sec=jnp.diag(jnp.asarray(cfg.process_noise_diag, dtype)),
        R=jnp.diag(jnp.asarray(cfg.meas_noise_diag, dtype)),
    )


class FusionControls(NamedTuple):
    """Per-step control signals, all derived before the scan runs."""

    avail: jnp.ndarray  # (N,) bool — usable GPS measurement at step i
    is_recovery: jnp.ndarray  # (N,) bool — GNSS recovered at step i
    eff_transition_steps: jnp.ndarray  # (N,) int32 — EKF blending steps
    rts_member: jnp.ndarray  # (N,) bool — inside an RTS-smoothed span
    rts_end: jnp.ndarray  # (N,) bool — recovery point ending an RTS span
    sharp_turn: jnp.ndarray  # (N,) bool — outage ending here was sharp


def _sym(M: jnp.ndarray) -> jnp.ndarray:
    return (M + jnp.swapaxes(M, -1, -2)) / 2.0


@highp
def precompute_controls(
    slam_times: jnp.ndarray,
    slam_quats: jnp.ndarray,
    aligned_gps: jnp.ndarray,
    valid_mask: jnp.ndarray,
    rts_cfg: RTSDecisionConfig = RTSDecisionConfig(),
) -> FusionControls:
    """Vectorised equivalent of the orchestrator's outage bookkeeping and
    recovery-time sharp-turn analysis (reference EKFGPSSLAM.py:861-899).

    Outage runs are labelled with a cumulative-max trick; per-run maximum
    yaw rates come from one `segment_max`. The reference's semantics:

    * recovery at i ⟺ avail[i] ∧ ¬avail[i−1]
    * outage span [s, i−1] analysed for sharp turns only when its length ≥2
      (else RTS by default); invalid quaternions ⇒ conservatively sharp
    * sharp ⇒ no RTS, transition steps from config; else RTS + hard update.
    """
    n = slam_times.shape[0]
    avail = valid_mask & ~jnp.any(jnp.isnan(aligned_gps), axis=-1)

    idx = jnp.arange(n)
    avail_prev = jnp.concatenate([avail[:1], avail[:-1]])  # [0] unused
    is_recovery = avail & ~avail_prev
    # iota mask, not .at[0].set: single-index scatters on pose-axis-sharded
    # arrays are mispartitioned by XLA:CPU GSPMD (applied at every shard's
    # local index 0 — see ops/kalman_parallel.py prior-element note).
    is_recovery = is_recovery & (idx != 0)

    # Label invalid runs: run start s[j] = (last avail index before j) + 1.
    last_avail = jax.lax.cummax(jnp.where(avail, idx, -1))
    run_start = last_avail + 1  # for ~avail[j], index of its run's start
    run_len_at = idx - last_avail  # for ~avail[j], run length up to j incl.

    # Yaw rate between consecutive SLAM poses (k−1, k). Runs are contiguous,
    # so every per-run "any(...)" aggregate is a prefix-sum difference over
    # the run span — no scatter-based segment ops (TPU scatters serialise).
    yaws = quat.yaw(slam_quats)
    dyaw = quat.wrap_angle(yaws[1:] - yaws[:-1])
    dts = slam_times[1:] - slam_times[:-1]
    rate = jnp.where(dts > 0, jnp.abs(dyaw / jnp.where(dts > 0, dts, 1.0)), 0.0)
    thresh = jnp.deg2rad(rts_cfg.sharp_turn_yaw_rate_threshold_deg_per_sec)
    # Pair k covers poses (k, k+1); it is a within-run pair iff both invalid.
    pair_in_run = (~avail[:-1]) & (~avail[1:])
    high = pair_in_run & (rate > thresh)
    cum_high = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(high.astype(jnp.int32))]
    )  # cum_high[j] = Σ high[0..j-1]
    # Degenerate quaternions anywhere in the run ⇒ sharp (reference :821).
    bad_quat = (quat.norm(slam_quats) < 1e-15) & ~avail
    cum_bad = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bad_quat.astype(jnp.int32))]
    )

    # For a recovery at i, the outage run is [s..i−1], s = run_start[i−1]:
    # sharp ⟺ any high pair with index in [s..i−2] or any bad quat in [s..i−1].
    prev_run_start = jnp.concatenate([jnp.zeros((1,), idx.dtype), run_start[:-1]])
    prev_run_len = jnp.concatenate([jnp.zeros((1,), idx.dtype), run_len_at[:-1]])
    analyse = is_recovery & (prev_run_len >= 2)
    s_clip = jnp.clip(prev_run_start, 0, n - 1)
    # cum_high index i−1 ⇒ pairs [s..i−2]; clip guards i=0 (never a recovery).
    any_high = (cum_high[jnp.clip(idx - 1, 0, n - 1)] - cum_high[s_clip]) > 0
    any_bad = (cum_bad[idx] - cum_bad[s_clip]) > 0
    sharp_at_recovery = analyse & (any_high | any_bad)

    perform_rts = is_recovery & ~sharp_at_recovery
    eff_steps = jnp.where(
        sharp_at_recovery,
        jnp.asarray(rts_cfg.default_ekf_transition_steps_on_sharp_turn, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )

    # RTS membership: the outage run [s..i−1] of a perform_rts recovery i,
    # plus i itself. For an invalid point j, its run's END is the nearest
    # index k ≥ j with run_last[k] (reverse cummax); the run is smoothed iff
    # the step after that end is a perform_rts recovery. A trailing run has
    # no run_last (no recovery) and stays unsmoothed.
    run_last = (~avail) & jnp.concatenate([avail[1:], jnp.zeros((1,), bool)])
    e_rev = jax.lax.cummax(jnp.flip(jnp.where(run_last, (n - 1) - idx, -1)))
    e = jnp.flip(e_rev)
    found = e >= 0
    run_end = (n - 1) - jnp.where(found, e, 0)
    member_invalid = (
        (~avail) & found & perform_rts[jnp.clip(run_end + 1, 0, n - 1)]
    )
    rts_member = member_invalid | perform_rts

    return FusionControls(
        avail=avail,
        is_recovery=is_recovery,
        eff_transition_steps=eff_steps,
        rts_member=rts_member,
        rts_end=perform_rts,
        sharp_turn=sharp_at_recovery,
    )


class EKFHistory(NamedTuple):
    filt_state: jnp.ndarray  # (N,7)
    filt_cov: jnp.ndarray  # (N,7,7)
    pred_state: jnp.ndarray  # (N,7)
    pred_cov: jnp.ndarray  # (N,7,7)


@highp
def ekf_forward(
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    slam_quat: jnp.ndarray,
    init_pos: jnp.ndarray,
    init_quat: jnp.ndarray,
    aligned_gps: jnp.ndarray,
    controls: FusionControls,
    params: EKFParams,
    avail_prev0=None,
) -> EKFHistory:
    """Forward EKF pass as one `lax.scan` (reference process_step loop,
    EKFGPSSLAM.py:736-772 and :864-904).

    Motion comes from the ORIGINAL SLAM stream (relative poses), measurements
    from the aligned GPS; index i's entry corresponds to the reference's
    histories (index 0 = initial state).
    """
    n = slam_times.shape[0]
    dtype = slam_pos.dtype
    state0 = jnp.concatenate([init_pos, quat.normalize(init_quat)])
    cov0 = params.P0.astype(dtype)

    dp, dq = se3.relative_poses_along(slam_pos, slam_quat)  # (N-1, ·)
    dt = jnp.maximum(1e-6, slam_times[1:] - slam_times[:-1])
    gps_meas = jnp.nan_to_num(aligned_gps[1:], nan=0.0)
    avail = controls.avail[1:]
    eff_steps = controls.eff_transition_steps[1:]

    H_cols = 3
    I7 = jnp.eye(7, dtype=dtype)
    R = params.R.astype(dtype)
    Q = params.Q_per_sec.astype(dtype)

    def step(carry, inp):
        state, cov, weight, avail_prev = carry
        dp_i, dq_i, dt_i, z_i, avail_i, ets_i = inp

        # --- predict (EKFGPSSLAM.py:702-715) ---
        pred_pos, pred_q = se3.compose(state[:3], state[3:], dp_i, dq_i)
        pred_state = jnp.concatenate([pred_pos, pred_q])
        pred_cov = _sym(cov + Q * jnp.maximum(jnp.abs(dt_i), 1e-6))

        # --- update (EKFGPSSLAM.py:717-732), H = [I₃ 0] ---
        innovation = z_i - pred_state[:H_cols]
        S = _sym(pred_cov[:H_cols, :H_cols] + R)
        S_inv = jnp.linalg.inv(S)
        K = pred_cov[:, :H_cols] @ S_inv  # (7,3)
        upd_state = pred_state + K @ innovation
        upd_state = jnp.concatenate(
            [upd_state[:3], quat.normalize(upd_state[3:])]
        )
        IKH = I7.at[:, :H_cols].add(-K)
        upd_cov = _sym(IKH @ pred_cov @ IKH.T + K @ R @ K.T)

        # --- GNSS weight ramp (EKFGPSSLAM.py:741-758) ---
        ets_f = ets_i.astype(dtype)
        weight_delta = jnp.where(ets_i > 0, 1.0 / jnp.maximum(ets_f, 1.0), 1.0)
        just_recovered = avail_i & ~avail_prev
        ramped = jnp.where(
            weight < 1.0, jnp.minimum(1.0, weight + weight_delta), weight
        )
        new_weight = jnp.where(
            avail_i,
            jnp.where(
                just_recovered | (ets_i == 0),
                jnp.where(ets_i == 0, 1.0, weight_delta),
                ramped,
            ),
            0.0,
        )

        # --- fuse (EKFGPSSLAM.py:760-768) ---
        blend = avail_i & (new_weight < 1.0) & (ets_i > 0)
        w = new_weight
        smooth_pos = (1.0 - w) * pred_state[:3] + w * upd_state[:3]
        smooth_q = quat.nlerp(pred_state[3:], upd_state[3:], w)
        blended = jnp.concatenate([smooth_pos, smooth_q])

        fused_state = jnp.where(
            avail_i, jnp.where(blend, blended, upd_state), pred_state
        )
        fused_cov = jnp.where(avail_i, upd_cov, pred_cov)

        new_carry = (fused_state, fused_cov, new_weight, avail_i)
        return new_carry, (fused_state, fused_cov, pred_state, pred_cov)

    # The reference seeds gnss_available_prev from the RAW validity mask
    # (EKFGPSSLAM.py:848), before the NaN check — callers pass it through.
    if avail_prev0 is None:
        avail_prev0 = controls.avail[0]
    init_carry = (state0, cov0, jnp.asarray(0.0, dtype), avail_prev0)
    _, (f_s, f_c, p_s, p_c) = jax.lax.scan(
        step, init_carry, (dp, dq, dt, gps_meas, avail, eff_steps)
    )

    return EKFHistory(
        filt_state=jnp.concatenate([state0[None], f_s]),
        filt_cov=jnp.concatenate([cov0[None], f_c]),
        pred_state=jnp.concatenate([state0[None], p_s]),
        pred_cov=jnp.concatenate([cov0[None], p_c]),
    )


@highp
def rts_backward(history: EKFHistory, controls: FusionControls) -> jnp.ndarray:
    """Apply every outage-segment RTS smoothing in ONE reverse `lax.scan`.

    Equivalent to the reference's per-recovery rts_smoother_segment calls
    (EKFGPSSLAM.py:777-803, splice :906-928) because segments are disjoint:
    the carry resets to the filtered state at each segment end (the recovery
    point), interior members apply the F=I RTS recursion
    A_k = P_f[k]·P_p[k+1]⁻¹, and non-members pass the filtered state through.
    Returns the (N,7) smoothed/filtered state sequence (states only — like
    the reference, smoothed covariances never feed the outputs).
    """
    n = history.filt_state.shape[0]

    xs = dict(
        filt=history.filt_state[:-1],
        filt_cov=history.filt_cov[:-1],
        pred_next=history.pred_state[1:],
        pred_cov_next=history.pred_cov[1:],
        end_next=controls.rts_end[1:],
        member=controls.rts_member[:-1],
        end=controls.rts_end[:-1],
        filt_next=history.filt_state[1:],
        filt_cov_next=history.filt_cov[1:],
    )

    def step(carry, x):
        x_next_sm, P_next_sm = carry
        x_next = jnp.where(x["end_next"], x["filt_next"], x_next_sm)
        P_next = jnp.where(x["end_next"], x["filt_cov_next"], P_next_sm)

        A = x["filt_cov"] @ jnp.linalg.inv(x["pred_cov_next"])
        x_int = x["filt"] + A @ (x_next - x["pred_next"])
        x_int = jnp.concatenate([x_int[:3], quat.normalize(x_int[3:])])
        P_int = _sym(x["filt_cov"] + A @ (P_next - x["pred_cov_next"]) @ A.T)

        interior = x["member"] & ~x["end"]
        x_sm = jnp.where(interior, x_int, x["filt"])
        P_sm = jnp.where(interior, P_int, x["filt_cov"])
        return (x_sm, P_sm), x_sm

    init = (history.filt_state[-1], history.filt_cov[-1])
    _, out_rev = jax.lax.scan(step, init, xs, reverse=True)
    return jnp.concatenate([out_rev, history.filt_state[-1:]], axis=0)


def full_smoother_controls(controls: FusionControls) -> FusionControls:
    """Replace the outage-gated RTS membership with FULL fixed-interval
    smoothing: one segment spanning the whole trajectory, anchored at the
    last pose. An extension beyond the reference (SURVEY §7 step 9) — the
    classic RTS smoother over every pose, measured or not."""
    n = controls.avail.shape[0]
    return controls._replace(
        rts_member=jnp.ones((n,), bool),
        # iota comparison, not .at[n-1].set: partition-safe on a sharded
        # pose axis (see precompute_controls / ops/kalman_parallel.py).
        rts_end=jnp.arange(n) == n - 1,
    )


def fuse_ekf_rts(
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    slam_quat: jnp.ndarray,
    sim3_pos: jnp.ndarray,
    sim3_quat: jnp.ndarray,
    aligned_gps: jnp.ndarray,
    valid_mask: jnp.ndarray,
    ekf_cfg: EKFConfig = EKFConfig(),
    rts_cfg: RTSDecisionConfig = RTSDecisionConfig(),
    rts_mode: str = "outage",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full EKF + RTS fusion (reference apply_ekf_correction,
    EKFGPSSLAM.py:831-935) as precompute + two scans.

    ``rts_mode``: "outage" smooths only GNSS-outage segments on recovery
    (the reference's behaviour); "full" applies the classic fixed-interval
    smoother over the whole trajectory (extension).

    Returns (positions (N,3), quaternions (N,4)).
    """
    controls = precompute_controls(
        slam_times, slam_quat, aligned_gps, valid_mask, rts_cfg
    )
    if rts_mode == "full":
        controls = full_smoother_controls(controls)
    params = ekf_params(ekf_cfg, dtype=slam_pos.dtype)
    hist = ekf_forward(
        slam_times,
        slam_pos,
        slam_quat,
        sim3_pos[0],
        sim3_quat[0],
        aligned_gps,
        controls,
        params,
        avail_prev0=valid_mask[0],
    )
    smoothed = rts_backward(hist, controls)
    out = jnp.where(controls.rts_member[:, None], smoothed, hist.filt_state)
    return out[:, :3], out[:, 3:]
