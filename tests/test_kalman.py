"""EKF + RTS scan tests against the sequential NumPy oracle
(tests/reference_impls.oracle_ekf_rts) across outage/recovery scenarios."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.ops import kalman
from tests.reference_impls import oracle_ekf_rts


def make_traj(n=120, seed=0, turn_span=None, turn_rate_deg=120.0):
    """Synthetic SLAM trajectory: smooth 2D motion with optional sharp turn
    inside ``turn_span`` (index range)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) * 0.1
    yaw_rate = np.full(n, 4.0)  # deg/s, gentle
    if turn_span is not None:
        yaw_rate[turn_span[0] : turn_span[1]] = turn_rate_deg
    yaw = np.cumsum(np.deg2rad(yaw_rate) * 0.1)
    quats = Rotation.from_euler("z", yaw[:, None]).as_quat()
    vel = 2.0
    heading = np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n)], -1)
    pos = np.cumsum(vel * 0.1 * heading, axis=0)
    pos[:, 2] += 0.01 * rng.normal(size=n).cumsum()
    return t, pos, quats


def run_case(valid, turn_span=None, rts_cfg=RTSDecisionConfig(), seed=0, n=120):
    t, pos, quats = make_traj(n=n, seed=seed, turn_span=turn_span)
    rng = np.random.default_rng(seed + 100)
    # Sim3 init = scaled/offset version; GPS = noisy truth.
    sim3_pos = pos * 0.99 + np.array([3.0, -2.0, 0.5])
    sim3_quat = quats.copy()
    gps = sim3_pos + rng.normal(size=pos.shape) * 0.1
    gps[~valid] = np.nan

    ref_p, ref_q = oracle_ekf_rts(
        t, pos, quats, sim3_pos, sim3_quat, gps, valid, EKFConfig(), rts_cfg
    )
    ours_p, ours_q = kalman.fuse_ekf_rts(
        jnp.asarray(t),
        jnp.asarray(pos),
        jnp.asarray(quats),
        jnp.asarray(sim3_pos),
        jnp.asarray(sim3_quat),
        jnp.asarray(gps),
        jnp.asarray(valid),
        EKFConfig(),
        rts_cfg,
    )
    np.testing.assert_allclose(np.asarray(ours_p), ref_p, atol=1e-8)
    dots = np.abs(np.sum(np.asarray(ours_q) * ref_q, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-8)
    return np.asarray(ours_p), ref_p


def test_all_available_no_outage():
    valid = np.ones(120, bool)
    run_case(valid)


def test_mid_outage_straight_rts():
    valid = np.ones(120, bool)
    valid[40:70] = False  # straight segment → RTS on recovery at 70
    run_case(valid)


def test_mid_outage_sharp_turn_no_rts():
    valid = np.ones(120, bool)
    valid[40:70] = False
    run_case(valid, turn_span=(45, 60))  # 120 deg/s > 45 deg/s threshold


def test_sharp_turn_with_transition_blending():
    # Non-default config exercises the NLERP weight-ramp path (dead at
    # defaults, SURVEY Q5).
    valid = np.ones(120, bool)
    valid[40:70] = False
    run_case(
        valid,
        turn_span=(45, 60),
        rts_cfg=RTSDecisionConfig(
            default_ekf_transition_steps_on_sharp_turn=7
        ),
    )


def test_initial_outage():
    valid = np.ones(120, bool)
    valid[:25] = False  # outage from index 0 → RTS over [0..25]
    run_case(valid)


def test_trailing_outage_unsmoothed():
    valid = np.ones(120, bool)
    valid[95:] = False  # trajectory ends in outage → dead-reckoning tail
    ours, ref = run_case(valid)


def test_multiple_outages_mixed():
    valid = np.ones(200, bool)
    valid[30:50] = False   # straight → RTS
    valid[90:110] = False  # sharp → EKF transition
    valid[150:160] = False # straight → RTS
    run_case(valid, turn_span=(95, 105), n=200)


def test_single_step_outage():
    valid = np.ones(120, bool)
    valid[60] = False  # len-1 outage: too short to analyse → RTS by default
    run_case(valid)


def test_sparse_gps_every_5th():
    valid = np.zeros(120, bool)
    valid[::5] = True
    run_case(valid)


def test_controls_precompute_flags():
    t, pos, quats = make_traj(n=50, turn_span=(22, 28))
    valid = np.ones(50, bool)
    valid[20:30] = False
    gps = pos.copy()
    gps[~valid] = np.nan
    ctrl = kalman.precompute_controls(
        jnp.asarray(t), jnp.asarray(quats), jnp.asarray(gps), jnp.asarray(valid)
    )
    assert bool(ctrl.is_recovery[30])
    assert bool(ctrl.sharp_turn[30])  # 120 deg/s turn inside the outage
    assert not bool(ctrl.rts_end[30])  # sharp → no RTS
    assert not np.asarray(ctrl.rts_member)[20:31].any()
    # Straight outage → RTS members span [start .. recovery].
    valid2 = np.ones(50, bool)
    valid2[5:12] = False
    gps2 = pos.copy()
    gps2[~valid2] = np.nan
    ctrl2 = kalman.precompute_controls(
        jnp.asarray(t), jnp.asarray(quats), jnp.asarray(gps2), jnp.asarray(valid2)
    )
    assert bool(ctrl2.rts_end[12])
    member = np.asarray(ctrl2.rts_member)
    assert member[5:13].all() and not member[:5].any() and not member[13:].any()
