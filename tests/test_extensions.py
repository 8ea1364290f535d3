"""Tests for the extension models: χ²-gated robust fusion (BASELINE config 4)
and pose-graph Gauss-Newton NLLS (config 5)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.models import pose_graph, robust
from gps_optimize_slam_tpu.ops import kalman_parallel
from gps_optimize_slam_tpu.ops import quaternion as quat
from tests.test_kalman import make_traj


def setup_fusion_inputs(n=150, seed=0, outliers=()):
    t, pos, quats = make_traj(n=n, seed=seed)
    rng = np.random.default_rng(seed + 1)
    sim3_pos = pos.copy()
    sim3_quat = quats.copy()
    gps = pos + rng.normal(size=pos.shape) * 0.1
    for i, mag in outliers:
        gps[i] += mag
    valid = np.ones(n, bool)
    return t, pos, quats, sim3_pos, sim3_quat, gps, valid


def test_chi2_gate_rejects_injected_outliers():
    outliers = [(40, np.array([30.0, -20.0, 5.0])), (90, np.array([0.0, 50.0, 0.0]))]
    t, pos, quats, s3p, s3q, gps, valid = setup_fusion_inputs(outliers=outliers)
    res = robust.fuse_robust(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(s3p), jnp.asarray(s3q), jnp.asarray(gps), jnp.asarray(valid),
    )
    acc = np.asarray(res.accepted)
    assert not acc[40] and not acc[90]
    assert acc.sum() >= 140  # inliers overwhelmingly kept
    # Fused trajectory must NOT be dragged by the outliers.
    err = np.linalg.norm(np.asarray(res.positions) - pos, axis=1)
    assert err.max() < 0.5, err.max()
    # Ungated fusion IS dragged — the gate demonstrably matters.
    up, _ = kalman_parallel.fuse_ekf_rts_parallel(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(s3p), jnp.asarray(s3q), jnp.asarray(gps), jnp.asarray(valid),
        EKFConfig(), RTSDecisionConfig(),
    )
    err_ungated = np.linalg.norm(np.asarray(up) - pos, axis=1)
    assert err_ungated.max() > 5 * err.max()


def test_chi2_gate_clean_data_accepts_everything():
    t, pos, quats, s3p, s3q, gps, valid = setup_fusion_inputs()
    res = robust.fuse_robust(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(s3p), jnp.asarray(s3q), jnp.asarray(gps), jnp.asarray(valid),
    )
    assert np.asarray(res.accepted).all()
    # With nothing gated, result equals the standard fusion (scan="auto"
    # resolves to the sequential path on the CPU test platform — same
    # trace-time choice fuse_core makes; the sequential≡parallel parity has
    # its own tests in test_kalman_parallel).
    from gps_optimize_slam_tpu.ops import kalman

    up, uq = kalman.fuse_ekf_rts(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(s3p), jnp.asarray(s3q), jnp.asarray(gps), jnp.asarray(valid),
        EKFConfig(), RTSDecisionConfig(),
    )
    np.testing.assert_allclose(np.asarray(res.positions), np.asarray(up), atol=1e-10)


def make_drifting_graph(n=60, seed=0, drift=0.02):
    """Ground-truth loop trajectory + drifting odometry measurements."""
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 2 * np.pi, n)
    gt_pos = np.stack([np.cos(ang) * 20, np.sin(ang) * 20, np.zeros(n)], -1)
    yaw = ang + np.pi / 2
    gt_quat = Rotation.from_euler("z", yaw[:, None]).as_quat()
    # True relatives + drift noise.
    from gps_optimize_slam_tpu.ops import se3

    dp, dq = se3.relative_poses_along(jnp.asarray(gt_pos), jnp.asarray(gt_quat))
    dp = np.array(dp) + rng.normal(size=(n - 1, 3)) * drift
    dq = np.array(dq)  # writable copy (scipy rejects jax's read-only views)
    return gt_pos, gt_quat, dp, dq


def integrate_odometry(p0, q0, dp, dq):
    pos = [p0]
    qs = [q0]
    for i in range(len(dp)):
        r = Rotation.from_quat(qs[-1])
        pos.append(pos[-1] + r.apply(dp[i]))
        qs.append((r * Rotation.from_quat(dq[i])).as_quat())
    return np.asarray(pos), np.asarray(qs)


def test_pose_graph_gps_priors_remove_drift():
    gt_pos, gt_quat, dp, dq = make_drifting_graph()
    init_pos, init_quat = integrate_odometry(gt_pos[0], gt_quat[0], dp, dq)
    drift_err = np.linalg.norm(init_pos - gt_pos, axis=1).max()
    assert drift_err > 0.1  # odometry alone drifts

    gps_valid = np.zeros(len(gt_pos), bool)
    gps_valid[::4] = True  # sparse GPS priors
    data = pose_graph.build_data_from_fusion(
        jnp.asarray(init_pos) * 0 + jnp.asarray(init_pos),  # odometry source
        jnp.asarray(init_quat),
        jnp.asarray(gt_pos),
        jnp.asarray(gps_valid),
    )
    # Use the noisy measured odometry, not relatives of the init guess.
    data = data._replace(odo_dp=jnp.asarray(dp), odo_dq=jnp.asarray(dq))
    res = pose_graph.solve_pose_graph(
        pose_graph.PoseGraphState(jnp.asarray(init_pos), jnp.asarray(init_quat)),
        data,
        iterations=8,
    )
    costs = np.asarray(res.cost_history)
    assert costs[-1] < costs[0] * 0.1
    final_err = np.linalg.norm(np.asarray(res.state.positions) - gt_pos, axis=1)
    assert final_err.max() < drift_err * 0.5
    assert final_err.mean() < 0.15


def test_pose_graph_loop_closure():
    gt_pos, gt_quat, dp, dq = make_drifting_graph(seed=3, drift=0.05)
    init_pos, init_quat = integrate_odometry(gt_pos[0], gt_quat[0], dp, dq)
    n = len(gt_pos)
    # One loop closure: last pose sees the first (true relative).
    from gps_optimize_slam_tpu.ops import se3

    ldp, ldq = se3.relative_pose(
        jnp.asarray(gt_pos[n - 1]), jnp.asarray(gt_quat[n - 1]),
        jnp.asarray(gt_pos[0]), jnp.asarray(gt_quat[0]),
    )
    gps_valid = np.zeros(n, bool)
    gps_valid[0] = True  # anchor the gauge
    data = pose_graph.build_data_from_fusion(
        jnp.asarray(init_pos),
        jnp.asarray(init_quat),
        jnp.asarray(gt_pos),
        jnp.asarray(gps_valid),
        loop_ij=jnp.asarray([[n - 1, 0]], jnp.int32),
        loop_dp=ldp[None],
        loop_dq=ldq[None],
        loop_valid=jnp.asarray([True]),
    )
    data = data._replace(odo_dp=jnp.asarray(dp), odo_dq=jnp.asarray(dq))
    init_gap = np.linalg.norm(init_pos[-1] - gt_pos[-1])
    res = pose_graph.solve_pose_graph(
        pose_graph.PoseGraphState(jnp.asarray(init_pos), jnp.asarray(init_quat)),
        data,
        iterations=10,
    )
    # The loop closure must pull the trajectory ends back together.
    final_gap = np.linalg.norm(
        np.asarray(res.state.positions[-1]) - np.asarray(res.state.positions[0])
        - (gt_pos[-1] - gt_pos[0])
    )
    assert final_gap < init_gap * 0.2
    assert float(res.final_cost) < float(res.cost_history[0]) * 0.2


def test_pose_graph_exact_inputs_zero_cost():
    gt_pos, gt_quat, _, _ = make_drifting_graph(drift=0.0)
    from gps_optimize_slam_tpu.ops import se3

    dp, dq = se3.relative_poses_along(jnp.asarray(gt_pos), jnp.asarray(gt_quat))
    data = pose_graph.build_data_from_fusion(
        jnp.asarray(gt_pos), jnp.asarray(gt_quat),
        jnp.asarray(gt_pos), jnp.asarray(np.ones(len(gt_pos), bool)),
    )
    res = pose_graph.solve_pose_graph(
        pose_graph.PoseGraphState(jnp.asarray(gt_pos), jnp.asarray(gt_quat)),
        data,
        iterations=2,
    )
    assert float(res.final_cost) < 1e-12


def test_quaternion_exp_log_roundtrip():
    rng = np.random.default_rng(5)
    w = rng.normal(size=(64, 3))
    q = quat.exp_map(jnp.asarray(w))
    # Compare against scipy rotvec convention.
    q_ref = Rotation.from_rotvec(w).as_quat()
    dots = np.abs(np.sum(np.asarray(q) * q_ref, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-12)
    w2 = np.asarray(quat.log_map(q))
    # log∘exp is identity for |w| < pi.
    small = np.linalg.norm(w, axis=1) < np.pi
    np.testing.assert_allclose(w2[small], w[small], atol=1e-9)
    # Near-zero and exact-zero stability.
    z = quat.log_map(quat.exp_map(jnp.zeros((1, 3))))
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-12)


def test_propose_loop_closures_finds_revisit():
    """A figure-loop trajectory that revisits its start must yield exactly
    one (suppressed) closure pairing the revisit with the original pass."""
    n = 120
    ang = np.linspace(0, 2 * np.pi, n)  # closes back onto the start
    pos = np.stack([np.cos(ang) * 20 - 20, np.sin(ang) * 20, np.zeros(n)], -1)
    t = np.arange(n) * 1.0
    yaw = ang + np.pi / 2
    quats = Rotation.from_euler("z", yaw[:, None]).as_quat()
    loop_ij, loop_dp, loop_dq, loop_valid = pose_graph.propose_loop_closures(
        jnp.asarray(pos), jnp.asarray(t), jnp.asarray(quats),
        radius=3.0, min_time_gap=30.0, max_loops=8,
    )
    lv = np.asarray(loop_valid)
    ij = np.asarray(loop_ij)[lv]
    assert lv.sum() == 1, ij  # suppression: ONE closure for one revisit
    i, j = ij[0]
    assert j >= n - 3 and i <= 2  # end of loop sees the start
    # Measured relative pose read from the trajectory itself.
    d = np.linalg.norm(np.asarray(loop_dp)[lv][0])
    assert d < 3.0


def test_propose_loop_closures_no_false_positives():
    """A straight line never revisits: zero closures."""
    n = 80
    pos = np.stack([np.arange(n) * 2.0, np.zeros(n), np.zeros(n)], -1)
    t = np.arange(n) * 1.0
    quats = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))
    _, _, _, loop_valid = pose_graph.propose_loop_closures(
        jnp.asarray(pos), jnp.asarray(t), jnp.asarray(quats),
        radius=5.0, min_time_gap=10.0, max_loops=8,
    )
    assert not np.asarray(loop_valid).any()


def test_proposed_closures_close_a_drifting_loop():
    """End-to-end: proximity-PROPOSED closures (not hand-built factors) must
    pull a drifting loop back together (VERDICT r2 task 5)."""
    gt_pos, gt_quat, dp, dq = make_drifting_graph(n=60, seed=7, drift=0.05)
    init_pos, init_quat = integrate_odometry(gt_pos[0], gt_quat[0], dp, dq)
    n = len(gt_pos)
    t = np.arange(n) * 1.0
    # Propose from the DRIFTED estimate (what a real pipeline has), with a
    # radius generous enough to catch the drifted revisit.
    loop_ij, _, _, loop_valid = pose_graph.propose_loop_closures(
        jnp.asarray(init_pos), jnp.asarray(t), jnp.asarray(init_quat),
        radius=8.0, min_time_gap=20.0, max_loops=4,
    )
    assert np.asarray(loop_valid).any()
    # Measurements from the TRUE local geometry (stand-in for locally
    # drift-free SLAM), exactly like pipeline.refine_pose_graph reads them
    # from the Sim3 trajectory.
    from gps_optimize_slam_tpu.ops import quaternion as qops

    i_sel, j_sel = loop_ij[:, 0], loop_ij[:, 1]
    qinv = qops.conj(qops.normalize(jnp.asarray(gt_quat)[i_sel]))
    ldp = qops.rotate(qinv, jnp.asarray(gt_pos)[j_sel] - jnp.asarray(gt_pos)[i_sel])
    ldq = qops.mul(qinv, qops.normalize(jnp.asarray(gt_quat)[j_sel]))

    gps_valid = np.zeros(n, bool)
    gps_valid[0] = True  # gauge anchor only — closures must do the work
    data = pose_graph.build_data_from_fusion(
        jnp.asarray(init_pos), jnp.asarray(init_quat),
        jnp.asarray(gt_pos), jnp.asarray(gps_valid),
        loop_ij=loop_ij, loop_dp=ldp, loop_dq=ldq, loop_valid=loop_valid,
    )
    data = data._replace(odo_dp=jnp.asarray(dp), odo_dq=jnp.asarray(dq))
    res = pose_graph.solve_pose_graph(
        pose_graph.PoseGraphState(jnp.asarray(init_pos), jnp.asarray(init_quat)),
        data, iterations=10,
    )
    init_gap = np.linalg.norm(init_pos[-1] - init_pos[0] - (gt_pos[-1] - gt_pos[0]))
    final_gap = np.linalg.norm(
        np.asarray(res.state.positions[-1]) - np.asarray(res.state.positions[0])
        - (gt_pos[-1] - gt_pos[0])
    )
    assert final_gap < init_gap * 0.25, (final_gap, init_gap)


def test_pose_graph_checkpoint_resume(tmp_path):
    """Kill/resume reproduces the uninterrupted optimisation exactly
    (VERDICT r1 task 9: orbax checkpointing wired into the one
    long-running loop)."""
    gt_pos, gt_quat, dp, dq = make_drifting_graph(n=40, seed=2)
    init_pos, init_quat = integrate_odometry(gt_pos[0], gt_quat[0], dp, dq)
    gps_valid = np.zeros(len(gt_pos), bool)
    gps_valid[::4] = True
    data = pose_graph.build_data_from_fusion(
        jnp.asarray(init_pos), jnp.asarray(init_quat),
        jnp.asarray(gt_pos), jnp.asarray(gps_valid),
    )
    data = data._replace(odo_dp=jnp.asarray(dp), odo_dq=jnp.asarray(dq))
    init = pose_graph.PoseGraphState(jnp.asarray(init_pos), jnp.asarray(init_quat))

    ref = pose_graph.solve_pose_graph(init, data, iterations=6)

    ckdir = str(tmp_path / "pg_ckpt")
    # "Crash" after 4 of 6 iterations (2 rounds of 2)...
    partial = pose_graph.solve_pose_graph_checkpointed(
        init, data, iterations=4, checkpoint_every=2, checkpoint_dir=ckdir
    )
    assert np.asarray(partial.cost_history).shape == (5,)
    # ...then resume to completion: picks up at iteration 4, runs 2 more.
    res = pose_graph.solve_pose_graph_checkpointed(
        init, data, iterations=6, checkpoint_every=2, checkpoint_dir=ckdir
    )
    np.testing.assert_allclose(
        np.asarray(res.state.positions), np.asarray(ref.state.positions), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-12
    )


def test_gate_fixed_point_flag_and_truncation_warning(caplog):
    """n_iterations too small to reach the accept-mask fixed point ⇒
    gate_converged=False + a structured warning naming the knob; enough
    iterations ⇒ converged, silent, and early-exit does not change the
    result (ADVICE r4: parallel/chunked decisions fold in one pass late)."""
    import logging

    from gps_optimize_slam_tpu.utils.logging import LOGGER_NAME

    outliers = [(40, np.array([30.0, -20.0, 5.0])), (90, np.array([0.0, 50.0, 0.0]))]
    t, pos, quats, s3p, s3q, gps, valid = setup_fusion_inputs(outliers=outliers)
    args = (
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(s3p), jnp.asarray(s3q), jnp.asarray(gps), jnp.asarray(valid),
    )
    # One pass rejects the outliers but cannot have verified stability.
    with caplog.at_level(logging.WARNING, logger=LOGGER_NAME):
        res1 = robust.fuse_robust(*args, n_iterations=1, gate_mode="parallel")
    assert not bool(np.asarray(res1.gate_converged))
    assert any("fixed point" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger=LOGGER_NAME):
        res = robust.fuse_robust(*args, n_iterations=8, gate_mode="parallel")
    assert bool(np.asarray(res.gate_converged))
    assert not caplog.records
    acc = np.asarray(res.accepted)
    assert not acc[40] and not acc[90]
    # Early exit must reproduce the fixed cap's output exactly.
    res2 = robust.fuse_robust(*args, n_iterations=2, gate_mode="parallel")
    np.testing.assert_array_equal(np.asarray(res.accepted), np.asarray(res2.accepted))
    np.testing.assert_array_equal(
        np.asarray(res.positions), np.asarray(res2.positions)
    )
