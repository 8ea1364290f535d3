"""Unit tests for SE(3)/Sim(3) ops against a NumPy/scipy mirror of the
reference's calculate_relative_pose and transform_trajectory."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gps_optimize_slam_tpu.ops import se3


def ref_relative_pose(p1, q1, p2, q2):
    """Mirror of EKFGPSSLAM.py:77-92."""
    rot1 = Rotation.from_quat(q1)
    rot1_inv = rot1.inv()
    rot2 = Rotation.from_quat(q2)
    delta_pos_local = rot1_inv.apply(p2 - p1)
    delta_quat = (rot1_inv * rot2).as_quat()
    return delta_pos_local, delta_quat


def ref_transform_trajectory(pos, quats, R, t, s):
    """Mirror of EKFGPSSLAM.py:461-467."""
    trans_pos = s * (pos @ R.T) + t
    R_rot = Rotation.from_matrix(R)
    tq = np.array([(R_rot * Rotation.from_quat(q)).as_quat() for q in quats])
    return trans_pos, tq


def test_relative_pose_matches_reference():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(32, 3)) * 10
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)

    dp, dq = se3.relative_pose(
        jnp.asarray(p[:-1]), jnp.asarray(q[:-1]), jnp.asarray(p[1:]), jnp.asarray(q[1:])
    )
    for i in range(31):
        rdp, rdq = ref_relative_pose(p[i], q[i], p[i + 1], q[i + 1])
        np.testing.assert_allclose(np.asarray(dp)[i], rdp, atol=1e-12)
        assert abs(np.dot(np.asarray(dq)[i], rdq)) > 1 - 1e-12


def test_relative_pose_degenerate_quat_zero_motion():
    p1 = jnp.asarray([1.0, 2.0, 3.0])
    p2 = jnp.asarray([4.0, 5.0, 6.0])
    q_bad = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    q_ok = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    dp, dq = se3.relative_pose(p1, q_bad, p2, q_ok)
    np.testing.assert_allclose(np.asarray(dp), 0.0, atol=0)
    np.testing.assert_allclose(np.asarray(dq), [0, 0, 0, 1], atol=0)


def test_compose_roundtrips_relative_pose():
    rng = np.random.default_rng(1)
    p = rng.normal(size=(8, 3))
    q = rng.normal(size=(8, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    dp, dq = se3.relative_poses_along(jnp.asarray(p), jnp.asarray(q))
    p2, q2 = se3.compose(jnp.asarray(p[:-1]), jnp.asarray(q[:-1]), dp, dq)
    np.testing.assert_allclose(np.asarray(p2), p[1:], atol=1e-12)
    dot = np.abs(np.sum(np.asarray(q2) * q[1:], axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-12)


def test_transform_trajectory_matches_reference():
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(64, 3)) * 100
    quats = rng.normal(size=(64, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    R = Rotation.from_rotvec([0.1, -0.3, 0.7]).as_matrix()
    t = np.array([10.0, -5.0, 2.0])
    s = 0.987

    ours_p, ours_q = se3.transform_trajectory(
        jnp.asarray(pos), jnp.asarray(quats), jnp.asarray(R), jnp.asarray(t), s
    )
    ref_p, ref_q = ref_transform_trajectory(pos, quats, R, t, s)
    np.testing.assert_allclose(np.asarray(ours_p), ref_p, atol=1e-9)
    dot = np.abs(np.sum(np.asarray(ours_q) * ref_q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-12)
