"""Unit tests for quaternion ops against scipy.spatial.transform.Rotation,
the implementation the reference pipeline is built on (EKFGPSSLAM.py:4)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from gps_optimize_slam_tpu.ops import quaternion as quat


def random_unit_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_mul_matches_scipy():
    q1 = random_unit_quats(64, 1)
    q2 = random_unit_quats(64, 2)
    ours = np.asarray(quat.mul(jnp.asarray(q1), jnp.asarray(q2)))
    theirs = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
    # Quaternions are sign-ambiguous; compare rotations.
    dot = np.abs(np.sum(ours * theirs, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-12)


def test_rotate_matches_scipy():
    q = random_unit_quats(64, 3)
    v = np.random.default_rng(4).normal(size=(64, 3))
    ours = np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(v)))
    theirs = Rotation.from_quat(q).apply(v)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_conj_is_inverse_rotation():
    q = random_unit_quats(16, 5)
    v = np.random.default_rng(6).normal(size=(16, 3))
    back = np.asarray(
        quat.rotate(quat.conj(jnp.asarray(q)), quat.rotate(jnp.asarray(q), jnp.asarray(v)))
    )
    np.testing.assert_allclose(back, v, atol=1e-12)


def test_to_matrix_matches_scipy():
    q = random_unit_quats(64, 7)
    ours = np.asarray(quat.to_matrix(jnp.asarray(q)))
    theirs = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_from_matrix_roundtrip_and_scipy():
    q = random_unit_quats(128, 8)
    m = Rotation.from_quat(q).as_matrix()
    ours = np.asarray(quat.from_matrix(jnp.asarray(m)))
    theirs = Rotation.from_matrix(m).as_quat()
    dot = np.abs(np.sum(ours * theirs, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-12)
    # And the matrix reconstructs.
    m2 = np.asarray(quat.to_matrix(jnp.asarray(ours)))
    np.testing.assert_allclose(m2, m, atol=1e-12)


def test_from_matrix_edge_cases():
    # 180-degree rotations about each axis stress each branch.
    for axis in np.eye(3):
        m = Rotation.from_rotvec(np.pi * axis).as_matrix()
        ours = np.asarray(quat.from_matrix(jnp.asarray(m)))
        m2 = np.asarray(quat.to_matrix(jnp.asarray(ours)))
        np.testing.assert_allclose(m2, m, atol=1e-12)
    # Identity.
    ours = np.asarray(quat.from_matrix(jnp.eye(3)))
    np.testing.assert_allclose(ours, [0, 0, 0, 1], atol=1e-12)


def test_normalize_degenerate_becomes_identity():
    q = jnp.asarray([[0.0, 0.0, 0.0, 0.0], [1e-12, 0.0, 0.0, 0.0]])
    out = np.asarray(quat.normalize(q))
    np.testing.assert_allclose(out, [[0, 0, 0, 1], [0, 0, 0, 1]], atol=0)


def test_nlerp_matches_reference_semantics():
    # Mirror of quaternion_nlerp (EKFGPSSLAM.py:94-105).
    def ref_nlerp(q1, q2, w):
        dot = np.dot(q1, q2)
        if dot < 0.0:
            q2 = -q2
        w = np.clip(w, 0.0, 1.0)
        qi = (1.0 - w) * q1 + w * q2
        n = np.linalg.norm(qi)
        if n < 1e-9:
            return q1 if w < 0.5 else q2
        return qi / n

    rng = np.random.default_rng(9)
    for _ in range(20):
        q1 = rng.normal(size=4)
        q1 /= np.linalg.norm(q1)
        q2 = rng.normal(size=4)
        q2 /= np.linalg.norm(q2)
        for w in [0.0, 0.3, 0.5, 0.77, 1.0, 1.5, -0.2]:
            ours = np.asarray(quat.nlerp(jnp.asarray(q1), jnp.asarray(q2), w))
            theirs = ref_nlerp(q1, q2, w)
            np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_yaw_matches_scipy_euler_zyx():
    q = random_unit_quats(256, 10)
    ours = np.asarray(quat.yaw(jnp.asarray(q)))
    theirs = Rotation.from_quat(q).as_euler("zyx", degrees=False)[:, 0]
    np.testing.assert_allclose(ours, theirs, atol=1e-9)
