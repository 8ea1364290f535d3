"""Parallel (associative-scan) EKF/RTS must match the sequential scans to
float round-off across every outage scenario, and keep golden parity."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gps_optimize_slam_tpu.config import EKFConfig, FusionConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.ops import kalman, kalman_parallel
from tests.test_kalman import make_traj


def compare(valid, turn_span=None, seed=0, n=120, atol=1e-8):
    t, pos, quats = make_traj(n=n, seed=seed, turn_span=turn_span)
    rng = np.random.default_rng(seed + 100)
    sim3_pos = pos * 0.99 + np.array([3.0, -2.0, 0.5])
    sim3_quat = quats.copy()
    gps = sim3_pos + rng.normal(size=pos.shape) * 0.1
    gps[~valid] = np.nan

    args = (
        jnp.asarray(t),
        jnp.asarray(pos),
        jnp.asarray(quats),
        jnp.asarray(sim3_pos),
        jnp.asarray(sim3_quat),
        jnp.asarray(gps),
        jnp.asarray(valid),
        EKFConfig(),
        RTSDecisionConfig(),
    )
    sp, sq = kalman.fuse_ekf_rts(*args)
    pp, pq = kalman_parallel.fuse_ekf_rts_parallel(*args)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(sp), atol=atol)
    dots = np.abs(np.sum(np.asarray(pq) * np.asarray(sq), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=atol)


def test_all_available():
    compare(np.ones(120, bool))


def test_mid_outage_rts():
    v = np.ones(120, bool)
    v[40:70] = False
    compare(v)


def test_sharp_turn_outage():
    v = np.ones(120, bool)
    v[40:70] = False
    compare(v, turn_span=(45, 60))


def test_initial_and_trailing_outages():
    v = np.ones(150, bool)
    v[:20] = False
    v[130:] = False
    compare(v, n=150)


def test_multiple_outages():
    v = np.ones(200, bool)
    v[30:50] = False
    v[90:110] = False
    v[150:160] = False
    compare(v, turn_span=(95, 105), n=200)


def test_sparse_gps():
    v = np.zeros(120, bool)
    v[::5] = True
    compare(v)


def test_rejects_blending_config():
    with pytest.raises(ValueError):
        kalman_parallel.fuse_ekf_rts_parallel(
            jnp.zeros(4),
            jnp.zeros((4, 3)),
            jnp.zeros((4, 4)).at[:, 3].set(1.0),
            jnp.zeros((4, 3)),
            jnp.zeros((4, 4)).at[:, 3].set(1.0),
            jnp.zeros((4, 3)),
            jnp.ones(4, bool),
            EKFConfig(),
            RTSDecisionConfig(default_ekf_transition_steps_on_sharp_turn=5),
        )


def test_golden_parity_with_parallel_scan():
    from gps_optimize_slam_tpu import pipeline
    from tests.conftest import reference_fixture

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "seq04_golden.npz")
    )
    res = pipeline.fuse_files(
        slam_path=reference_fixture("yolotum04.txt"),
        gps_path=reference_fixture("combined_output.txt"),
        config=FusionConfig(ekf_scan="parallel"),
        frame="utm",
    )
    diff = np.abs(res.corrected_pos - golden["corrected_pos"])
    assert diff.max() < 1e-6, f"max deviation {diff.max():.3e} m"
