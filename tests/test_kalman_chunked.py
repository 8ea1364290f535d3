"""Out-of-core chunked EKF+RTS (ops.kalman_chunked) vs the in-core
associative path: exact re-entrancy across chunk boundaries.

The chunk size is chosen to split outage runs, RTS segments, and recovery
points across chunk boundaries — the carries must compose exactly
(SURVEY §2.4 long-trajectory row; VERDICT r1 task 8)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.ops import kalman, kalman_chunked, kalman_parallel


def _scenario(n=160, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) * 0.1
    yaw = np.cumsum(rng.normal(0.02, 0.05, n))
    heading = np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n)], -1)
    pos = np.cumsum(0.3 * heading, 0)
    quat = np.stack([np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1)
    gps = pos * 1.02 + rng.normal(size=(n, 3)) * 0.05
    valid = np.ones(n, bool)
    valid[40:75] = False  # long outage spanning chunk boundaries
    valid[100:105] = False  # short outage
    valid[-10:] = False  # trailing outage (never smoothed)
    gps_nan = np.where(valid[:, None], gps, np.nan)
    return t, pos, quat, gps_nan, valid


@pytest.mark.parametrize("rts_mode", ["outage", "full"])
@pytest.mark.parametrize("chunk_size", [48, 159])  # 48: padded final chunk;
# 159: single exact chunk (n-1 steps)
def test_chunked_matches_parallel(rts_mode, chunk_size):
    t, pos, quat, gps_nan, valid = _scenario()
    ref_p, ref_q = kalman_parallel.fuse_ekf_rts_parallel(
        jnp.asarray(t),
        jnp.asarray(pos),
        jnp.asarray(quat),
        jnp.asarray(pos),
        jnp.asarray(quat),
        jnp.asarray(gps_nan),
        jnp.asarray(valid),
        EKFConfig(),
        RTSDecisionConfig(),
        rts_mode=rts_mode,
    )
    ch_p, ch_q = kalman_chunked.fuse_ekf_rts_chunked(
        t,
        pos,
        quat,
        pos[0],
        quat[0],
        gps_nan,
        valid,
        EKFConfig(),
        RTSDecisionConfig(),
        rts_mode=rts_mode,
        chunk_size=chunk_size,
    )
    np.testing.assert_allclose(np.asarray(ref_p), ch_p, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ref_q), ch_q, atol=1e-12)


def test_chunked_matches_sequential_reference_semantics():
    """Chunked output equals the sequential scan (reference semantics) too."""
    t, pos, quat, gps_nan, valid = _scenario(seed=3)
    ref_p, ref_q = kalman.fuse_ekf_rts(
        jnp.asarray(t),
        jnp.asarray(pos),
        jnp.asarray(quat),
        jnp.asarray(pos),
        jnp.asarray(quat),
        jnp.asarray(gps_nan),
        jnp.asarray(valid),
        EKFConfig(),
        RTSDecisionConfig(),
    )
    ch_p, _ = kalman_chunked.fuse_ekf_rts_chunked(
        t, pos, quat, pos[0], quat[0], gps_nan, valid, chunk_size=48
    )
    np.testing.assert_allclose(np.asarray(ref_p), ch_p, atol=1e-8)


def test_controls_numpy_matches_device():
    t, pos, quat, gps_nan, valid = _scenario(seed=5)
    avail, member, end = kalman_chunked.controls_numpy(
        t, quat, gps_nan, valid, RTSDecisionConfig()
    )
    ctl = kalman.precompute_controls(
        jnp.asarray(t), jnp.asarray(quat), jnp.asarray(gps_nan), jnp.asarray(valid)
    )
    np.testing.assert_array_equal(avail, np.asarray(ctl.avail))
    np.testing.assert_array_equal(member, np.asarray(ctl.rts_member))
    np.testing.assert_array_equal(end, np.asarray(ctl.rts_end))
