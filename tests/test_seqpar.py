"""Sequence parallelism (parallel.seqpar): one trajectory's pose axis
sharded over the virtual 8-device CPU mesh must match the single-device
associative-scan filter to float round-off — including across outages,
RTS membership boundaries, rts_mode="full", and non-mesh-multiple lengths
(padding path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.ops import kalman_parallel
from gps_optimize_slam_tpu.parallel import seqpar
from gps_optimize_slam_tpu.parallel.mesh import make_mesh


def _traj(n, seed=0, outages=((60, 100), (150, 170))):
    rng = np.random.default_rng(seed)
    t = np.arange(n) * 0.1 + 0.01 * rng.random(n)
    yaw = np.cumsum(rng.normal(0.01, 0.02, n))
    heading = np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n)], -1)
    pos = np.cumsum(0.3 * heading, 0)
    quat = np.stack(
        [np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1
    )
    gps = pos + rng.normal(size=(n, 3)) * 0.05
    valid = np.ones(n, bool)
    for a, b in outages:
        valid[a:b] = False
    gps = np.where(valid[:, None], gps, np.nan)
    return (
        jnp.asarray(t),
        jnp.asarray(pos),
        jnp.asarray(quat),
        jnp.asarray(gps),
        jnp.asarray(valid),
    )


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    return make_mesh(n_devices=8)


@pytest.mark.parametrize("n", [256, 251])  # mesh multiple + padding path
@pytest.mark.parametrize("rts_mode", ["outage", "full"])
def test_seqparallel_matches_single_device(mesh8, n, rts_mode):
    t, pos, quat, gps, valid = _traj(n)
    ref_p, ref_q = kalman_parallel.fuse_ekf_rts_parallel(
        t, pos, quat, pos, quat, gps, valid,
        EKFConfig(), RTSDecisionConfig(), rts_mode=rts_mode,
    )
    got_p, got_q = seqpar.fuse_ekf_rts_seqparallel(
        mesh8, t, pos, quat, pos, quat, gps, valid,
        EKFConfig(), RTSDecisionConfig(), rts_mode=rts_mode,
    )
    assert got_p.shape == ref_p.shape
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p), atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q), atol=1e-10)


def test_seqparallel_output_sharded(mesh8):
    """The scan outputs stay sharded over the mesh (no silent full gather
    back onto one device inside the jitted program)."""
    t, pos, quat, gps, valid = _traj(256)
    scan_fn = seqpar.sequence_parallel_scan(mesh8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh8, P(*mesh8.axis_names))
    comps = tuple(
        jax.device_put(jnp.asarray(np.random.default_rng(i).normal(size=256)), shard)
        for i in range(4)
    )

    def combine(a, b):
        return tuple(x + y for x, y in zip(a, b))

    out = jax.jit(lambda c: scan_fn(combine, c))(comps)
    assert len(out[0].sharding.device_set) == 8
    # Cross-check: a plain cumulative sum.
    np.testing.assert_allclose(
        np.asarray(out[0]), np.cumsum(np.asarray(comps[0])), rtol=1e-12
    )


def test_chunked_composes_with_seqpar(mesh8):
    """Host chunks × device blocks: fuse_ekf_rts_chunked(scan_fn=...) runs
    each chunk's three associative scans sharded over the mesh and still
    matches the single-device unchunked filter (>HBM sequence parallelism).
    chunk_size = k·D − 1 so each scan's chunk_size+1 elements split evenly."""
    from gps_optimize_slam_tpu.ops import kalman_chunked

    n = 200
    t, pos, quat, gps, valid = _traj(n)
    ref_p, ref_q = kalman_parallel.fuse_ekf_rts_parallel(
        t, pos, quat, pos, quat, gps, valid, EKFConfig(), RTSDecisionConfig()
    )
    scan_fn = seqpar.sequence_parallel_scan(mesh8)
    got_p, got_q = kalman_chunked.fuse_ekf_rts_chunked(
        np.asarray(t), np.asarray(pos), np.asarray(quat),
        np.asarray(pos[0]), np.asarray(quat[0]),
        np.asarray(gps), np.asarray(valid),
        EKFConfig(), RTSDecisionConfig(),
        chunk_size=8 * 8 - 1, scan_fn=scan_fn,
    )
    np.testing.assert_allclose(got_p, np.asarray(ref_p), atol=1e-8)
    np.testing.assert_allclose(got_q, np.asarray(ref_q), atol=1e-10)


def test_sequence_parallel_scan_reverse(mesh8):
    scan_fn = seqpar.sequence_parallel_scan(mesh8)
    x = (jnp.asarray(np.random.default_rng(0).normal(size=64)),)

    def combine(a, b):
        return (a[0] + b[0],)

    out = scan_fn(combine, x, reverse=True)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.cumsum(np.asarray(x[0])[::-1])[::-1], rtol=1e-12
    )
