"""Out-of-core robust fusion (models.robust.fuse_robust_chunked) and the
O(log N) parallel gate (_parallel_nis) it streams.

The parallel gate folds decisions in on the NEXT iteration instead of
within the pass; both gates share their fixed points, verified here on
scenarios whose decisions stabilise (clear outliers, clean inliers).
Chunk sizes are chosen to split outlier sites and GPS outages across chunk
boundaries — the composite-element carries must compose exactly."""

import numpy as np
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.models import robust
from tests.test_extensions import setup_fusion_inputs


def _with_outage(n=160, seed=2, outliers=()):
    t, pos, quats, s3p, s3q, gps, valid = setup_fusion_inputs(
        n=n, seed=seed, outliers=outliers
    )
    valid[70:95] = False  # outage spanning a 48-chunk boundary
    gps = np.where(valid[:, None], gps, np.nan)
    return t, pos, quats, s3p, s3q, gps, valid


def test_parallel_gate_matches_sequential_fixed_point():
    outliers = [(40, np.array([30.0, -20.0, 5.0])), (96, np.array([0.0, 50.0, 0.0]))]
    t, pos, quats, s3p, s3q, gps, valid = _with_outage(outliers=outliers)
    args = (
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(s3p), jnp.asarray(s3q), jnp.asarray(gps), jnp.asarray(valid),
    )
    seq = robust.fuse_robust(*args, gate_mode="sequential")
    par = robust.fuse_robust(*args, gate_mode="parallel")
    np.testing.assert_array_equal(
        np.asarray(seq.accepted), np.asarray(par.accepted)
    )
    np.testing.assert_allclose(
        np.asarray(seq.positions), np.asarray(par.positions), atol=1e-9
    )
    # NIS values agree only in the decisions they induce: the sequential
    # gate folds its CURRENT pass's accepts into the filter state while the
    # parallel gate scores against the previous pass's — mid-sequence raw
    # scores differ slightly, the accept/reject sets (asserted above) and
    # trajectories coincide.
    assert (
        (np.asarray(seq.nis) <= robust.CHI2_3DOF_95)
        == (np.asarray(par.nis) <= robust.CHI2_3DOF_95)
    ).all()
    acc = np.asarray(par.accepted)
    assert not acc[40] and not acc[96]


def test_fuse_robust_chunked_matches_incore():
    outliers = [
        (47, np.array([25.0, 10.0, 0.0])),  # at a 48-chunk boundary
        (48, np.array([-15.0, 30.0, 2.0])),  # first step of chunk 2
        (120, np.array([0.0, -40.0, 8.0])),
    ]
    t, pos, quats, s3p, s3q, gps, valid = _with_outage(outliers=outliers)
    incore = robust.fuse_robust(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(s3p), jnp.asarray(s3q), jnp.asarray(gps), jnp.asarray(valid),
        gate_mode="parallel",
    )
    for chunk_size in (48, len(t) - 1):
        cp, cq, acc, nis = robust.fuse_robust_chunked(
            t, pos, quats, s3p[0], s3q[0], gps, valid,
            EKFConfig(), RTSDecisionConfig(),
            chunk_size=chunk_size,
        )
        np.testing.assert_array_equal(np.asarray(incore.accepted), acc)
        np.testing.assert_allclose(np.asarray(incore.positions), cp, atol=1e-10)
        np.testing.assert_allclose(np.asarray(incore.quaternions), cq, atol=1e-12)
        np.testing.assert_allclose(np.asarray(incore.nis), nis, rtol=1e-6, atol=1e-9)


def test_chunked_gate_rejects_outliers_and_protects_trajectory():
    outliers = [(40, np.array([30.0, -20.0, 5.0])), (90, np.array([0.0, 50.0, 0.0]))]
    t, pos, quats, s3p, s3q, gps, valid = setup_fusion_inputs(outliers=outliers)
    cp, _, acc, _ = robust.fuse_robust_chunked(
        t, pos, quats, s3p[0], s3q[0], gps, valid, chunk_size=64
    )
    assert not acc[40] and not acc[90]
    assert acc.sum() >= 140
    err = np.linalg.norm(cp - pos, axis=1)
    assert err.max() < 0.5, err.max()


def test_chunked_clean_data_accepts_everything():
    t, pos, quats, s3p, s3q, gps, valid = setup_fusion_inputs(n=120, seed=5)
    _, _, acc, nis = robust.fuse_robust_chunked(
        t, pos, quats, s3p[0], s3q[0], gps, valid, chunk_size=50
    )
    assert acc.all()
    assert nis[0] == 0.0
