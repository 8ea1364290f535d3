"""Multi-sequence batching + mesh sharding tests on the virtual 8-device
CPU platform (the standard way to validate sharding without a TPU pod)."""

import numpy as np
import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu import pipeline
from gps_optimize_slam_tpu.config import FusionConfig
from gps_optimize_slam_tpu.models import fusion
from gps_optimize_slam_tpu.parallel import batch as pbatch
from gps_optimize_slam_tpu.parallel import mesh as pmesh
from tests.conftest import reference_fixture
from tests.test_kalman import make_traj


def make_sequences(n_seqs=4, base_n=90):
    """Synthetic sequences of different lengths with gaps/outages."""
    slams, gts, gps_list, valids = [], [], [], []
    rng = np.random.default_rng(0)
    for i in range(n_seqs):
        n = base_n + 13 * i
        t, pos, quats = make_traj(n=n, seed=i, turn_span=(40, 50) if i % 2 else None)
        slams.append({"timestamps": t, "positions": pos, "quaternions": quats})
        # GPS: noisy scaled copy at a different rate, with an outage.
        m = int(n * 0.9)
        gt = np.linspace(t[0], t[-1], m)
        gp = np.stack(
            [np.interp(gt, t, pos[:, k]) for k in range(3)], -1
        ) * 1.01 + rng.normal(size=(m, 3)) * 0.05
        val = np.ones(m, bool)
        val[m // 3 : m // 3 + 10] = False
        gts.append(gt)
        gps_list.append(gp)
        valids.append(val)
    return slams, gts, gps_list, valids


def test_vmapped_batch_matches_individual():
    slams, gts, gps_list, valids = make_sequences()
    b = pbatch.pad_batch(slams, gts, gps_list, valids)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4))
    out = pmesh.fuse_batch(b, keys, dtype=jnp.float64)
    for i in range(4):
        single = fusion.fuse_core(
            jnp.asarray(slams[i]["timestamps"]),
            jnp.asarray(slams[i]["positions"]),
            jnp.asarray(slams[i]["quaternions"]),
            jnp.asarray(gts[i]),
            jnp.asarray(gps_list[i]),
            jnp.asarray(valids[i]),
            jax.random.PRNGKey(i),
        )
        n = len(slams[i]["timestamps"])
        assert bool(out.ok[i]) and bool(single.ok)
        # Padded batch result == standalone result on the real poses.
        np.testing.assert_allclose(
            np.asarray(out.corrected_pos[i, :n]),
            np.asarray(single.corrected_pos),
            atol=1e-9,
        )
        assert abs(float(out.sim3.scale[i]) - float(single.sim3.scale)) < 1e-9


def test_sharded_mesh_matches_unsharded():
    assert len(jax.devices()) >= 8, "virtual 8-device CPU platform required"
    slams, gts, gps_list, valids = make_sequences(n_seqs=8, base_n=60)
    b = pbatch.pad_batch(slams, gts, gps_list, valids)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(8))
    plain = pmesh.fuse_batch(b, keys, dtype=jnp.float64)
    mesh = pmesh.make_mesh(n_devices=8)
    sharded = pmesh.fuse_batch(b, keys, mesh=mesh, dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(sharded.corrected_pos), np.asarray(plain.corrected_pos), atol=1e-12
    )
    # Outputs actually live on the mesh sharding.
    shard_devices = {s.device for s in sharded.corrected_pos.addressable_shards}
    assert len(shard_devices) == 8


def test_batched_evaluation():
    slams, gts, gps_list, valids = make_sequences(n_seqs=4, base_n=60)
    b = pbatch.pad_batch(slams, gts, gps_list, valids)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4))
    out = pmesh.fuse_batch(b, keys, dtype=jnp.float64)
    ev = pmesh.evaluate_batch(b, out)
    assert ev.nn_ekf.rmse.shape == (4,)
    assert np.all(np.asarray(ev.nn_ekf.rmse) < 1.0)
    # Shortest sequence spans ~6 s, so only a few points clear the 5 s gate.
    assert np.all(np.asarray(ev.nn_ekf.count) > 5)


def test_fixture_in_batch_keeps_golden_parity():
    # The real seq-04 padded into a batch with synthetic partners must
    # still match its standalone (golden-verified) result bit-for-bit-ish.
    import os

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "seq04_golden.npz")
    )
    from gps_optimize_slam_tpu.io import tum as tum_io

    slam = tum_io.read_tum(reference_fixture("yolotum04.txt"))
    cfg = FusionConfig()
    gps = pipeline.load_and_project_gps(
        reference_fixture("combined_output.txt"), cfg.gps_filtering_ransac
    )
    s2, g2t, g2p, g2v = make_sequences(n_seqs=1, base_n=100)
    b = pbatch.pad_batch(
        [slam] + s2,
        [gps.timestamps] + g2t,
        [gps.positions] + g2p,
        [gps.valid] + g2v,
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(2))
    out = pmesh.fuse_batch(b, keys, dtype=jnp.float64)
    n = len(slam["timestamps"])
    diff = np.abs(np.asarray(out.corrected_pos[0, :n]) - golden["corrected_pos"])
    assert diff.max() < 1e-6
