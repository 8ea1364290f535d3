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
    # base_n=60 shares the padded batch shape (and so the compiled program,
    # within this module) with test_batched_evaluation below.
    slams, gts, gps_list, valids = make_sequences(n_seqs=4, base_n=60)
    b = pbatch.pad_batch(slams, gts, gps_list, valids)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4))
    out = pmesh.fuse_batch(b, keys, dtype=jnp.float64)
    # Two spot sequences (shortest + longest) instead of all four: each
    # standalone fuse_core is a distinct-length program compile, and the
    # padding-equivalence evidence is identical for the middle lengths.
    for i in (0, 3):
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


def test_non_divisible_batch_shards_and_matches():
    # VERDICT r1 #4: batch sizes that don't divide the mesh must work —
    # 11 KITTI-like sequences over 8 devices (batch axis padded internally).
    assert len(jax.devices()) >= 8
    slams, gts, gps_list, valids = make_sequences(n_seqs=11, base_n=40)
    b = pbatch.pad_batch(slams, gts, gps_list, valids)
    keys = np.asarray(jax.vmap(jax.random.PRNGKey)(jnp.arange(11)))
    mesh = pmesh.make_mesh(n_devices=8)
    sharded = pmesh.fuse_batch(b, keys, mesh=mesh, dtype=jnp.float64)
    assert sharded.corrected_pos.shape[0] == 11
    plain = pmesh.fuse_batch(b, keys, dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(sharded.corrected_pos), np.asarray(plain.corrected_pos), atol=1e-12
    )
    assert np.asarray(sharded.ok).all()


def test_fuse_batch_hermetic_to_mesh_devices():
    # VERDICT r1 #1: the sharded path must never dispatch on the DEFAULT
    # backend. Build a mesh that excludes device 0 (the default device) and
    # assert no new array materialises there during the whole run.
    devices = jax.devices()
    assert len(devices) >= 8
    mesh_devs = devices[1:5]
    mesh = pmesh.make_mesh(devices=mesh_devs)

    slams, gts, gps_list, valids = make_sequences(n_seqs=4, base_n=40)
    b = pbatch.pad_batch(slams, gts, gps_list, valids)
    with jax.default_device(mesh_devs[0]):
        keys = np.asarray(jax.vmap(jax.random.PRNGKey)(jnp.arange(4)))

    import gc

    gc.collect()
    before = {id(a) for a in jax.live_arrays()}
    out = pmesh.fuse_batch(b, keys, mesh=mesh, dtype=jnp.float64)
    jax.block_until_ready(out.corrected_pos)
    ev = pmesh.evaluate_batch(b, out)
    jax.block_until_ready(ev.nn_ekf.rmse)
    offenders = [
        a
        for a in jax.live_arrays()
        if id(a) not in before and any(d == devices[0] for d in a.devices())
    ]
    assert not offenders, (
        f"{len(offenders)} arrays materialised on the default device "
        f"{devices[0]} during a mesh-sharded run"
    )
    assert np.asarray(out.ok).all()


def test_dryrun_multichip_entrypoint():
    # The driver artifact path itself: must pass on the virtual CPU mesh.
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
    finally:
        sys.path.pop(0)


def test_stage_batch_detects_sorted_gps():
    """stage_batch verifies valid-GPS sortedness on host once; fuse_batch
    then runs the argsort-free alignment program — outputs must be identical
    to the explicit gps_sorted=False config. An unsorted batch must NOT set
    the flag."""
    slams, gts, gps_list, valids = make_sequences(n_seqs=2, base_n=60)
    keys = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(2)])
    b = pbatch.pad_batch(slams, gts, gps_list, valids)

    staged = pmesh.stage_batch(b, keys, dtype=jnp.float64)
    assert staged.gps_sorted  # synthetic streams are time-ordered

    out_auto = pmesh.fuse_batch(staged)  # runs with gps_sorted=True
    # Same device-resident inputs through the argsort-ing program (flag
    # stripped → fuse_batch keeps the default gps_sorted=False config).
    out_base = pmesh.fuse_batch(staged._replace(gps_sorted=False))
    np.testing.assert_allclose(
        np.asarray(out_auto.corrected_pos),
        np.asarray(out_base.corrected_pos),
        atol=1e-12,
    )

    # Scramble one sequence's valid GPS times → flag must stay off.
    gts2 = [g.copy() for g in gts]
    gts2[0][5], gts2[0][20] = gts2[0][20], gts2[0][5]
    b2 = pbatch.pad_batch(slams, gts2, gps_list, valids)
    staged2 = pmesh.stage_batch(b2, keys, dtype=jnp.float64)
    assert not staged2.gps_sorted


def test_fuse_batch_time_offsets():
    # VERDICT r1 #6: per-sequence clock offsets must flow through the
    # batched path. Shift one sequence's GPS clock and pass the correcting
    # offset — results must match the unshifted run.
    slams, gts, gps_list, valids = make_sequences(n_seqs=2, base_n=60)
    keys = np.asarray(jax.vmap(jax.random.PRNGKey)(jnp.arange(2)))
    base = pmesh.fuse_batch(
        pbatch.pad_batch(slams, gts, gps_list, valids), keys, dtype=jnp.float64
    )
    shifted_gts = [gts[0] + 2.0, gts[1]]
    out = pmesh.fuse_batch(
        pbatch.pad_batch(slams, shifted_gts, gps_list, valids),
        keys,
        dtype=jnp.float64,
        time_offsets=np.array([-2.0, 0.0]),
    )
    np.testing.assert_allclose(
        np.asarray(out.corrected_pos), np.asarray(base.corrected_pos), atol=1e-9
    )


def test_stage_batch_reuse_skips_transfer():
    """stage_batch once → repeated fuse_batch calls take device arrays
    through unchanged (no re-marshal/copy — VERDICT r2 task 7), on both the
    plain and the sharded path, matching the host-staged result."""
    slams, gts, gps_list, valids = make_sequences(n_seqs=8, base_n=60)
    b = pbatch.pad_batch(slams, gts, gps_list, valids)
    keys = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(8)])

    ref = pmesh.fuse_batch(b, keys, dtype=jnp.float64)

    staged = pmesh.stage_batch(b, keys, dtype=jnp.float64)
    out1 = pmesh.fuse_batch(staged)
    np.testing.assert_allclose(
        np.asarray(out1.corrected_pos), np.asarray(ref.corrected_pos), atol=0
    )
    # Restaging already-staged leaves is an identity (same buffers).
    b2 = pbatch.SequenceBatch(
        slam_times=staged.args[0], slam_pos=staged.args[1],
        slam_quat=staged.args[2], gps_times=staged.args[3],
        gps_pos=staged.args[4], gps_valid=staged.args[5],
        slam_mask=staged.args[7], n_slam=b.n_slam, n_gps=b.n_gps,
    )
    staged2 = pmesh.stage_batch(
        b2, staged.args[6], dtype=jnp.float64, time_offsets=staged.args[8]
    )
    for a, b_ in zip(staged.args, staged2.args):
        assert a is b_, "already-staged leaf was copied"

    mesh = pmesh.make_mesh(n_devices=8)
    staged_m = pmesh.stage_batch(b, keys, mesh=mesh, dtype=jnp.float64)
    out_m = pmesh.fuse_batch(staged_m, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out_m.corrected_pos), np.asarray(ref.corrected_pos), atol=1e-12
    )
