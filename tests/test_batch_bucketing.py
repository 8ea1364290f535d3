"""Length-bucketed batching (VERDICT r1 task 4): per-sequence parity with
the single-batch path, and bounded padding waste.

NOTE kept in its own early-alphabet module: this test's three fresh
executables (two bucket shapes + the unbucketed reference) deterministically
segfaulted XLA:CPU's LLVM compile when they were the first cold compiles
after the FULL suite's accumulated JIT state (hundreds of loaded
executables) — while passing in any shorter run. Compiling them early in
the session avoids the corrupted-state window entirely; see ROADMAP.md.
"""

import numpy as np
import jax

from gps_optimize_slam_tpu.parallel import batch as pbatch
from gps_optimize_slam_tpu.parallel import mesh as pmesh
from tests.test_kalman import make_traj


def test_bucketed_fusion_matches_unbucketed():
    from gps_optimize_slam_tpu.parallel.batch import bucket_by_length

    # Strongly mixed lengths: several short, two long.
    lengths = [60, 70, 64, 260, 240]
    rng = np.random.default_rng(1)
    slams, gts, gps_list, valids = [], [], [], []
    for i, n in enumerate(lengths):
        t, pos, quats = make_traj(n=n, seed=i)
        slams.append({"timestamps": t, "positions": pos, "quaternions": quats})
        m = int(n * 0.9)
        gt = np.linspace(t[0], t[-1], m)
        gp = np.stack(
            [np.interp(gt, t, pos[:, k]) for k in range(3)], -1
        ) * 1.01 + rng.normal(size=(m, 3)) * 0.05
        gts.append(gt)
        gps_list.append(gp)
        valids.append(np.ones(m, bool))
    keys = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(len(lengths))])

    buckets = bucket_by_length(slams, gts, gps_list, valids, max_waste=2.0)
    assert len(buckets) == 2  # shorts together, longs together
    for idxs, b in buckets:
        ls = [lengths[i] for i in idxs]
        assert max(ls) <= 2.0 * min(ls)

    per_seq = pmesh.fuse_buckets(buckets, keys)

    ref = pmesh.fuse_batch(pbatch.pad_batch(slams, gts, gps_list, valids), keys)
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(
            per_seq[i].corrected_pos,
            np.asarray(ref.corrected_pos)[i, :n],
            atol=1e-9,
        )
        assert per_seq[i].corrected_pos.shape == (n, 3)
        assert bool(per_seq[i].ok)


def _bucketed_inputs():
    lengths = [60, 70, 64, 260, 240]
    rng = np.random.default_rng(1)
    slams, gts, gps_list, valids = [], [], [], []
    for i, n in enumerate(lengths):
        t, pos, quats = make_traj(n=n, seed=i)
        slams.append({"timestamps": t, "positions": pos, "quaternions": quats})
        m = int(n * 0.9)
        gt = np.linspace(t[0], t[-1], m)
        gp = np.stack(
            [np.interp(gt, t, pos[:, k]) for k in range(3)], -1
        ) * 1.01 + rng.normal(size=(m, 3)) * 0.05
        gts.append(gt)
        gps_list.append(gp)
        valids.append(np.ones(m, bool))
    keys = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(len(lengths))])
    from gps_optimize_slam_tpu.parallel.batch import bucket_by_length

    return lengths, bucket_by_length(slams, gts, gps_list, valids, max_waste=2.0), keys


def test_checkpointed_sweep_resumes(tmp_path, monkeypatch):
    """fuse_buckets_checkpointed: parity with fuse_buckets, full restore
    without recompute, single-bucket recompute after losing one bucket's
    checkpoint, and a composition-mismatch guard.

    Same inputs as test_bucketed_fusion_matches_unbucketed so the bucket
    programs are already compiled in this module's jit cache."""
    lengths, buckets, keys = _bucketed_inputs()
    ckpt = str(tmp_path / "sweep")

    ref = pmesh.fuse_buckets(buckets, keys)
    got = pmesh.fuse_buckets_checkpointed(buckets, keys, ckpt)
    for i in range(len(lengths)):
        np.testing.assert_array_equal(got[i].corrected_pos, ref[i].corrected_pos)
        assert bool(got[i].ok) == bool(ref[i].ok)

    # Full resume: every bucket restored from disk; fusion must not run.
    def _boom(*a, **k):
        raise AssertionError("fuse_batch called during full restore")

    monkeypatch.setattr(pmesh, "fuse_batch", _boom)
    got2 = pmesh.fuse_buckets_checkpointed(buckets, keys, ckpt)
    for i in range(len(lengths)):
        np.testing.assert_array_equal(got2[i].corrected_pos, ref[i].corrected_pos)
        np.testing.assert_array_equal(got2[i].corrected_quat, ref[i].corrected_quat)
        assert float(got2[i].sim3.scale) == float(ref[i].sim3.scale)
    monkeypatch.undo()

    # Partial resume: drop one bucket's checkpoint -> exactly one recompute.
    import shutil

    shutil.rmtree(tmp_path / "sweep" / "bucket_0000")
    calls = []
    real = pmesh.fuse_batch

    def _counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pmesh, "fuse_batch", _counting)
    got3 = pmesh.fuse_buckets_checkpointed(buckets, keys, ckpt)
    assert len(calls) == 1
    for i in range(len(lengths)):
        np.testing.assert_array_equal(got3[i].corrected_pos, ref[i].corrected_pos)
    monkeypatch.undo()

    # Composition guard: same ckpt_dir, different bucket membership.
    import pytest

    swapped = list(buckets)
    swapped[0] = (swapped[0][0][::-1], swapped[0][1])
    with pytest.raises(ValueError, match="fresh ckpt_dir"):
        pmesh.fuse_buckets_checkpointed(swapped, keys, ckpt)
