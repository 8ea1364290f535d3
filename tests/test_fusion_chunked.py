"""Out-of-core RAW-GNSS fusion (ops.alignment_chunked +
models.fusion_chunked) vs the in-core fused program: the chunked path must
reproduce fuse_core on overlapping scales, with chunk boundaries chosen to
split GPS segments, splines, outage runs, and the Sim3 window
(VERDICT r2 task 3 — the end-to-end >HBM story)."""

import numpy as np
import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import FusionConfig
from gps_optimize_slam_tpu.models import fusion, fusion_chunked
from gps_optimize_slam_tpu.ops import alignment, alignment_chunked


def _scenario(n=600, seed=0):
    """SLAM stream + RAW GNSS: different clocks, gaps, duplicates, invalid
    fixes, an unsorted pocket — everything the raw loader tolerates."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) * 0.1
    yaw = np.cumsum(rng.normal(0.01, 0.03, n))
    heading = np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n)], -1)
    pos = np.cumsum(0.25 * heading, 0)
    pos[:, 2] = np.cumsum(rng.normal(0, 0.005, n))
    quat = np.stack([np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1)
    slam = (t, pos * 0.97, quat)  # monocular scale 0.97

    m = int(n * 0.9)
    gt = np.sort(rng.uniform(t[0], t[-1], m))
    gp = np.stack([np.interp(gt, t, pos[:, k]) for k in range(3)], -1)
    gp += rng.normal(size=(m, 3)) * 0.05
    gv = np.ones(m, bool)
    gv[rng.choice(m, 20, replace=False)] = False  # invalid fixes
    # A real GPS gap > threshold (outage) that crosses chunk boundaries.
    gap_lo, gap_hi = int(0.55 * m), int(0.65 * m)
    gv[gap_lo:gap_hi] = False
    # Duplicate timestamps (dedup keeps first).
    gt[m // 3 + 1] = gt[m // 3]
    return slam, (gt, gp, gv)


def test_chunked_alignment_matches_incore():
    (st, sp, sq), (gt, gp, gv) = _scenario()
    cfg = FusionConfig().time_alignment
    ref = alignment.align_gps_to_slam(
        jnp.asarray(st), jnp.asarray(gt), jnp.asarray(gp), gps_valid=jnp.asarray(gv),
        cfg=cfg,
    )
    aligned, valid = alignment_chunked.align_gps_to_slam_chunked(
        st, gt, gp, gps_valid=gv, cfg=cfg, chunk_size=128, halo=24
    )
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    fin = valid
    np.testing.assert_allclose(
        aligned[fin], np.asarray(ref.aligned)[fin], atol=1e-8
    )


def test_chunked_alignment_single_chunk_exact():
    (st, sp, sq), (gt, gp, gv) = _scenario(seed=2)
    cfg = FusionConfig().time_alignment
    ref = alignment.align_gps_to_slam(
        jnp.asarray(st), jnp.asarray(gt), jnp.asarray(gp), gps_valid=jnp.asarray(gv),
        cfg=cfg,
    )
    aligned, valid = alignment_chunked.align_gps_to_slam_chunked(
        st, gt, gp, gps_valid=gv, cfg=cfg, chunk_size=len(st), halo=64
    )
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    np.testing.assert_allclose(
        aligned[valid], np.asarray(ref.aligned)[valid], atol=1e-10
    )


def test_compact_handles_unsorted_stream():
    (st, sp, sq), (gt, gp, gv) = _scenario(seed=3)
    # Drop the injected duplicate: "keep first occurrence" is order-dependent
    # by definition, so a shuffled stream legitimately keeps a different one.
    gv[len(gt) // 3 + 1] = False
    perm = np.random.default_rng(0).permutation(len(gt))
    c_sorted = alignment_chunked.compact_gps_host(gt, gp, gv)
    c_shuffled = alignment_chunked.compact_gps_host(gt[perm], gp[perm], gv[perm])
    np.testing.assert_array_equal(c_sorted.times, c_shuffled.times)
    np.testing.assert_allclose(c_sorted.positions, c_shuffled.positions)


def test_window_mask_host_matches_device():
    (st, sp, sq), (gt, gp, gv) = _scenario(seed=4)
    cfg = FusionConfig()
    al = alignment.align_gps_to_slam(
        jnp.asarray(st), jnp.asarray(gt), jnp.asarray(gp), gps_valid=jnp.asarray(gv),
        cfg=cfg.time_alignment,
    )
    dev = alignment.sim3_window_mask(
        jnp.asarray(st),
        al.valid,
        gap_threshold=cfg.time_alignment.max_gps_gap_threshold,
        max_duration=cfg.sim3_ransac.max_initial_duration,
        min_samples=cfg.sim3_ransac.min_samples,
    )
    host = alignment_chunked.sim3_window_mask_host(
        st,
        np.asarray(al.valid),
        gap_threshold=cfg.time_alignment.max_gps_gap_threshold,
        max_duration=cfg.sim3_ransac.max_initial_duration,
        min_samples=cfg.sim3_ransac.min_samples,
    )
    np.testing.assert_array_equal(host, np.asarray(dev))


def test_streaming_sim3_subsampled_matches_full():
    """Above the RANSAC cap the streaming refit (moment accumulation over
    ALL inliers) must agree with an in-core all-points refit."""
    rng = np.random.default_rng(5)
    n = 2000
    src = rng.normal(size=(n, 3)) * 30
    R_true = np.array(
        [[0.36, 0.48, -0.8], [-0.8, 0.6, 0.0], [0.48, 0.64, 0.6]]
    )
    dst = 1.3 * src @ R_true.T + np.array([5.0, -2.0, 1.0])
    dst += rng.normal(size=(n, 3)) * 0.01
    mask = np.ones(n, bool)
    res = alignment_chunked.sim3_ransac_streaming(
        jax.random.PRNGKey(0), src, dst, mask,
        max_ransac_points=256, chunk_size=300,
    )
    assert res.subsampled and bool(np.asarray(res.sim3.ok))
    assert res.num_inliers == n
    from gps_optimize_slam_tpu.ops.umeyama import umeyama_sim3

    full = umeyama_sim3(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(res.sim3.R), np.asarray(full.R), atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.sim3.t), np.asarray(full.t), atol=1e-7)
    np.testing.assert_allclose(
        float(res.sim3.scale), float(full.scale), atol=1e-9
    )


def test_fuse_core_chunked_matches_incore_end_to_end():
    """RAW GNSS in, fused trajectory out — chunked ≡ in-core fuse_core."""
    (st, sp, sq), (gt, gp, gv) = _scenario(seed=1)
    cfg = FusionConfig()
    ref = fusion.fuse_core(
        jnp.asarray(st), jnp.asarray(sp), jnp.asarray(sq),
        jnp.asarray(gt), jnp.asarray(gp), jnp.asarray(gv),
        jax.random.PRNGKey(0), config=cfg,
    )
    assert bool(ref.ok)
    # chunk_size 159 on 599 steps: 3 full chunks + a padded final chunk —
    # and the SAME chunk kernel shape test_kalman_chunked compiles, so the
    # suite pays for this (minutes-slow XLA:CPU associative) family once.
    out = fusion_chunked.fuse_core_chunked(
        st, sp, sq, gt, gp, gv,
        key=jax.random.PRNGKey(0), config=cfg, chunk_size=159, halo=24,
    )
    assert out.ok
    np.testing.assert_array_equal(out.gps_valid, np.asarray(ref.gps_valid))
    np.testing.assert_allclose(
        float(out.sim3.scale), float(ref.sim3.scale), atol=1e-9
    )
    np.testing.assert_allclose(
        out.corrected_pos, np.asarray(ref.corrected_pos), atol=1e-6
    )
    np.testing.assert_allclose(
        out.corrected_quat, np.asarray(ref.corrected_quat), atol=1e-8
    )


def test_evaluate_chunked_matches_incore():
    """Streamed evaluation (ROADMAP: out-of-core NN accumulator) ≡
    fusion.evaluate on the same fused outputs. Fusion parity is covered by
    the e2e test above; here the in-core outputs are wrapped as a
    ChunkedFusionResult so only the evaluator differs."""
    (st, sp, sq), (gt, gp, gv) = _scenario(seed=3)
    cfg = FusionConfig()
    ref = fusion.fuse_core(
        jnp.asarray(st), jnp.asarray(sp), jnp.asarray(sq),
        jnp.asarray(gt), jnp.asarray(gp), jnp.asarray(gv),
        jax.random.PRNGKey(0), config=cfg,
    )
    assert bool(ref.ok)
    want = fusion.evaluate(jnp.asarray(st), jnp.asarray(sp), ref)

    res = fusion_chunked.ChunkedFusionResult(
        corrected_pos=np.asarray(ref.corrected_pos),
        corrected_quat=np.asarray(ref.corrected_quat),
        sim3=ref.sim3,
        aligned_gps=np.asarray(ref.aligned_gps),
        gps_valid=np.asarray(ref.gps_valid),
        num_inliers=int(jnp.sum(ref.sim3_inliers)),
        ok=True,
    )
    # chunk 131: traj and candidate streams split mid-gate, padded tails.
    got = fusion_chunked.evaluate_chunked(st, sp, sq, res, chunk_size=131)

    for name in ("nn_slam", "nn_sim3", "nn_ekf", "ate_sim3", "ate_ekf"):
        w, g = getattr(want, name), getattr(got, name)
        assert int(g.count) == int(w.count), name
        for f in ("mean", "median", "rmse", "max"):
            np.testing.assert_allclose(
                float(getattr(g, f)), float(getattr(w, f)), atol=1e-9,
                err_msg=f"{name}.{f}",
            )


def test_evaluate_vs_track_chunked_matches_incore():
    """Streamed GT evaluation (evaluate_vs_track_chunked, VERDICT r3 task 8)
    ≡ fusion.evaluate_vs_track on the same fused outputs and the same
    independent track — including the track's own chunk+halo temporal
    alignment."""
    (st, sp, sq), (gt, gp, gv) = _scenario(seed=5)
    cfg = FusionConfig()
    ref = fusion.fuse_core(
        jnp.asarray(st), jnp.asarray(sp), jnp.asarray(sq),
        jnp.asarray(gt), jnp.asarray(gp), jnp.asarray(gv),
        jax.random.PRNGKey(0), config=cfg,
    )
    assert bool(ref.ok)
    # Independent "ground-truth" track: its own clock, offset positions.
    rng = np.random.default_rng(99)
    m = 500
    tt = np.sort(rng.uniform(st[0], st[-1], m))
    tp = np.stack([np.interp(tt, st, np.asarray(ref.sim3_pos)[:, k]) for k in range(3)], -1)
    tp += rng.normal(size=(m, 3)) * 0.02
    tv = np.ones(m, bool)
    tv[rng.choice(m, 15, replace=False)] = False

    want, want_al = fusion.evaluate_vs_track(
        jnp.asarray(st), jnp.asarray(sp), ref,
        jnp.asarray(tt), jnp.asarray(tp), jnp.asarray(tv), cfg=cfg,
    )

    res = fusion_chunked.ChunkedFusionResult(
        corrected_pos=np.asarray(ref.corrected_pos),
        corrected_quat=np.asarray(ref.corrected_quat),
        sim3=ref.sim3,
        aligned_gps=np.asarray(ref.aligned_gps),
        gps_valid=np.asarray(ref.gps_valid),
        num_inliers=int(jnp.sum(ref.sim3_inliers)),
        ok=True,
    )
    got, got_al = fusion_chunked.evaluate_vs_track_chunked(
        st, sp, sq, res, tt, tp, track_valid=tv, cfg=cfg, chunk_size=131
    )
    np.testing.assert_array_equal(
        np.asarray(got_al.valid), np.asarray(want_al.valid)
    )
    for name in ("nn_slam", "nn_sim3", "nn_ekf", "ate_sim3", "ate_ekf"):
        w, g = getattr(want, name), getattr(got, name)
        assert int(g.count) == int(w.count), name
        for f in ("mean", "median", "rmse", "max"):
            np.testing.assert_allclose(
                float(getattr(g, f)), float(getattr(w, f)), atol=1e-6,
                err_msg=f"{name}.{f}",
            )
