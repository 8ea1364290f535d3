"""Tests for the full-trajectory RTS smoother mode and the functional
cross-correlation time-offset estimator (extensions beyond the reference)."""

import numpy as np
import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import EKFConfig, FusionConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.models import fusion
from gps_optimize_slam_tpu.ops import alignment, kalman, kalman_parallel
from tests.test_kalman import make_traj


def setup(n=200, seed=0, noise=0.3):
    t, pos, quats = make_traj(n=n, seed=seed)
    rng = np.random.default_rng(seed + 9)
    gps = pos + rng.normal(size=pos.shape) * noise
    valid = np.ones(n, bool)
    return t, pos, quats, gps, valid


def test_full_rts_sequential_equals_parallel():
    t, pos, quats, gps, valid = setup()
    args = (
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(pos), jnp.asarray(quats), jnp.asarray(gps),
        jnp.asarray(valid), EKFConfig(), RTSDecisionConfig(),
    )
    sp, sq = kalman.fuse_ekf_rts(*args, rts_mode="full")
    pp, pq = kalman_parallel.fuse_ekf_rts_parallel(*args, rts_mode="full")
    np.testing.assert_allclose(np.asarray(pp), np.asarray(sp), atol=1e-8)
    dots = np.abs(np.sum(np.asarray(pq) * np.asarray(sq), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-8)


def test_full_rts_beats_filter_on_noisy_gps():
    # Classic property: the fixed-interval smoother has lower error than
    # the causal filter on noisy measurements.
    t, pos, quats, gps, valid = setup(noise=0.5, seed=3)
    args = (
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(pos), jnp.asarray(quats), jnp.asarray(gps),
        jnp.asarray(valid), EKFConfig(), RTSDecisionConfig(),
    )
    fp, _ = kalman.fuse_ekf_rts(*args, rts_mode="outage")
    sp, _ = kalman.fuse_ekf_rts(*args, rts_mode="full")
    err_f = np.sqrt(np.mean(np.sum((np.asarray(fp) - pos) ** 2, -1)))
    err_s = np.sqrt(np.mean(np.sum((np.asarray(sp) - pos) ** 2, -1)))
    assert err_s < err_f * 0.95, (err_s, err_f)


def test_full_rts_through_fuse_core():
    t, pos, quats, gps, valid = setup(seed=5)
    m = len(gps)
    cfg = FusionConfig(rts_mode="full")
    out = fusion.fuse_core(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(t), jnp.asarray(gps), jnp.asarray(valid),
        jax.random.PRNGKey(0), config=cfg,
    )
    assert bool(out.ok)
    err = np.linalg.norm(np.asarray(out.corrected_pos) - pos, axis=1)
    assert err.max() < 1.0


def test_xcorr_offset_recovers_true_shift():
    t, pos, quats = make_traj(n=400, seed=7)
    rng = np.random.default_rng(8)
    for true_shift in [-2.3, 0.0, 1.7, 4.9]:
        m = 380
        gt = np.linspace(t[0], t[-1], m)
        gp = np.stack([np.interp(gt, t, pos[:, k]) for k in range(3)], -1)
        gp = gp * 0.97 + rng.normal(size=(m, 3)) * 0.02  # scale + noise
        est = alignment.estimate_time_offset_xcorr(
            t, pos, gt + true_shift, gp, max_lag_seconds=8.0
        )
        assert abs(est - (-true_shift)) < 0.11, (true_shift, est)


def test_xcorr_offset_degenerate_inputs():
    assert alignment.estimate_time_offset_xcorr(
        np.arange(2.0), np.zeros((2, 3)), np.arange(10.0), np.zeros((10, 3))
    ) == 0.0


def test_xcorr_device_recovers_true_shift_and_matches_host():
    """On-device FFT estimator (VERDICT r1 task 10): recovers injected
    clock shifts under jit and agrees with the host estimator to one grid
    cell."""
    t, pos, quats = make_traj(n=400, seed=7)
    rng = np.random.default_rng(8)
    fn = jax.jit(
        lambda *a, **k: alignment.estimate_time_offset_xcorr_device(
            *a, max_lag_seconds=8.0, **k
        )
    )
    for true_shift in [-2.3, 0.0, 1.7, 4.9]:
        m = 380
        gt = np.linspace(t[0], t[-1], m)
        gp = np.stack([np.interp(gt, t, pos[:, k]) for k in range(3)], -1)
        gp = gp * 0.97 + rng.normal(size=(m, 3)) * 0.02
        host = alignment.estimate_time_offset_xcorr(
            t, pos, gt + true_shift, gp, max_lag_seconds=8.0
        )
        dev = float(fn(jnp.asarray(t), jnp.asarray(pos),
                       jnp.asarray(gt + true_shift), jnp.asarray(gp)))
        assert abs(dev - (-true_shift)) < 0.11, (true_shift, dev)
        assert abs(dev - host) < 0.1, (dev, host)


def test_xcorr_device_masks_and_degenerate():
    t, pos, quats = make_traj(n=200, seed=9)
    m = 180
    gt = np.linspace(t[0], t[-1], m)
    gp = np.stack([np.interp(gt, t, pos[:, k]) for k in range(3)], -1) * 0.97
    # Padded tails (masked out) must not perturb the estimate.
    t_pad = np.concatenate([t, t[-1] + 1 + np.arange(50.0)])
    pos_pad = np.concatenate([pos, np.tile(pos[-1], (50, 1)) + 1e3])
    mask = np.concatenate([np.ones(len(t), bool), np.zeros(50, bool)])
    est_clean = float(alignment.estimate_time_offset_xcorr_device(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(gt + 1.5), jnp.asarray(gp)))
    est_masked = float(alignment.estimate_time_offset_xcorr_device(
        jnp.asarray(t_pad), jnp.asarray(pos_pad),
        jnp.asarray(gt + 1.5), jnp.asarray(gp), slam_mask=jnp.asarray(mask)))
    assert abs(est_clean - (-1.5)) < 0.15
    assert abs(est_masked - (-1.5)) < 0.15
    # Degenerate: fewer than 2 valid samples -> 0.
    est0 = float(alignment.estimate_time_offset_xcorr_device(
        jnp.asarray(t[:2]) * 0.0, jnp.zeros((2, 3)),
        jnp.asarray(gt), jnp.asarray(gp)))
    assert est0 == 0.0


def test_fuse_batch_estimate_offsets_end_to_end():
    """Batched sequences with different injected clock shifts fuse correctly
    when fuse_batch estimates offsets on device."""
    from gps_optimize_slam_tpu.parallel import batch as pbatch
    from gps_optimize_slam_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(3)
    shifts = [0.0, 2.1, -1.4]
    slams, gts, gps_list, valids = [], [], [], []
    for i, sh in enumerate(shifts):
        t, pos, quats = make_traj(n=260 + 10 * i, seed=i)
        m = 240
        gt = np.linspace(t[0], t[-1], m)
        gp = np.stack([np.interp(gt, t, pos[:, k]) for k in range(3)], -1)
        gp = gp * 0.97 + rng.normal(size=(m, 3)) * 0.02
        slams.append({"timestamps": t, "positions": pos, "quaternions": quats})
        gts.append(gt + sh)
        gps_list.append(gp)
        valids.append(np.ones(m, bool))
    b = pbatch.pad_batch(slams, gts, gps_list, valids)

    offs = pmesh.estimate_offsets_batch(b)
    np.testing.assert_allclose(offs, [-s for s in shifts], atol=0.15)

    keys = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(3)])
    out = pmesh.fuse_batch(b, keys, estimate_offsets=True)
    assert bool(np.asarray(out.ok).all())
    # With the shift corrected, the fused trajectory tracks the (scaled)
    # ground truth closely despite the injected clock error.
    for i, s in enumerate(slams):
        n = len(s["timestamps"])
        err = np.linalg.norm(
            np.asarray(out.corrected_pos)[i, :n] - gps_list[i][0] * 0
            - np.stack([np.interp(s["timestamps"], gts[i] - shifts[i],
                                  gps_list[i][:, k]) for k in range(3)], -1),
            axis=1,
        )
        assert np.median(err[5:-5]) < 0.25, (i, np.median(err))
