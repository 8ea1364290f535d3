"""End-to-end robustness under injected GNSS faults: the full pipeline must
survive outages + gross outliers + noise (BASELINE config 4 scenario)."""

import numpy as np
import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import FusionConfig
from gps_optimize_slam_tpu.models import fusion, robust
from gps_optimize_slam_tpu.utils import faults
from tests.test_kalman import make_traj


def build_scene(seed=0, n=400):
    t, pos, quats = make_traj(n=n, seed=seed)
    rng = np.random.default_rng(seed + 7)
    m = int(n * 0.95)
    gt = np.linspace(t[0], t[-1], m)
    gp_true = np.stack([np.interp(gt, t, pos[:, k]) for k in range(3)], -1)
    return t, pos, quats, gt, gp_true


def test_pipeline_survives_combined_faults():
    t, pos, quats, gt, gp_true = build_scene()
    gp = faults.inject_noise(gp_true, sigma=0.15, seed=1)
    gp, out_mask = faults.inject_gross_outliers(gp, fraction=0.06, magnitude=60, seed=2)
    valid = np.ones(len(gt), bool)
    valid = faults.inject_random_outages(valid, gt, n_outages=3, seed=3)

    cfg = FusionConfig()
    out = fusion.fuse_core(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(gt), jnp.asarray(gp), jnp.asarray(valid),
        jax.random.PRNGKey(0), config=cfg,
    )
    assert bool(out.ok)
    # The RANSAC-era outliers must not capture the Sim3 fit: scale ~ 1.
    assert abs(float(out.sim3.scale) - 1.0) < 0.05
    # χ²-gated robust fusion keeps the trajectory near truth despite faults.
    res = robust.fuse_robust(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        out.sim3_pos, out.sim3_quat, out.aligned_gps, out.gps_valid,
        cfg.ekf, cfg.rts_decision,
    )
    err = np.linalg.norm(np.asarray(res.positions) - pos, axis=1)
    assert np.median(err) < 0.5
    assert err.max() < 3.0


def test_bias_ramp_detected_by_evaluation():
    t, pos, quats, gt, gp_true = build_scene(seed=5)
    gp = faults.inject_bias_ramp(gp_true, gt, ramp_per_sec=(0.1, 0.0, 0.0))
    cfg = FusionConfig()
    out = fusion.fuse_core(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(gt), jnp.asarray(gp), jnp.asarray(np.ones(len(gt), bool)),
        jax.random.PRNGKey(0), config=cfg,
    )
    ev = fusion.evaluate(jnp.asarray(t), jnp.asarray(pos), out)
    # Fused trajectory follows the biased GPS; error vs raw SLAM grows.
    assert float(ev.nn_ekf.rmse) < 1.0  # still internally consistent
    drift = np.linalg.norm(np.asarray(out.corrected_pos) - pos, axis=1)
    assert drift[-1] > 1.0  # the ramp pulled it — visible in evaluation


def test_outage_injector_shapes():
    times = np.linspace(0, 100, 1000)
    valid = np.ones(1000, bool)
    v = faults.inject_outages(valid, [(10, 20), (50, 55)], times)
    assert not v[(times >= 10) & (times < 20)].any()
    assert not v[(times >= 50) & (times < 55)].any()
    assert v.sum() == 1000 - ((times >= 10) & (times < 20)).sum() - (
        (times >= 50) & (times < 55)
    ).sum()
