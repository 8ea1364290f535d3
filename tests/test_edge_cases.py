"""Edge cases and error paths across the public surface."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gps_optimize_slam_tpu import pipeline
from gps_optimize_slam_tpu.config import FusionConfig, config_from_dict
from gps_optimize_slam_tpu.models import fusion
from tests.conftest import reference_fixture
from tests.test_kalman import make_traj


def test_config_from_reference_shaped_dict():
    # The exact nested layout of the reference CONFIG (EKFGPSSLAM.py:22-71).
    ref_config = {
        "ekf": {
            "initial_cov_diag": [0.1, 0.1, 0.1, 0.01, 0.01, 0.01, 0.01],
            "process_noise_diag": [0.1, 0.1, 0.7, 0.01, 0.01, 0.01, 0.01],
            "meas_noise_diag": [0.2, 0.2, 0.2],
            "transition_steps": 10,
        },
        "sim3_ransac": {
            "min_samples": 4,
            "residual_threshold": 4.0,
            "max_trials": 1000,
            "min_inliers_needed": 4,
            "max_initial_duration": 180.0,
        },
        "gps_filtering_ransac": {
            "enabled": True,
            "use_sliding_window": True,
            "window_duration_seconds": 15.0,
            "window_step_factor": 0.5,
            "polynomial_degree": 2,
            "min_samples": 6,
            "residual_threshold_meters": 10.0,
            "max_trials": 50,
        },
        "time_alignment": {"max_samples_for_corr": 500, "max_gps_gap_threshold": 5.0},
        "ground_truth_gps_filtering": {
            "enabled": False,
            "use_sliding_window": True,
            "window_duration_seconds": 15.0,
            "window_step_factor": 0.5,
            "polynomial_degree": 2,
            "min_samples": 6,
            "residual_threshold_meters": 5.0,
            "max_trials": 50,
        },
        "rts_decision": {
            "sharp_turn_yaw_rate_threshold_deg_per_sec": 45.0,
            "default_ekf_transition_steps_on_sharp_turn": 0,
        },
    }
    cfg = config_from_dict(ref_config)
    assert cfg == FusionConfig()  # defaults mirror the reference exactly
    assert hash(cfg) == hash(FusionConfig())  # static-arg usable


def test_fuse_fails_cleanly_without_temporal_overlap():
    t, pos, quats = make_traj(n=50)
    gps_t = t + 1000.0  # no overlap
    gps_p = pos.copy()
    out = fusion.fuse_core(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(gps_t), jnp.asarray(gps_p), jnp.asarray(np.ones(50, bool)),
        jax.random.PRNGKey(0),
    )
    assert not bool(out.ok)
    assert not np.asarray(out.gps_valid).any()


def test_pipeline_raises_on_sim3_failure(tmp_path):
    # SLAM file + GPS with too few usable fixes → RuntimeError, not garbage.
    slam = tmp_path / "slam.txt"
    n = 20
    rows = np.column_stack(
        [np.arange(n) * 0.1, np.random.default_rng(0).normal(size=(n, 3)),
         np.tile([0, 0, 0, 1.0], (n, 1))]
    )
    np.savetxt(slam, rows)
    gps = tmp_path / "gps.txt"
    np.savetxt(gps, np.array([[100.0, 49.0, 8.4, 100.0], [100.5, 49.0001, 8.4001, 100.0],
                              [101.0, 49.0002, 8.4002, 100.0], [101.5, 49.0003, 8.4003, 100.0],
                              [102.0, 49.0004, 8.4004, 100.0], [102.5, 49.0005, 8.4005, 100.0]]))
    with pytest.raises(RuntimeError, match="Sim3"):
        pipeline.fuse_files(str(slam), str(gps))


def test_gps_all_invalid_raises(tmp_path):
    gps = tmp_path / "bad.txt"
    np.savetxt(gps, np.array([[0.0, 0.0, 0.0, 1.0], [1.0, 95.0, 200.0, 1.0]]))
    with pytest.raises(ValueError, match="no valid GPS"):
        pipeline.load_and_project_gps(str(gps), FusionConfig().gps_filtering_ransac)


def test_single_row_files(tmp_path):
    # 1-row TUM and GPS files parse (reshape path).
    slam = tmp_path / "one.txt"
    slam.write_text("0.0 1 2 3 0 0 0 1\n")
    from gps_optimize_slam_tpu.io.tum import read_tum

    d = read_tum(str(slam))
    assert d["positions"].shape == (1, 3)
    from gps_optimize_slam_tpu.io.gps import read_gps_fixes

    g = tmp_path / "one_gps.txt"
    g.write_text("0.0 49.0 8.4 100.0\n")
    r = read_gps_fixes(str(g))
    assert r["valid"].shape == (1,) and r["valid"].all()


def test_southern_hemisphere_roundtrip():
    from gps_optimize_slam_tpu.ops import geodesy

    lons = np.linspace(151.0, 151.3, 50)
    lats = np.linspace(-33.9, -33.7, 50)
    zone, south = geodesy.utm_zone_from_lonlat(lons, lats)
    assert south
    x, y = geodesy.utm_forward(jnp.asarray(lons), jnp.asarray(lats), zone, south)
    assert float(jnp.min(y)) > 6.2e6  # false northing applied
    lon2, lat2 = geodesy.utm_inverse(x, y, zone, south)
    np.testing.assert_allclose(np.asarray(lon2), lons, atol=1e-11)
    np.testing.assert_allclose(np.asarray(lat2), lats, atol=1e-11)


def test_duplicate_slam_timestamps_dont_crash():
    # n=50 matches test_fuse_fails_cleanly_without_temporal_overlap's
    # shapes so the two tests share ONE fuse_core compile in this module.
    t, pos, quats = make_traj(n=50)
    t[30] = t[29]  # dt = 0 → clamped to 1e-6 in the filter
    gps = pos + 0.01
    out = fusion.fuse_core(
        jnp.asarray(t), jnp.asarray(pos), jnp.asarray(quats),
        jnp.asarray(t), jnp.asarray(gps), jnp.asarray(np.ones(50, bool)),
        jax.random.PRNGKey(0),
    )
    assert bool(out.ok)
    assert np.isfinite(np.asarray(out.corrected_pos)).all()
