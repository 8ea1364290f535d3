"""Tests for Umeyama Sim(3) + RANSAC estimators against NumPy/sklearn
oracles mirroring the reference semantics (EKFGPSSLAM.py:136-247, 389-467)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gps_optimize_slam_tpu.config import GPSFilterConfig, Sim3RansacConfig
from gps_optimize_slam_tpu.ops import ransac
from gps_optimize_slam_tpu.ops.umeyama import Sim3, sim3_residuals, umeyama_sim3
from tests.conftest import reference_fixture


def oracle_umeyama(src, dst):
    """NumPy mirror of compute_sim3_transform (EKFGPSSLAM.py:428-459)."""
    n = src.shape[0]
    if n < 3:
        return None
    sc, dc = src.mean(0), dst.mean(0)
    s_c, d_c = src - sc, dst - dc
    H = s_c.T @ d_c
    U, S, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        Vt2 = Vt.copy()
        Vt2[-1, :] *= -1
        R = Vt2.T @ U.T
    var = (s_c**2).sum() / n
    scale = S.sum() / (n * var) if var >= 1e-12 else 1.0
    if scale <= 1e-6:
        scale = 1.0
    t = dc - scale * (R @ sc)
    return R, t, scale


def make_cloud(n=120, seed=0, reflectish=False):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(n, 3)) * 20
    if reflectish:
        # Nearly planar cloud stresses the det<0 branch.
        src[:, 2] *= 1e-3
    R = Rotation.from_rotvec(rng.normal(size=3)).as_matrix()
    t = rng.normal(size=3) * 50
    s = 0.9871
    dst = s * src @ R.T + t
    return src, dst, R, t, s


def test_umeyama_recovers_exact_transform():
    src, dst, R, t, s = make_cloud()
    fit = umeyama_sim3(jnp.asarray(src), jnp.asarray(dst))
    assert bool(fit.ok)
    np.testing.assert_allclose(np.asarray(fit.R), R, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fit.t), t, atol=1e-8)
    assert abs(float(fit.scale) - s) < 1e-10


def test_umeyama_matches_oracle_random():
    rng = np.random.default_rng(3)
    for seed in range(5):
        src = rng.normal(size=(50, 3)) * 10
        dst = rng.normal(size=(50, 3)) * 10  # unrelated clouds
        fit = umeyama_sim3(jnp.asarray(src), jnp.asarray(dst))
        R, t, s = oracle_umeyama(src, dst)
        np.testing.assert_allclose(np.asarray(fit.R), R, atol=1e-9)
        np.testing.assert_allclose(np.asarray(fit.t), t, atol=1e-7)
        assert abs(float(fit.scale) - s) < 1e-9


def test_umeyama_reflection_branch():
    src, dst, R, t, s = make_cloud(reflectish=True, seed=7)
    # Mirror dst to force a det<0 raw SVD solution.
    M = np.diag([1.0, 1.0, -1.0])
    dst_m = dst @ M
    fit = umeyama_sim3(jnp.asarray(src), jnp.asarray(dst_m))
    Ro, to, so = oracle_umeyama(src, dst_m)
    np.testing.assert_allclose(np.asarray(fit.R), Ro, atol=1e-9)
    assert abs(np.linalg.det(np.asarray(fit.R)) - 1.0) < 1e-9


def test_umeyama_weighted_equals_subset():
    src, dst, *_ = make_cloud(seed=11)
    idx = np.arange(0, 120, 3)
    w = np.zeros(120)
    w[idx] = 1.0
    fit_w = umeyama_sim3(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    fit_s = umeyama_sim3(jnp.asarray(src[idx]), jnp.asarray(dst[idx]))
    np.testing.assert_allclose(np.asarray(fit_w.R), np.asarray(fit_s.R), atol=1e-10)
    np.testing.assert_allclose(np.asarray(fit_w.t), np.asarray(fit_s.t), atol=1e-8)
    assert abs(float(fit_w.scale) - float(fit_s.scale)) < 1e-10


def test_umeyama_guards():
    # <3 points → not ok.
    fit = umeyama_sim3(jnp.zeros((5, 3)), jnp.zeros((5, 3)), jnp.asarray([1.0, 1, 0, 0, 0]))
    assert not bool(fit.ok)
    # Zero-variance source → scale 1.
    src = np.tile([1.0, 2.0, 3.0], (10, 1))
    dst = np.random.default_rng(0).normal(size=(10, 3))
    fit = umeyama_sim3(jnp.asarray(src), jnp.asarray(dst))
    assert float(fit.scale) == 1.0


def test_sim3_ransac_rejects_outliers():
    src, dst, R, t, s = make_cloud(n=200, seed=13)
    rng = np.random.default_rng(14)
    dst_corrupt = dst.copy()
    bad = rng.choice(200, 30, replace=False)
    dst_corrupt[bad] += rng.normal(size=(30, 3)) * 100 + 50
    res = ransac.sim3_ransac(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst_corrupt)
    )
    assert bool(res.ok)
    mask = np.asarray(res.inlier_mask)
    assert not mask[bad].any()
    assert mask.sum() == 170
    np.testing.assert_allclose(np.asarray(res.sim3.R), R, atol=1e-9)
    assert abs(float(res.sim3.scale) - s) < 1e-9


def test_sim3_ransac_clean_equals_direct_fit():
    src, dst, *_ = make_cloud(n=100, seed=15)
    res = ransac.sim3_ransac(
        jax.random.PRNGKey(1), jnp.asarray(src), jnp.asarray(dst),
        cfg=Sim3RansacConfig(max_trials=32),
    )
    direct = umeyama_sim3(jnp.asarray(src), jnp.asarray(dst))
    assert int(res.num_inliers) == 100
    np.testing.assert_allclose(np.asarray(res.sim3.R), np.asarray(direct.R), atol=1e-10)


def test_sim3_ransac_seed_independent_when_converged():
    src, dst, *_ = make_cloud(n=100, seed=16)
    fits = [
        ransac.sim3_ransac(jax.random.PRNGKey(k), jnp.asarray(src), jnp.asarray(dst))
        for k in range(3)
    ]
    for f in fits[1:]:
        np.testing.assert_allclose(
            np.asarray(f.sim3.R), np.asarray(fits[0].sim3.R), atol=1e-12
        )


def test_sim3_ransac_too_few_points():
    res = ransac.sim3_ransac(
        jax.random.PRNGKey(0), jnp.zeros((10, 3)), jnp.zeros((10, 3)),
        valid=jnp.zeros(10, bool),
    )
    assert not bool(res.ok)


def sklearn_filter_oracle(times, positions, cfg: GPSFilterConfig, seed=0):
    """sklearn mirror of the reference's sliding-window filter
    (EKFGPSSLAM.py:184-247), returning a keep mask."""
    from sklearn.linear_model import RANSACRegressor
    from sklearn.preprocessing import PolynomialFeatures
    from sklearn.pipeline import make_pipeline

    np.random.seed(seed)
    n = len(times)
    overall = np.zeros(n, bool)
    starts = ransac.reference_window_starts(times, cfg)
    for ws in starts:
        sel = np.where((times >= ws) & (times < ws + cfg.window_duration_seconds))[0]
        if len(sel) < cfg.min_samples:
            continue
        tw = times[sel].reshape(-1, 1)
        masks = []
        try:
            for d in range(3):
                model = make_pipeline(
                    PolynomialFeatures(degree=cfg.polynomial_degree),
                    RANSACRegressor(
                        min_samples=cfg.min_samples,
                        residual_threshold=cfg.residual_threshold_meters,
                        max_trials=cfg.max_trials,
                    ),
                )
                model.fit(tw, positions[sel, d])
                masks.append(model[-1].inlier_mask_)
            overall[sel[np.logical_and.reduce(masks)]] = True
        except Exception:
            continue
    return overall


def test_gps_ransac_matches_sklearn_on_clean_plus_outliers():
    rng = np.random.default_rng(20)
    t = np.arange(0.0, 40.0, 0.1)
    n = len(t)
    pos = np.stack([3.0 * t + 0.01 * t**2, -2.0 * t, 0.1 * np.sin(0.2 * t)], -1)
    pos += rng.normal(size=(n, 3)) * 0.3
    bad = rng.choice(n, 12, replace=False)
    pos[bad] += rng.normal(size=(12, 3)) * 80 + 40

    cfg = GPSFilterConfig()
    oracle = sklearn_filter_oracle(t, pos, cfg)
    starts = ransac.reference_window_starts(t, cfg)
    ours = np.asarray(
        ransac.gps_poly_ransac_mask(
            jax.random.PRNGKey(0),
            jnp.asarray(t),
            jnp.asarray(pos),
            window_starts=jnp.asarray(starts),
            cfg=cfg,
        )
    )
    # Converged masks must agree exactly on well-separated outliers.
    np.testing.assert_array_equal(ours, oracle)
    assert not ours[bad].any()


def test_gps_ransac_fixture_keeps_everything():
    # The shipped seq-04 GNSS track has no outliers at the 10 m threshold.
    gps = np.loadtxt(reference_fixture("combined_output.txt"))
    t = gps[:, 0]
    pos = np.stack(
        [(gps[:, 2] - gps[0, 2]) * 73000.0, (gps[:, 1] - gps[0, 1]) * 111000.0, gps[:, 3]],
        -1,
    )
    cfg = GPSFilterConfig()
    starts = ransac.reference_window_starts(t, cfg)
    ours = np.asarray(
        ransac.gps_poly_ransac_mask(
            jax.random.PRNGKey(0), jnp.asarray(t), jnp.asarray(pos),
            window_starts=jnp.asarray(starts), cfg=cfg,
        )
    )
    assert ours.all()
    oracle = sklearn_filter_oracle(t, pos, cfg)
    np.testing.assert_array_equal(ours, oracle)


def test_gps_ransac_disabled_passthrough():
    cfg = GPSFilterConfig(enabled=False)
    valid = jnp.asarray([True, False, True])
    out = ransac.gps_poly_ransac_mask(
        jax.random.PRNGKey(0), jnp.zeros(3), jnp.zeros((3, 3)), valid=valid, cfg=cfg
    )
    np.testing.assert_array_equal(np.asarray(out), [True, False, True])


def sklearn_global_filter_oracle(times, positions, cfg: GPSFilterConfig, seed=0):
    """sklearn mirror of the reference's GLOBAL (non-sliding) filter
    (EKFGPSSLAM.py:150-183): per-axis RANSAC over all points, AND of the
    three axis masks; on failure keep everything."""
    from sklearn.linear_model import RANSACRegressor
    from sklearn.preprocessing import PolynomialFeatures
    from sklearn.pipeline import make_pipeline

    np.random.seed(seed)
    tw = times.reshape(-1, 1)
    masks = []
    try:
        for d in range(3):
            model = make_pipeline(
                PolynomialFeatures(degree=cfg.polynomial_degree),
                RANSACRegressor(
                    min_samples=cfg.min_samples,
                    residual_threshold=cfg.residual_threshold_meters,
                    max_trials=cfg.max_trials,
                ),
            )
            model.fit(tw, positions[:, d])
            masks.append(model[-1].inlier_mask_)
        return np.logical_and.reduce(masks)
    except Exception:
        return np.ones(len(times), bool)


def test_gps_ransac_global_mode_rejects_gross_outliers():
    # Regression for ADVICE r1 (high): global mode was a silent no-op — the
    # -inf sentinel start failed the isfinite window gate, so 200 m spikes
    # passed straight through. Global mode must now AND per-axis masks over
    # the whole track like the reference (EKFGPSSLAM.py:150-183).
    rng = np.random.default_rng(7)
    t = np.arange(0.0, 40.0, 0.1)
    n = len(t)
    pos = np.stack([2.5 * t, -1.5 * t + 0.02 * t**2, 0.05 * t], -1)
    pos += rng.normal(size=(n, 3)) * 0.2
    bad = rng.choice(n, 10, replace=False)
    pos[bad] += 200.0  # gross spikes

    cfg = GPSFilterConfig(use_sliding_window=False)
    ours = np.asarray(
        ransac.gps_poly_ransac_mask(
            jax.random.PRNGKey(0), jnp.asarray(t), jnp.asarray(pos), cfg=cfg
        )
    )
    assert not ours[bad].any(), "gross outliers must be rejected in global mode"
    oracle = sklearn_global_filter_oracle(t, pos, cfg)
    np.testing.assert_array_equal(ours, oracle)


def test_gps_ransac_global_mode_keeps_all_when_clean():
    t = np.arange(0.0, 30.0, 0.1)
    pos = np.stack([1.0 * t, 2.0 * t, 0.1 * t], -1)
    cfg = GPSFilterConfig(use_sliding_window=False)
    ours = np.asarray(
        ransac.gps_poly_ransac_mask(
            jax.random.PRNGKey(1), jnp.asarray(t), jnp.asarray(pos), cfg=cfg
        )
    )
    assert ours.all()


def test_sim3_ransac_adaptive_matches_fixed():
    """Adaptive early stopping (stop_probability) converges to the same
    transform as the faithful fixed-trial run, clean and contaminated."""
    rng = np.random.default_rng(11)
    n = 300
    src = rng.normal(size=(n, 3)) * 20
    R = Rotation.from_euler("zyx", [0.4, -0.2, 0.1]).as_matrix()
    dst = 0.97 * src @ R.T + np.asarray([5.0, -2.0, 1.0])
    dst_noisy = dst + rng.normal(size=(n, 3)) * 0.05
    # 15% gross outliers.
    out_idx = rng.choice(n, 45, replace=False)
    dst_cont = dst_noisy.copy()
    dst_cont[out_idx] += rng.normal(size=(45, 3)) * 200.0

    for dst_case in (dst_noisy, dst_cont):
        fixed = ransac.sim3_ransac(
            jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst_case),
            cfg=Sim3RansacConfig(),
        )
        adaptive = ransac.sim3_ransac(
            jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst_case),
            cfg=Sim3RansacConfig(stop_probability=0.9999),
        )
        assert bool(fixed.ok) and bool(adaptive.ok)
        np.testing.assert_allclose(
            np.asarray(adaptive.sim3.R), np.asarray(fixed.sim3.R), atol=5e-3
        )
        np.testing.assert_allclose(
            float(adaptive.sim3.scale), float(fixed.sim3.scale), rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(adaptive.sim3.t), np.asarray(fixed.sim3.t), atol=0.2
        )
        # Contaminated case: the true inlier set is recovered either way.
        if dst_case is dst_cont:
            inl = np.asarray(adaptive.inlier_mask)
            assert inl[out_idx].sum() == 0
            assert inl.sum() >= n - 45 - 5


def test_pallas_count_rerank_pins_winner(monkeypatch):
    """The Pallas counting path re-ranks its top-k approx trials with EXACT
    counts, so near-threshold count perturbations (the MXU quadratic-form
    rounding) cannot flip the selected winner. Simulated here by an
    adversarial counts oracle standing in for the kernel: a few losing
    trials get +2 votes — enough to steal a plain argmax, not the re-rank."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gps_optimize_slam_tpu.config import Sim3RansacConfig
    from gps_optimize_slam_tpu.ops import pallas_kernels, ransac

    rng = np.random.default_rng(3)
    n = 300
    src = jnp.asarray(rng.normal(size=(n, 3)) * 20)
    R = np.eye(3)
    dst_clean = 1.05 * src @ R.T + np.array([3.0, -2.0, 1.0])
    dst = jnp.asarray(dst_clean + rng.normal(size=(n, 3)) * 0.3)
    # unroll_tail pinned so the tpu- and cpu-path tails run IDENTICAL
    # arithmetic (the platform-gated default unrolls only the tpu tail —
    # few-ulp reassociation that would break the atol=0 comparison below;
    # this test is about winner pinning, not the tail form).
    cfg = Sim3RansacConfig(
        max_trials=64, residual_threshold=2.0, unroll_tail=False
    )

    def fake_counts(src_, dst_, valid_, Rt, tt, st, thr2, interpret=False):
        pred = st[:, None, None] * jnp.einsum("tij,nj->tni", Rt, src_) + tt[:, None]
        res2 = jnp.sum((pred - dst_[None]) ** 2, axis=-1)
        c = jnp.sum((res2 < thr2) & valid_[None], axis=-1).astype(jnp.int32)
        b = jnp.argmax(c)
        t_idx = jnp.arange(c.shape[0])
        steal = (t_idx != b) & (t_idx % 13 == 0)  # a few near-tie "flips"
        return jnp.where(steal, c + 2, c)

    monkeypatch.setattr(pallas_kernels, "ransac_counts", fake_counts)
    key = jax.random.PRNGKey(0)
    got = ransac.sim3_ransac(key, src, dst, cfg=cfg, platform="tpu")
    want = ransac.sim3_ransac(key, src, dst, cfg=cfg, platform="cpu")
    np.testing.assert_array_equal(
        np.asarray(got.inlier_mask), np.asarray(want.inlier_mask)
    )
    np.testing.assert_allclose(
        np.asarray(got.sim3.t), np.asarray(want.sim3.t), rtol=0, atol=0
    )
    assert int(got.num_inliers) == int(want.num_inliers)


def _device_starts(times, cfg, max_w=256, valid=None):
    starts, count = ransac.window_starts_device(
        jnp.asarray(times), cfg, max_w, valid=valid
    )
    starts = np.asarray(starts)
    count = int(count)
    assert count < max_w, "bound too small for an exact-match comparison"
    assert np.all(np.isfinite(starts[:count])) and np.all(
        np.isnan(starts[count:])
    ), "starts must be front-compacted with NaN padding"
    return starts[:count]


def test_window_starts_device_matches_host_on_fixture():
    """Exact match (bitwise in f64) vs the host while-loop on the seq-04
    GNSS timestamps, across step factors incl. tail-adjustment regimes."""
    gps = np.loadtxt(reference_fixture("combined_output.txt"))
    t = gps[:, 0]
    for factor in (0.5, 0.25, 1.0, 3.0):
        cfg = GPSFilterConfig(window_step_factor=factor)
        host = ransac.reference_window_starts(t, cfg)
        dev = _device_starts(t, cfg)
        np.testing.assert_array_equal(dev, host)


def test_window_starts_device_degenerate_step_and_repeats():
    """step ≤ 1e-6 (window_step_factor=0) walks distinct timestamps; with
    repeated timestamps the jump must skip duplicates exactly like the
    host loop, including the no-next break before the tail adjustment."""
    t = np.repeat(np.asarray([0.0, 0.1, 0.1, 0.4, 1.3, 1.3, 1.3, 2.0, 5.0]), 2)
    for duration in (0.5, 3.0, 10.0):
        cfg = GPSFilterConfig(
            window_step_factor=0.0, window_duration_seconds=duration
        )
        host = ransac.reference_window_starts(t, cfg)
        dev = _device_starts(t, cfg)
        np.testing.assert_array_equal(dev, host)


def test_window_starts_device_tail_window_and_edges():
    cfg = GPSFilterConfig(window_duration_seconds=7.0, window_step_factor=0.6)
    # Irregular span that exercises the tail snap + post-tail grid.
    t = np.cumsum(np.abs(np.sin(np.arange(300))) * 0.3) + 5.0
    np.testing.assert_array_equal(
        _device_starts(t, cfg), ransac.reference_window_starts(t, cfg)
    )
    # Single timestamp / all-equal timestamps → no windows.
    assert _device_starts(np.asarray([3.0]), cfg).size == 0
    assert _device_starts(np.full(5, 3.0), cfg).size == 0
    # Empty input.
    starts, count = ransac.window_starts_device(jnp.zeros((0,)), cfg, 8)
    assert int(count) == 0 and np.isnan(np.asarray(starts)).all()


def test_window_starts_device_valid_mask_and_vmap():
    """Padded batch rows: the mask restricts t0/end/distinct search; vmap
    over a padded batch equals per-row host loops on the unpadded data."""
    cfg = GPSFilterConfig(window_duration_seconds=5.0, window_step_factor=0.5)
    rows = [
        np.sort(np.random.default_rng(i).uniform(0, 30 + 7 * i, 40 + 10 * i))
        for i in range(3)
    ]
    m = max(len(r) for r in rows)
    tb = np.stack([np.pad(r, (0, m - len(r)), constant_values=1e9) for r in rows])
    vb = np.stack(
        [np.arange(m) < len(r) for r in rows]
    )
    starts_b, counts_b = jax.vmap(
        lambda tt, vv: ransac.window_starts_device(tt, cfg, 64, valid=vv)
    )(jnp.asarray(tb), jnp.asarray(vb))
    for i, r in enumerate(rows):
        host = ransac.reference_window_starts(r, cfg)
        got = np.asarray(starts_b[i])[: int(counts_b[i])]
        np.testing.assert_array_equal(got, host)


def test_umeyama_unroll_svd_matches_fori():
    # The RANSAC tail sets unroll_svd=True on its two scalar fits; the
    # result must match the default fori-loop form to reassociation noise
    # (same op order, straight-line vs looped — few ulps, not bitwise).
    src, dst, _, _, _ = make_cloud(n=80, seed=31)
    w = (np.arange(80) % 3 != 0).astype(np.float64)
    a = umeyama_sim3(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    b = umeyama_sim3(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), unroll_svd=True
    )
    np.testing.assert_allclose(np.asarray(a.R), np.asarray(b.R), atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(a.scale), np.asarray(b.scale), rtol=1e-13
    )
