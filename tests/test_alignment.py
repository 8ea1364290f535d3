"""Alignment tests vs a scipy-based oracle implementing the reference
semantics (gap segmentation, cubic>=4 / linear 2-3, NaN outside spans —
EKFGPSSLAM.py:325-387), plus static-shape edge cases."""

import numpy as np
import jax.numpy as jnp
from scipy.interpolate import interp1d

from gps_optimize_slam_tpu.config import TimeAlignConfig
from gps_optimize_slam_tpu.ops import alignment
from tests.conftest import reference_fixture


def oracle_align(slam_times, gps_times, gps_pos, gap_threshold=5.0):
    """Scipy oracle with the reference's segmentation/interp semantics."""
    order = np.argsort(gps_times, kind="stable")
    t = gps_times[order]
    p = gps_pos[order]
    t, uniq_idx = np.unique(t, return_index=True)
    p = p[uniq_idx]
    n = len(t)
    aligned = np.full((len(slam_times), 3), np.nan)
    valid = np.zeros(len(slam_times), bool)
    if n < 2:
        return aligned, valid
    gaps = np.where(np.diff(t) > gap_threshold)[0]
    starts = [0] + (gaps + 1).tolist()
    ends = gaps.tolist() + [n - 1]
    for s, e in zip(starts, ends):
        seg_len = e - s + 1
        if seg_len < 2:
            continue
        st, sp = t[s : e + 1], p[s : e + 1]
        if not np.all(np.diff(st) > 1e-9):
            continue
        kind = "cubic" if seg_len >= 4 else "linear"
        f = interp1d(st, sp, axis=0, kind=kind, bounds_error=False, fill_value=np.nan)
        eps = 1e-9
        sel = np.where((slam_times >= st[0] - eps) & (slam_times <= st[-1] + eps))[0]
        if len(sel):
            vals = f(slam_times[sel])
            aligned[sel] = vals
            ok = ~np.isnan(vals).any(axis=1)
            valid[sel[ok]] = True
    return aligned, valid


def load_fixture():
    gps = np.loadtxt(reference_fixture("combined_output.txt"))
    slam = np.loadtxt(reference_fixture("yolotum04.txt"))
    # Use ENU-ish fake positions derived from lat/lon so the oracle doesn't
    # need a projection; scale to metres.
    gp = np.stack(
        [
            (gps[:, 2] - gps[0, 2]) * 73000.0,
            (gps[:, 1] - gps[0, 1]) * 111000.0,
            gps[:, 3],
        ],
        axis=-1,
    )
    return slam[:, 0], gps[:, 0], gp


def test_alignment_matches_oracle_on_fixture():
    slam_t, gps_t, gps_p = load_fixture()
    ref_a, ref_v = oracle_align(slam_t, gps_t, gps_p)
    out = alignment.align_gps_to_slam(
        jnp.asarray(slam_t), jnp.asarray(gps_t), jnp.asarray(gps_p)
    )
    np.testing.assert_array_equal(np.asarray(out.valid), ref_v)
    np.testing.assert_allclose(
        np.asarray(out.aligned)[ref_v], ref_a[ref_v], atol=1e-9
    )


def test_alignment_with_gaps_and_short_segments():
    rng = np.random.default_rng(0)
    # Segments: 10 pts, [gap], 3 pts (linear), [gap], 1 pt (dropped),
    # [gap], 5 pts.
    seg_times = [
        np.linspace(0.0, 4.5, 10),
        np.array([11.0, 11.7, 12.9]),
        np.array([20.0]),
        np.linspace(30.0, 33.0, 5),
    ]
    gps_t = np.concatenate(seg_times)
    gps_p = rng.normal(size=(len(gps_t), 3)) * 5
    slam_t = np.linspace(-1.0, 35.0, 200)
    ref_a, ref_v = oracle_align(slam_t, gps_t, gps_p)
    out = alignment.align_gps_to_slam(
        jnp.asarray(slam_t), jnp.asarray(gps_t), jnp.asarray(gps_p)
    )
    np.testing.assert_array_equal(np.asarray(out.valid), ref_v)
    np.testing.assert_allclose(np.asarray(out.aligned)[ref_v], ref_a[ref_v], atol=1e-9)
    # Sanity: the 1-point segment contributes no validity.
    assert not ref_v[(slam_t > 15) & (slam_t < 25)].any()


def test_alignment_duplicates_and_unsorted():
    rng = np.random.default_rng(1)
    gps_t = np.array([0.0, 0.5, 0.5, 1.0, 1.5, 2.0, 2.5, 0.25])
    gps_p = rng.normal(size=(8, 3))
    slam_t = np.linspace(0.0, 2.5, 40)
    ref_a, ref_v = oracle_align(slam_t, gps_t, gps_p)
    out = alignment.align_gps_to_slam(
        jnp.asarray(slam_t), jnp.asarray(gps_t), jnp.asarray(gps_p)
    )
    np.testing.assert_array_equal(np.asarray(out.valid), ref_v)
    np.testing.assert_allclose(np.asarray(out.aligned)[ref_v], ref_a[ref_v], atol=1e-9)


def test_alignment_knot_exact_and_boundaries():
    gps_t = np.linspace(0.0, 9.0, 10)
    gps_p = np.stack([np.sin(gps_t), np.cos(gps_t), gps_t], axis=-1)
    slam_t = np.concatenate([gps_t, [-0.1, 9.1, 4.55]])
    out = alignment.align_gps_to_slam(
        jnp.asarray(slam_t), jnp.asarray(gps_t), jnp.asarray(gps_p)
    )
    v = np.asarray(out.valid)
    a = np.asarray(out.aligned)
    # Exact knots reproduce values exactly (incl. first and last knot).
    assert v[:10].all()
    np.testing.assert_allclose(a[:10], gps_p, atol=1e-12)
    # Outside span → invalid.
    assert not v[10] and not v[11]
    assert v[12]


def test_alignment_gps_valid_mask():
    gps_t = np.linspace(0.0, 9.0, 10)
    gps_p = np.stack([gps_t, gps_t * 2, gps_t * 3], axis=-1)
    mask = np.ones(10, bool)
    mask[[3, 7]] = False
    slam_t = np.linspace(0.0, 9.0, 50)
    ref_a, ref_v = oracle_align(slam_t, gps_t[mask], gps_p[mask])
    out = alignment.align_gps_to_slam(
        jnp.asarray(slam_t),
        jnp.asarray(gps_t),
        jnp.asarray(gps_p),
        gps_valid=jnp.asarray(mask),
    )
    np.testing.assert_array_equal(np.asarray(out.valid), ref_v)
    np.testing.assert_allclose(np.asarray(out.aligned)[ref_v], ref_a[ref_v], atol=1e-9)


def test_alignment_assume_sorted_identical():
    """assume_sorted=True must be bit-identical to the default path whenever
    the VALID timestamps are nondecreasing — including duplicate valid times,
    gap-separated segments, and OUT-OF-ORDER times on invalid rows (the
    promise only covers valid rows). This is the contract pipeline.fuse_arrays
    and parallel.mesh.stage_batch rely on when they auto-set gps_sorted."""
    rng = np.random.default_rng(3)
    gps_t = np.concatenate(
        [np.linspace(0.0, 4.0, 9), [4.0], np.linspace(20.0, 24.0, 9)]
    )
    gps_p = rng.normal(size=(len(gps_t), 3)) * 5
    valid = np.ones(len(gps_t), bool)
    # Invalid rows carry garbage times that would break a global sort
    # assumption — assume_sorted must ignore them.
    valid[[2, 12]] = False
    gps_t[2] = 100.0
    gps_t[12] = -50.0
    slam_t = np.linspace(-1.0, 25.0, 120)
    base = alignment.align_gps_to_slam(
        jnp.asarray(slam_t), jnp.asarray(gps_t), jnp.asarray(gps_p),
        gps_valid=jnp.asarray(valid),
    )
    fast = alignment.align_gps_to_slam(
        jnp.asarray(slam_t), jnp.asarray(gps_t), jnp.asarray(gps_p),
        gps_valid=jnp.asarray(valid), assume_sorted=True,
    )
    np.testing.assert_array_equal(np.asarray(base.valid), np.asarray(fast.valid))
    v = np.asarray(base.valid)
    np.testing.assert_array_equal(
        np.asarray(base.aligned)[v], np.asarray(fast.aligned)[v]
    )


def test_alignment_all_invalid():
    gps_t = np.linspace(0, 5, 6)
    gps_p = np.zeros((6, 3))
    out = alignment.align_gps_to_slam(
        jnp.asarray(np.linspace(0, 5, 10)),
        jnp.asarray(gps_t),
        jnp.asarray(gps_p),
        gps_valid=jnp.zeros(6, bool),
    )
    assert not np.asarray(out.valid).any()


def test_estimate_time_offset_is_zero_on_ramps():
    # SURVEY §2.5 Q1: correlating z-scored resampled ramps peaks at lag 0.
    slam_t = np.linspace(0, 28.1, 271)
    gps_t = np.linspace(100.0, 129.3, 279)
    assert alignment.estimate_time_offset(slam_t, gps_t, 500) == 0.0
    assert alignment.estimate_time_offset(slam_t[:1], gps_t, 500) == 0.0


def test_sim3_window_mask_fixture_covers_all():
    # seq-04: single gap-free 28 s segment < 180 s → window = all valid pts.
    slam_t, gps_t, gps_p = load_fixture()
    out = alignment.align_gps_to_slam(
        jnp.asarray(slam_t), jnp.asarray(gps_t), jnp.asarray(gps_p)
    )
    m = alignment.sim3_window_mask(
        jnp.asarray(slam_t), out.valid, 5.0, 180.0, 4
    )
    np.testing.assert_array_equal(np.asarray(m), np.asarray(out.valid))


def test_sim3_window_mask_truncates_long_first_segment():
    slam_t = np.linspace(0.0, 400.0, 401)
    valid = np.ones(401, bool)
    m = np.asarray(
        alignment.sim3_window_mask(jnp.asarray(slam_t), jnp.asarray(valid), 5.0, 180.0, 4)
    )
    assert m[: 181].all() and not m[181:].any()


def test_sim3_window_mask_skips_to_all_when_first_run_short():
    # First run has 2 valid points (< min_samples=4) then a gap, then many.
    slam_t = np.linspace(0.0, 100.0, 101)
    valid = np.zeros(101, bool)
    valid[[0, 1]] = True
    valid[50:] = True
    m = np.asarray(
        alignment.sim3_window_mask(jnp.asarray(slam_t), jnp.asarray(valid), 5.0, 180.0, 4)
    )
    np.testing.assert_array_equal(m, valid)


def test_sim3_window_mask_gap_excludes_boundary_point():
    # Regression for ADVICE r1 (medium): the reference slices
    # valid_indices[:first_gap_idx] (EKFGPSSLAM.py:982-984) — the valid point
    # ON the gap boundary is excluded from the first segment.
    slam_t = np.arange(0.0, 101.0)  # 1 s spacing
    valid = np.zeros(101, bool)
    valid[:30] = True   # first segment: indices 0..29 (gap diff index 29)
    valid[60:] = True   # second segment after a 31 s gap
    m = np.asarray(
        alignment.sim3_window_mask(
            jnp.asarray(slam_t), jnp.asarray(valid), 5.0, 180.0, 4
        )
    )
    expected = np.zeros(101, bool)
    expected[:29] = True  # reference excludes index 29 (the boundary point)
    np.testing.assert_array_equal(m, expected)


def test_matmul_gather_path_bit_exact():
    """The one-hot-matmul spline evaluation (the TPU gather replacement)
    must equal the dynamic-gather path BIT-EXACTLY — products are value×{0,1}
    and f64 dots are exact — across gaps, duplicates, invalid fixes, and
    short (linear) segments."""
    rng = np.random.default_rng(11)
    n, m = 400, 330
    st = jnp.asarray(np.sort(rng.uniform(0, 60, n)))
    gt = np.sort(rng.uniform(-2, 62, m))
    gt[m // 2 + 1] = gt[m // 2]  # duplicate
    gt[m // 4 : m // 4 + 3] += 20.0  # creates a gap + a short segment
    order = np.argsort(gt)
    gp = rng.normal(size=(m, 3)) * 30
    gv = rng.random(m) > 0.08
    take = alignment.align_gps_to_slam(
        st, jnp.asarray(gt[order]), jnp.asarray(gp[order]),
        gps_valid=jnp.asarray(gv[order]), gather="take",
    )
    mm = alignment.align_gps_to_slam(
        st, jnp.asarray(gt[order]), jnp.asarray(gp[order]),
        gps_valid=jnp.asarray(gv[order]), gather="matmul",
    )
    np.testing.assert_array_equal(np.asarray(take.valid), np.asarray(mm.valid))
    tv = np.asarray(take.aligned)[np.asarray(take.valid)]
    mv = np.asarray(mm.aligned)[np.asarray(mm.valid)]
    np.testing.assert_array_equal(tv, mv)


def test_auto_gather_caps_one_hot_work(monkeypatch):
    """gather="auto" must fall back to the dynamic gather when the (N, M)
    one-hot would exceed the work-product cap — no unbounded O(N·M) HBM
    intermediate in the auto path (VERDICT r3 task 6). The cap is shrunk so
    the logic is exercised at test sizes; the matmul builder is instrumented
    to observe which path traced."""
    calls = []
    real = alignment._gather_rows_matmul
    monkeypatch.setattr(
        alignment,
        "_gather_rows_matmul",
        lambda *a, **k: calls.append(1) or real(*a, **k),
    )
    rng = np.random.default_rng(3)
    n, m = 120, 100
    st = jnp.asarray(np.sort(rng.uniform(0, 30, n)))
    gt = jnp.asarray(np.sort(rng.uniform(0, 30, m)))
    gp = jnp.asarray(rng.normal(size=(m, 3)))

    # Off-CPU platform + work under the cap: auto picks the matmul gather.
    out_mm = alignment.align_gps_to_slam(
        st, gt, gp, gather="auto", platform="tpu"
    )
    assert calls, "auto under the cap should take the matmul gather"

    calls.clear()
    monkeypatch.setattr(alignment, "GATHER_MATMUL_MAX_WORK", n * m - 1)
    out_dyn = alignment.align_gps_to_slam(
        st, gt, gp, gather="auto", platform="tpu"
    )
    assert not calls, "auto above the cap must use the dynamic gather"
    np.testing.assert_array_equal(
        np.asarray(out_mm.valid), np.asarray(out_dyn.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(out_mm.aligned)[np.asarray(out_mm.valid)],
        np.asarray(out_dyn.aligned)[np.asarray(out_dyn.valid)],
    )


def test_segment_structure_fused_ladders_match_lax(monkeypatch):
    """The off-CPU fused f32 scan path of _segment_structure returns
    BIT-IDENTICAL segment structure to the exact-int lax path (all
    propagated values are integers < 2^24 or knot times), verified in
    interpret mode across gaps, bad steps, NaN knots, and padding."""
    import jax
    from gps_optimize_slam_tpu.ops import alignment as al
    from gps_optimize_slam_tpu.ops import pallas_scan, tridiag

    real_impl = tridiag._scan_impl

    def fake_impl(platform, identity):
        if platform not in ("cpu",):
            return pallas_scan.make_scan_fn(identity, interpret=True)
        return real_impl(platform, identity)

    monkeypatch.setattr(tridiag, "_scan_impl", fake_impl)

    rng = np.random.default_rng(5)
    for trial in range(4):
        m = int(rng.integers(40, 400))
        dt = rng.choice(
            [0.1, 0.1, 0.1, 0.0, 7.0], size=m - 1,
            p=[0.6, 0.2, 0.1, 0.05, 0.05],
        )
        t = np.concatenate([[0.0], np.cumsum(dt)]).astype(np.float32)
        n_eff = int(rng.integers(m // 2, m + 1))
        t[n_eff:] = np.inf  # padding sentinel
        if n_eff > 3:
            t[n_eff - 2] = np.nan  # valid-flagged NaN knot
        ref = al._segment_structure(jnp.asarray(t), n_eff, 3.0, platform="cpu")
        got = al._segment_structure(jnp.asarray(t), n_eff, 3.0, platform="tpu")
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
