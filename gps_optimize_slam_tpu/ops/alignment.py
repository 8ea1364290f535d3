"""Gap-aware temporal alignment of GPS samples onto SLAM timestamps.

TPU-native reimplementation of the reference's dynamic_time_alignment +
estimate_time_offset (EKFGPSSLAM.py:301-387):

* The reference filters/segments dynamically (np.unique, python segment
  loops, scipy interp1d per segment). Here everything is **static-shape**:
  invalid/duplicate samples are masked and compacted by a sort, segments are
  labelled with `segment_*` reductions, and ALL per-segment not-a-knot cubic
  splines are solved in ONE block-diagonal linear system — a single XLA
  program, no host round-trips, vmappable across sequences.
* scipy's ``interp1d(kind='cubic')`` is the unique not-a-knot interpolating
  cubic, reproduced here via the classic second-derivative ("moments")
  formulation; segments with fewer than 4 points fall back to linear
  interpolation exactly like the reference (EKFGPSSLAM.py:362).
* Validity is returned as a boolean mask (the reference returns NaN rows +
  a mask; masks are the XLA-native encoding).

Semantics notes (documented quirks, SURVEY.md §2.5):
* Q1 — the reference's estimate_time_offset cross-correlates the two
  *z-scored resampled timestamp ramps*; two z-scored linear ramps are the
  identical sequence, so the correlation peak is at lag 0 and the offset is
  exactly 0.0 for any ≥2-sample inputs. ``estimate_time_offset`` reproduces
  the computation faithfully (host-side) and the jitted core takes the
  offset as a plain input.
* Duplicate timestamps keep the first occurrence in sorted order
  (np.unique semantics under a stable sort; the reference's unstable
  quicksort only differs on exactly-tied inputs).
* A segment whose post-dedup time steps are not all > 1e-9 is skipped
  entirely (EKFGPSSLAM.py:364-366).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import TimeAlignConfig
from gps_optimize_slam_tpu.utils.precision import highp

_INF = jnp.inf

# Work-product cap (N·M one-hot elements) for the auto matmul-gather choice:
# the one-hot materialises O(N·M) HBM (f32), so beyond ~64M elements
# (≈256 MB) the dynamic gather wins despite its serialisation — same guard
# the searchsorted method choice applies two lines above it.
GATHER_MATMUL_MAX_WORK = 64_000_000


def estimate_time_offset(slam_times, gps_times, max_samples: int = 500) -> float:
    """Cross-correlation clock-offset estimate (reference EKFGPSSLAM.py:301-323).

    Host-side NumPy, faithful to the reference — including the quirk that it
    correlates the resampled timestamp ramps themselves, which makes the
    result exactly 0.0 whenever both series have ≥2 samples (SURVEY §2.5 Q1).
    """
    import numpy as np

    slam_times = np.asarray(slam_times)
    gps_times = np.asarray(gps_times)
    if len(slam_times) < 2 or len(gps_times) < 2:
        return 0.0
    num_samples = min(max_samples, len(slam_times), len(gps_times))
    if num_samples < 2:
        return 0.0
    slam_s = np.linspace(slam_times.min(), slam_times.max(), num_samples)
    gps_s = np.linspace(gps_times.min(), gps_times.max(), num_samples)
    slam_n = slam_s - slam_s.mean()
    gps_n = gps_s - gps_s.mean()
    s_std, g_std = slam_n.std(), gps_n.std()
    if s_std < 1e-9 or g_std < 1e-9:
        return 0.0
    corr = np.correlate(slam_n / s_std, gps_n / g_std, mode="full")
    lag = int(corr.argmax()) - len(slam_n) + 1
    dt = (slam_s[-1] - slam_s[0]) / (num_samples - 1) if num_samples > 1 else 0.0
    return float(lag * dt)


def estimate_time_offset_xcorr(
    slam_times,
    slam_positions,
    gps_times,
    gps_positions,
    max_lag_seconds: float = 10.0,
    grid_dt: float = 0.05,
) -> float:
    """FUNCTIONAL clock-offset estimation (extension beyond the reference).

    The reference's estimator cross-correlates the resampled timestamp ramps
    themselves and therefore always returns 0 (SURVEY Q1). This one
    cross-correlates the two SPEED profiles — scale-free after z-scoring, so
    the monocular SLAM scale ambiguity doesn't matter — and returns the
    offset to ADD to the GPS timestamps so they align with SLAM time
    (the same sign convention the alignment consumes).
    """
    import numpy as np

    slam_times = np.asarray(slam_times, float)
    gps_times = np.asarray(gps_times, float)
    slam_positions = np.asarray(slam_positions, float)
    gps_positions = np.asarray(gps_positions, float)
    if len(slam_times) < 3 or len(gps_times) < 3:
        return 0.0

    def speed_series(t, p):
        dt = np.diff(t)
        ok = dt > 1e-9
        v = np.linalg.norm(np.diff(p, axis=0), axis=1) / np.where(ok, dt, 1.0)
        tm = (t[:-1] + t[1:]) / 2.0
        return tm[ok], v[ok]

    ts, vs = speed_series(slam_times, slam_positions)
    tg, vg = speed_series(gps_times, gps_positions)
    if len(ts) < 2 or len(tg) < 2:
        return 0.0

    lo = min(ts[0], tg[0]) - max_lag_seconds
    hi = max(ts[-1], tg[-1]) + max_lag_seconds
    grid = np.arange(lo, hi, grid_dt)
    a = np.interp(grid, ts, vs, left=0.0, right=0.0)
    b = np.interp(grid, tg, vg, left=0.0, right=0.0)

    def z(x):
        s = x.std()
        return (x - x.mean()) / (s if s > 1e-12 else 1.0)

    a, b = z(a), z(b)
    max_lag = int(round(max_lag_seconds / grid_dt))
    # corr[k] = Σ a[i] · b[i + k]  for k in [-max_lag, max_lag]:
    # positive k ⇒ GPS events happen LATER on the grid ⇒ subtract k·dt.
    # Same FFT circular cross-correlation as the device estimator
    # (estimate_time_offset_xcorr_device) — one O(n log n) transform instead
    # of an O(lags·n) roll loop; values identical to the rolled sum.
    lags = np.arange(-max_lag, max_lag + 1)
    n_g = len(a)
    corr_full = np.fft.irfft(np.conj(np.fft.rfft(a)) * np.fft.rfft(b), n=n_g)
    corr = corr_full[lags % n_g]
    best = lags[int(np.argmax(corr))]
    return float(-best * grid_dt)


@highp
def estimate_time_offset_xcorr_device(
    slam_times: jnp.ndarray,
    slam_positions: jnp.ndarray,
    gps_times: jnp.ndarray,
    gps_positions: jnp.ndarray,
    slam_mask: Optional[jnp.ndarray] = None,
    gps_valid: Optional[jnp.ndarray] = None,
    max_lag_seconds: float = 10.0,
    n_grid: int = 4096,
) -> jnp.ndarray:
    """ON-DEVICE clock-offset estimation: FFT circular cross-correlation of
    the two z-scored speed profiles (the jittable counterpart of
    ``estimate_time_offset_xcorr`` — VERDICT r1 task 10, so batched/sharded
    sequences can estimate offsets inside the device program via vmap).

    Static shapes: the uniform resampling grid has a FIXED ``n_grid`` length
    spanning [min_t − max_lag, max_t + max_lag] (the host version's grid
    step is a fixed 0.05 s, so its lag resolution is constant while this
    one's scales with trajectory duration — both recover real offsets to
    one grid cell). Invalid/padded samples are masked out exactly like the
    host version drops them. Returns the offset to ADD to GPS timestamps.
    """
    dtype = jnp.result_type(slam_times.dtype, jnp.float32)
    if slam_mask is None:
        slam_mask = jnp.ones(slam_times.shape, bool)
    if gps_valid is None:
        gps_valid = jnp.ones(gps_times.shape, bool)

    def speeds(t, p, m):
        t = t.astype(dtype)
        p = p.astype(dtype)
        dt = t[1:] - t[:-1]
        ok = (dt > 1e-9) & m[1:] & m[:-1]
        v = jnp.linalg.norm(p[1:] - p[:-1], axis=-1) / jnp.where(ok, dt, 1.0)
        tm = (t[1:] + t[:-1]) / 2.0
        # Compact valid samples to the front; +inf-pad the tail so jnp.interp
        # sees an increasing xp (pad fp repeats the last valid value; points
        # right of the last REAL midpoint are zeroed explicitly below).
        order = jnp.argsort(jnp.where(ok, tm, jnp.inf))
        tm_c = jnp.where(ok[order], tm[order], jnp.inf)
        v_c = jnp.where(ok[order], v[order], 0.0)
        n_ok = jnp.sum(ok)
        last_t = tm_c[jnp.clip(n_ok - 1, 0, tm.shape[0] - 1)]
        first_t = tm_c[0]
        # Repeat the last valid value into the +inf padding.
        last_v = v_c[jnp.clip(n_ok - 1, 0, tm.shape[0] - 1)]
        v_c = jnp.where(jnp.arange(tm.shape[0]) < n_ok, v_c, last_v)
        return tm_c, v_c, first_t, last_t, n_ok

    ts, vs, s_first, s_last, s_n = speeds(slam_times, slam_positions, slam_mask)
    tg, vg, g_first, g_last, g_n = speeds(gps_times, gps_positions, gps_valid)

    lo = jnp.minimum(s_first, g_first) - max_lag_seconds
    hi = jnp.maximum(s_last, g_last) + max_lag_seconds
    span = jnp.maximum(hi - lo, 1e-6)
    dt_g = span / n_grid
    grid = lo + dt_g * jnp.arange(n_grid, dtype=dtype)

    def resample(grid, t_c, v_c, first_t, last_t):
        y = jnp.interp(grid, t_c, v_c)
        return jnp.where((grid < first_t) | (grid > last_t), 0.0, y)

    a = resample(grid, ts, vs, s_first, s_last)
    b = resample(grid, tg, vg, g_first, g_last)

    def z(x):
        mu = jnp.mean(x)
        sd = jnp.std(x)
        return (x - mu) / jnp.where(sd > 1e-12, sd, 1.0)

    a, b = z(a), z(b)

    # corr[k] = Σᵢ a[i]·b[i+k] (circular) = irfft(conj(rfft(a))·rfft(b)).
    corr = jnp.fft.irfft(jnp.conj(jnp.fft.rfft(a)) * jnp.fft.rfft(b), n=n_grid)
    k = jnp.arange(n_grid)
    signed = jnp.where(k <= n_grid // 2, k, k - n_grid)
    in_range = jnp.abs(signed * dt_g) <= max_lag_seconds
    usable = (s_n >= 2) & (g_n >= 2)
    best = jnp.argmax(jnp.where(in_range, corr, -jnp.inf))
    offset = -signed[best].astype(dtype) * dt_g
    return jnp.where(usable, offset, 0.0)


class AlignedGPS(NamedTuple):
    """GPS positions interpolated onto SLAM timestamps.

    aligned: (n_slam, 3) interpolated positions (arbitrary where invalid).
    valid:   (n_slam,) bool — True where a GPS segment covers the timestamp.
    """

    aligned: jnp.ndarray
    valid: jnp.ndarray


def _compact_sort(
    times: jnp.ndarray,
    positions: jnp.ndarray,
    valid: jnp.ndarray,
    assume_sorted: bool = False,
):
    """Stable-sort by time, drop invalid + duplicate timestamps via
    compaction. Returns (t, pos, keep_count) with +inf padding at the tail.

    ``assume_sorted=True`` (the VALID timestamps are nondecreasing — every
    real GNSS stream; callers verify on host) skips the argsort entirely:
    the stable sort is then the identity permutation, and the duplicate
    test against the sorted predecessor becomes a test against the running
    max of earlier valid times. ~3 ms at all-KITTI scale (TPU sorts are
    O(m log² m) sorting networks)."""
    m = times.shape[0]
    key = jnp.where(valid, times, _INF)
    if assume_sorted:
        t_sorted = key
        p_sorted = positions
        prev_valid_t = jnp.concatenate(
            [
                jnp.full((1,), -_INF, times.dtype),
                jax.lax.cummax(jnp.where(valid, times, -_INF))[:-1],
            ]
        )
        dup = valid & (times == prev_valid_t)
        keep = jnp.isfinite(key) & ~dup
    else:
        order = jnp.argsort(key, stable=True)
        t_sorted = key[order]
        p_sorted = positions[order]
        # Duplicate = equal to predecessor (first occurrence kept).
        dup = jnp.concatenate(
            [jnp.zeros((1,), bool), t_sorted[1:] == t_sorted[:-1]]
        )
        keep = jnp.isfinite(t_sorted) & ~dup
    n_eff = jnp.sum(keep)
    # Single-pass compaction (no second sort): each row's destination is its
    # rank among the kept rows (dropped rows go behind, in order), a unique
    # permutation — scattering iota through it yields the gather order
    # directly. One scatter replaces a full stable argsort (~1.5 ms at
    # all-KITTI scale, ROADMAP perf lever).
    ranks = jnp.cumsum(keep) - 1
    dest = jnp.where(keep, ranks, n_eff + (jnp.arange(m) - ranks) - 1)
    order2 = (
        jnp.zeros((m,), dest.dtype)
        .at[dest]
        .set(jnp.arange(m, dtype=dest.dtype), unique_indices=True)
    )
    t_c = jnp.where(jnp.arange(m) < n_eff, t_sorted[order2], _INF)
    p_c = p_sorted[order2]
    return t_c, p_c, n_eff


def _add_combine(e1, e2):
    return tuple(x + y for x, y in zip(e1, e2))


def _max_combine(e1, e2):
    return tuple(jnp.maximum(x, y) for x, y in zip(e1, e2))


def _min_combine(e1, e2):
    return tuple(jnp.minimum(x, y) for x, y in zip(e1, e2))


def _segment_structure(t: jnp.ndarray, n_eff, gap_threshold: float, platform: str = "cpu"):
    """Label gap-separated segments on compacted times.

    Returns (seg_id, is_real, start_idx, end_idx, start_t, end_t, length,
    ok), where the aggregate arrays are PER-POINT (each point carries its
    own segment's value) — segments are contiguous runs on the sorted
    times, so every aggregate reduces to a cumulative max / prefix-sum
    difference instead of the scatter-based `segment_*` ops (TPU scatters
    were the hot spot of alignment at scale). ``ok`` requires len ≥ 2 and
    all within-segment steps > 1e-9.

    Off-CPU (``platform``; resolved by the caller) the eight cumulative
    scans fuse into THREE single-kernel Pallas ladders (2 forward, 1
    reverse) over f32 leaves — alignment is latency-bound on scan fusion
    rounds at production sizes. All propagated values are integers < 2²⁴
    or knot times, so the f32 tuple scans are exact and BOTH paths return
    identical results (property-tested).
    """
    m = t.shape[0]
    idx = jnp.arange(m)
    is_real = idx < n_eff
    dt = jnp.diff(t)  # (m-1,) — inf at/after the padding boundary
    gap = dt > gap_threshold
    is_start = jnp.concatenate([jnp.ones((1,), bool), gap])
    is_end = jnp.concatenate([gap, jnp.ones((1,), bool)])
    # Any within-segment step ≤ 1e-9 ⇒ segment skipped (reference
    # EKFGPSSLAM.py:364-366). cum_bad is nondecreasing, so "cum_bad at my
    # segment's start/end" also propagates by cummax/reverse-cummin of the
    # values marked at starts/ends — gather-free, like every aggregate
    # here: the nearest start ≤ j maximises, the nearest end ≥ j minimises
    # (monotone along the compacted sorted times).
    bad = (dt <= 1e-9) & ~gap
    t_fin = jnp.where(jnp.isfinite(t), t, _INF)

    if platform in ("cpu",) or m >= (1 << 24) or t.dtype != jnp.float32:
        # Exact-int lax path (golden-pinned; also any size/dtype the f32
        # fused ladders below could not represent).
        seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        start_idx = jax.lax.cummax(jnp.where(is_start, idx, -1))
        end_idx = jnp.asarray(
            jax.lax.cummin(jnp.where(is_end, idx, m), axis=0, reverse=True)
        )
        # NaN knot times (possible for valid-flagged NaN inputs) are mapped
        # to +inf so they cannot poison the scans — their rows are non-real
        # and masked invalid downstream.
        start_t = jax.lax.cummax(jnp.where(is_start, t_fin, -_INF))
        end_t = jax.lax.cummin(
            jnp.where(is_end, t_fin, _INF), axis=0, reverse=True
        )
        # cb_excl[j] = number of bad steps among dt[0..j-1] (exclusive).
        cb_excl = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(bad.astype(jnp.int32))]
        )
        big = jnp.iinfo(jnp.int32).max
        cb_start = jax.lax.cummax(jnp.where(is_start, cb_excl, -1))
        cb_end = jax.lax.cummin(
            jnp.where(is_end, cb_excl, big), axis=0, reverse=True
        )
    else:
        from gps_optimize_slam_tpu.ops.tridiag import _scan_impl

        f32 = jnp.float32
        idx_f = idx.astype(f32)
        # Forward pass A (prefix sums): seg_id counter + exclusive bad count.
        sum_scan = _scan_impl(platform, (0.0, 0.0))
        bad_full = jnp.concatenate([jnp.zeros((1,), bool), bad])
        seg_id_f, cb_excl_f = sum_scan(
            _add_combine, (is_start.astype(f32), bad_full.astype(f32))
        )
        seg_id = seg_id_f.astype(jnp.int32) - 1
        cb_excl = cb_excl_f
        # Forward pass B (running max of start-marked values).
        max_scan = _scan_impl(platform, (-float("inf"),) * 3)
        start_idx_f, start_t, cb_start = max_scan(
            _max_combine,
            (
                jnp.where(is_start, idx_f, -1.0),
                jnp.where(is_start, t_fin, -_INF),
                jnp.where(is_start, cb_excl, -1.0),
            ),
        )
        # Reverse pass C (running min of end-marked values).
        min_scan = _scan_impl(platform, (float("inf"),) * 3)
        end_idx_f, end_t, cb_end = min_scan(
            _min_combine,
            (
                jnp.where(is_end, idx_f, float(m)),
                jnp.where(is_end, t_fin, _INF),
                jnp.where(is_end, cb_excl, _INF),
            ),
            reverse=True,
        )
        start_idx = start_idx_f.astype(jnp.int32)
        end_idx = end_idx_f.astype(jnp.int32)

    seg_len = end_idx - start_idx + 1
    any_bad = (cb_end - cb_start) > 0
    seg_ok = (seg_len >= 2) & ~any_bad
    return seg_id, is_real, start_idx, end_idx, start_t, end_t, seg_len, seg_ok


def _notaknot_moments(
    t: jnp.ndarray,
    y: jnp.ndarray,
    seg_id: jnp.ndarray,
    is_real: jnp.ndarray,
    seg_start_idx: jnp.ndarray,
    seg_end_idx: jnp.ndarray,
    seg_len: jnp.ndarray,
    seg_ok: jnp.ndarray,
) -> jnp.ndarray:
    """Second derivatives ("moments") of every per-segment not-a-knot cubic
    spline, solved as one block-diagonal dense system.

    Rows for points outside cubic (len>=4, ok) segments are identity (M=0),
    keeping the matrix nonsingular. O(m³) dense solve — fine for typical GNSS
    streams; a pentadiagonal path is the planned scale-out optimisation.
    """
    m = t.shape[0]
    idx = jnp.arange(m)
    dt = jnp.diff(t)
    h = jnp.concatenate([dt, jnp.ones((1,), t.dtype)])  # h[j] = t[j+1]-t[j]
    hm1 = jnp.concatenate([jnp.ones((1,), t.dtype), dt])  # h[j-1]
    hm2 = jnp.concatenate([jnp.ones((2,), t.dtype), dt[:-1]])  # h[j-2]

    cubic_here = seg_ok & (seg_len >= 4) & is_real
    at_start = idx == seg_start_idx
    at_end = idx == seg_end_idx
    interior = cubic_here & ~at_start & ~at_end
    start_row = cubic_here & at_start
    end_row = cubic_here & at_end

    # Sanitise h values used per row kind to avoid inf/NaN leaking in.
    h_s = jnp.where(jnp.isfinite(h), h, 1.0)
    hm1_s = jnp.where(jnp.isfinite(hm1), hm1, 1.0)
    hm2_s = jnp.where(jnp.isfinite(hm2), hm2, 1.0)

    # Column offsets and coefficients per row (3 nonzeros each):
    #   start (not-a-knot):  cols j, j+1, j+2 : [h1, -(h0+h1), h0]
    #   interior:            cols j-1, j, j+1 : [hm1/6, (hm1+h)/3, h/6]
    #   end (not-a-knot):    cols j-2, j-1, j : [hm1, -(hm2+hm1), hm2]
    #   identity otherwise:  col j : 1
    h0 = h_s  # at start rows: h0 = t[j+1]-t[j]
    h1 = jnp.roll(h_s, -1)  # at start rows: h1 = t[j+2]-t[j+1]

    c0 = jnp.where(
        start_row, h1, jnp.where(interior, hm1_s / 6.0, jnp.where(end_row, hm1_s, 1.0))
    )
    c1 = jnp.where(
        start_row,
        -(h0 + h1),
        jnp.where(
            interior, (hm1_s + h_s) / 3.0, jnp.where(end_row, -(hm2_s + hm1_s), 0.0)
        ),
    )
    c2 = jnp.where(
        start_row, h0, jnp.where(interior, h_s / 6.0, jnp.where(end_row, hm2_s, 0.0))
    )
    o0 = jnp.where(start_row, 0, jnp.where(interior, -1, jnp.where(end_row, -2, 0)))
    o1 = jnp.where(start_row, 1, jnp.where(interior, 0, jnp.where(end_row, -1, 0)))
    o2 = jnp.where(start_row, 2, jnp.where(interior, 1, jnp.where(end_row, 0, 0)))

    cols0 = jnp.clip(idx + o0, 0, m - 1)
    cols1 = jnp.clip(idx + o1, 0, m - 1)
    cols2 = jnp.clip(idx + o2, 0, m - 1)

    A = jnp.zeros((m, m), t.dtype)
    A = A.at[idx, cols0].add(c0)
    A = A.at[idx, cols1].add(c1)
    A = A.at[idx, cols2].add(c2)

    # RHS: divided differences for interior rows, 0 elsewhere.
    y_s = jnp.where(jnp.isfinite(y), y, 0.0)
    dy = jnp.diff(y_s, axis=0)
    slope = dy / dt[:, None]
    slope = jnp.where(jnp.isfinite(slope), slope, 0.0)
    slope_j = jnp.concatenate([slope, jnp.zeros((1, y.shape[1]), y.dtype)])
    slope_jm1 = jnp.concatenate([jnp.zeros((1, y.shape[1]), y.dtype), slope])
    rhs = jnp.where(interior[:, None], slope_j - slope_jm1, 0.0)

    return jnp.linalg.solve(A, rhs)


def _notaknot_moments_tridiag(
    t: jnp.ndarray,
    y: jnp.ndarray,
    seg_id: jnp.ndarray,
    is_real: jnp.ndarray,
    seg_start_idx: jnp.ndarray,
    seg_end_idx: jnp.ndarray,
    seg_len: jnp.ndarray,
    seg_ok: jnp.ndarray,
    platform: str = "cpu",
) -> jnp.ndarray:
    """Same moments as ``_notaknot_moments`` via a tridiagonal solve.

    The not-a-knot corner equations couple three unknowns and break the
    tridiagonal band; eliminating M_s (segment start) and M_e (segment end)
    algebraically into the adjacent interior equations restores a pure
    tridiagonal system over interior nodes, solved with the O(log m)-depth
    associative-scan Thomas solver (ops.tridiag) instead of an O(m³) dense
    factorisation — the path that scales to 10⁴-10⁵ GPS samples. Corner
    moments are recovered in closed form afterwards.
    """
    from gps_optimize_slam_tpu.ops.tridiag import tridiag_solve

    m = t.shape[0]
    idx = jnp.arange(m)
    dt = jnp.diff(t)
    one = jnp.ones((1,), t.dtype)
    h = jnp.concatenate([dt, one])  # h[j] = t[j+1]-t[j]
    hm1 = jnp.concatenate([one, dt])  # h[j-1]
    h_s = jnp.where(jnp.isfinite(h) & (h > 0), h, 1.0)
    hm1_s = jnp.where(jnp.isfinite(hm1) & (hm1 > 0), hm1, 1.0)

    cubic_here = seg_ok & (seg_len >= 4) & is_real
    first_int = cubic_here & (idx == seg_start_idx + 1)
    last_int = cubic_here & (idx == seg_end_idx - 1)
    # With len==4 a row can be first AND last interior simultaneously? No:
    # first = s+1, last = e-1 = s+2 — distinct. Plain interior otherwise.
    plain = (
        cubic_here
        & (idx > seg_start_idx + 1)
        & (idx < seg_end_idx - 1)
    )

    # Divided-difference RHS r_j.
    y_s = jnp.where(jnp.isfinite(y), y, 0.0)
    slope = jnp.diff(y_s, axis=0) / dt[:, None]
    slope = jnp.where(jnp.isfinite(slope), slope, 0.0)
    slope_j = jnp.concatenate([slope, jnp.zeros((1, y.shape[1]), y.dtype)])
    slope_jm1 = jnp.concatenate([jnp.zeros((1, y.shape[1]), y.dtype), slope])
    r = slope_j - slope_jm1

    interiorish = first_int | last_int | plain
    # Row coefficients (a: M_{j-1}, b: M_j, c: M_{j+1}).
    a = jnp.where(plain | last_int, hm1_s / 6.0, 0.0)
    a = a - jnp.where(last_int, h_s**2 / (6.0 * hm1_s), 0.0)
    b = jnp.where(interiorish, (hm1_s + h_s) / 3.0, 1.0)
    b = b + jnp.where(first_int, hm1_s * (hm1_s + h_s) / (6.0 * h_s), 0.0)
    b = b + jnp.where(last_int, h_s * (hm1_s + h_s) / (6.0 * hm1_s), 0.0)
    c = jnp.where(plain | first_int, h_s / 6.0, 0.0)
    c = c - jnp.where(first_int, hm1_s**2 / (6.0 * h_s), 0.0)
    d = jnp.where(interiorish[:, None], r, 0.0)

    M = tridiag_solve(a, b, c, d, platform=platform)
    M = jnp.where(interiorish[:, None], M, 0.0)

    # Recover corner moments:
    # M_s = [M_{s+1}(h_s+h_{s+1}) − M_{s+2}·h_s] / h_{s+1}
    # M_e = [M_{e-1}(h_{e-2}+h_{e-1}) − M_{e-2}·h_{e-1}] / h_{e-2}
    at_start = cubic_here & (idx == seg_start_idx)
    at_end = cubic_here & (idx == seg_end_idx)
    j1 = jnp.clip(idx + 1, 0, m - 1)
    j2 = jnp.clip(idx + 2, 0, m - 1)
    h0 = h_s
    h1 = jnp.where(jnp.isfinite(h[j1]) & (h[j1] > 0), h[j1], 1.0)
    m_start = (M[j1] * (h0 + h1)[:, None] - M[j2] * h0[:, None]) / h1[:, None]
    k1 = jnp.clip(idx - 1, 0, m - 1)
    k2 = jnp.clip(idx - 2, 0, m - 1)
    he1 = hm1_s  # h_{e-1}
    he2 = jnp.where(jnp.isfinite(hm1[k1]) & (hm1[k1] > 0), hm1[k1], 1.0)  # h_{e-2}
    m_end = (M[k1] * (he2 + he1)[:, None] - M[k2] * he1[:, None]) / he2[:, None]

    M = jnp.where(at_start[:, None], m_start, M)
    M = jnp.where(at_end[:, None], m_end, M)
    return M


def _gather_rows_matmul(packed: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
    """Row gather ``packed[j]`` as a one-hot matmul — the TPU-native gather.

    XLA's dynamic gather serialises on TPU (measured ~3 ms per (m,3)→(n,3)
    row gather at all-KITTI scale — the single hottest op in alignment);
    the same access as onehot(j) @ packed rides the MXU and fuses the
    one-hot broadcast into the dot. Under `highest` matmul precision the
    bf16x3 passes represent each f32 operand exactly (8+8+8 mantissa bits),
    and every product is value×{0,1}, so the result is BIT-EXACT equal to
    the gather — provided ``packed`` is free of inf/NaN (0·inf = NaN):
    callers pre-sanitise with finite sentinels."""
    m = packed.shape[0]
    onehot = (j[:, None] == jnp.arange(m)[None, :]).astype(packed.dtype)
    return onehot @ packed


@highp
def align_gps_to_slam(
    slam_times: jnp.ndarray,
    gps_times: jnp.ndarray,
    gps_positions: jnp.ndarray,
    gps_valid: Optional[jnp.ndarray] = None,
    time_offset=0.0,
    cfg: TimeAlignConfig = TimeAlignConfig(),
    spline_solver: str = "auto",
    gather: str = "auto",
    assume_sorted: bool = False,
    platform: str = "auto",
) -> AlignedGPS:
    """Interpolate GPS positions onto SLAM timestamps, honouring gaps.

    Jittable static-shape equivalent of dynamic_time_alignment
    (reference: EKFGPSSLAM.py:325-387): segments split at time gaps
    > cfg.max_gps_gap_threshold; cubic (not-a-knot) for segments of ≥4
    points, linear for 2-3; timestamps outside every segment's span are
    invalid.

    ``spline_solver``: "dense" (one block-diagonal O(m³) solve),
    "tridiagonal" (corner-eliminated O(log m)-depth associative Thomas —
    the scalable path), or "auto" (tridiagonal for ≥256 GPS samples).

    ``gather``: how the spline evaluation fetches its per-interval rows —
    "take" (XLA dynamic gather; right on CPU), "matmul" (one-hot MXU
    matmul, bit-exact, ~6 ms faster at all-KITTI scale on TPU), or "auto"
    (matmul off-CPU, capped: above ``GATHER_MATMUL_MAX_WORK`` one-hot
    elements the O(N·M) intermediate would dominate HBM, so auto falls
    back to the dynamic gather). Both paths produce identical outputs.

    ``platform`` must name the COMPILE platform when this is traced into a
    program targeting non-default devices (fuse_core passes its resolved
    config.platform); "auto" consults the process-default oracle
    (utils.backend.resolve_platform).

    ``assume_sorted``: promise that the VALID GPS timestamps are
    nondecreasing (true of every real GNSS stream; callers verify on the
    host — see pipeline.fuse_arrays) — skips the compaction argsort.
    """
    dtype = jnp.result_type(slam_times.dtype, gps_times.dtype, jnp.float32)
    slam_times = slam_times.astype(dtype)
    gps_times = gps_times.astype(dtype)
    gps_positions = gps_positions.astype(dtype)
    if gps_valid is None:
        gps_valid = jnp.ones(gps_times.shape, bool)

    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    platform = resolve_platform(platform)

    t, p, n_eff = _compact_sort(
        gps_times + time_offset, gps_positions, gps_valid, assume_sorted=assume_sorted
    )
    (
        seg_id,
        is_real,
        seg_start_idx,
        seg_end_idx,
        seg_start_t,
        seg_end_t,
        seg_len,
        seg_ok,
    ) = _segment_structure(t, n_eff, cfg.max_gps_gap_threshold, platform=platform)

    if spline_solver == "auto":
        spline_solver = "tridiagonal" if gps_times.shape[0] >= 256 else "dense"
    moments_fn = (
        functools.partial(_notaknot_moments_tridiag, platform=platform)
        if spline_solver == "tridiagonal"
        else _notaknot_moments
    )
    moments = moments_fn(
        t, p, seg_id, is_real, seg_start_idx, seg_end_idx, seg_len, seg_ok
    )

    m = t.shape[0]
    # Bracketing interval for each SLAM timestamp. The default binary-search
    # lowering is ~13 dependent gather rounds — slow on TPU (measured 8.1 ms
    # at all-KITTI scale). For typical sizes the brute-force compare-all
    # (one fused (N,M) comparison + row reduction) is 4× faster; cap its
    # quadratic cost for very long trajectories with the sort-based method.
    ss_method = (
        "compare_all" if t.shape[0] * slam_times.shape[0] <= 64_000_000 else "sort"
    )
    j = jnp.searchsorted(t, slam_times, side="right", method=ss_method) - 1
    j = jnp.clip(j, 0, m - 1)

    # Auto gather: one-hot matmul off-CPU, but capped — the one-hot is an
    # (N, M) intermediate, O(N·M) HBM; beyond the cap (≈256 MB f32) the
    # dynamic gather's serialisation is the lesser evil (same work-product
    # guard as the searchsorted method choice above). ``platform`` was
    # resolved once at the top of this function.
    use_matmul = gather == "matmul" or (
        gather == "auto"
        and platform != "cpu"
        and m * slam_times.shape[0] <= GATHER_MATMUL_MAX_WORK
    )
    if use_matmul:
        # TPU path: the ~13 per-point/per-interval fetches become TWO
        # one-hot matmuls over packed row matrices (see _gather_rows_matmul
        # — dynamic gathers were the hottest op of the whole pipeline).
        # +inf sentinels (padding times, segment aggregates) are replaced
        # by a large-but-finite time so 0·inf never makes a NaN; every
        # consumer below already guards with (h > 0)/valid masks, and rows
        # carrying the sentinel are invalid by construction.
        big = jnp.asarray(1e6, t.dtype)
        t_fin = jnp.where(jnp.isfinite(t), t, big)
        p_fin = jnp.where(jnp.isfinite(p), p, 0.0)
        mom_fin = jnp.where(jnp.isfinite(moments), moments, 0.0)
        packed1 = jnp.stack(
            [
                seg_start_idx.astype(t.dtype),
                seg_end_idx.astype(t.dtype),
                seg_len.astype(t.dtype),
                jnp.where(jnp.isfinite(seg_start_t), seg_start_t, big),
                jnp.where(jnp.isfinite(seg_end_t), seg_end_t, big),
                seg_ok.astype(t.dtype),
                is_real.astype(t.dtype),
            ],
            axis=-1,
        )
        r1 = _gather_rows_matmul(packed1, j)
        start_idx_j = r1[:, 0]
        end_idx_j = r1[:, 1]
        len_j = r1[:, 2]
        start_t_j, end_t_j = r1[:, 3], r1[:, 4]
        ok_j = r1[:, 5] > 0.5
        real_j = r1[:, 6] > 0.5

        jf = j.astype(t.dtype)
        j_eval = jnp.where((jf == end_idx_j) & (jf > start_idx_j), j - 1, j)
        j_eval = jnp.clip(j_eval, 0, m - 2)

        packed2 = jnp.concatenate(
            [
                t_fin[:, None],
                jnp.roll(t_fin, -1)[:, None],
                p_fin,
                jnp.roll(p_fin, -1, axis=0),
                mom_fin,
                jnp.roll(mom_fin, -1, axis=0),
            ],
            axis=-1,
        )
        r2 = _gather_rows_matmul(packed2, j_eval)
        t0, t1 = r2[:, 0], r2[:, 1]
        y0, y1 = r2[:, 2:5], r2[:, 5:8]
        m0, m1 = r2[:, 8:11], r2[:, 11:14]
    else:
        # A timestamp equal to a segment's last knot must evaluate on the
        # interval to its LEFT (the bracketing interval crosses the gap).
        # (Aggregates are per-point arrays — gather at the bracketing j.)
        j_eval = jnp.where(
            (j == seg_end_idx[j]) & (j > seg_start_idx[j]), j - 1, j
        )
        j_eval = jnp.clip(j_eval, 0, m - 2)
        len_j = seg_len[j]
        start_t_j, end_t_j = seg_start_t[j], seg_end_t[j]
        ok_j, real_j = seg_ok[j], is_real[j]
        t0 = t[j_eval]
        t1 = t[j_eval + 1]
        y0 = jnp.where(jnp.isfinite(p[j_eval]), p[j_eval], 0.0)
        y1 = jnp.where(jnp.isfinite(p[j_eval + 1]), p[j_eval + 1], 0.0)
        m0 = moments[j_eval]
        m1 = moments[j_eval + 1]

    h = t1 - t0
    h_safe = jnp.where((h > 0) & jnp.isfinite(h), h, 1.0)
    u = (slam_times - t0)[:, None]
    v = (t1 - slam_times)[:, None]
    hh = h_safe[:, None]
    cubic_val = (
        m0 * v**3 / (6.0 * hh)
        + m1 * u**3 / (6.0 * hh)
        + (y0 / hh - m0 * hh / 6.0) * v
        + (y1 / hh - m1 * hh / 6.0) * u
    )
    linear_val = y0 + (y1 - y0) * (u / hh)

    use_cubic = (len_j >= 4)[:, None]
    aligned = jnp.where(use_cubic, cubic_val, linear_val)

    valid = (
        (slam_times >= t[0])
        & (slam_times >= start_t_j)
        & (slam_times <= end_t_j)
        & ok_j
        & real_j
    )
    aligned = jnp.where(valid[:, None], aligned, jnp.nan)
    return AlignedGPS(aligned=aligned, valid=valid)


def sim3_window_mask(
    slam_times: jnp.ndarray,
    valid: jnp.ndarray,
    gap_threshold: float,
    max_duration: float,
    min_samples: int,
) -> jnp.ndarray:
    """Select the SLAM indices used for Sim3 fitting (reference
    EKFGPSSLAM.py:977-998): the first gap-free run of GPS-valid timestamps,
    truncated to ``max_duration`` seconds — with the reference's fallbacks:
    if the first run has < min_samples points use ALL valid points; if the
    truncated window has < min_samples points use the whole first run.

    Returns a boolean mask over SLAM indices (static shape). Assumes
    ``slam_times`` is time-ordered (the invariant the whole pipeline — and
    the reference — relies on); the valid timestamps are then already in
    sorted order, so the first-gap analysis is pure prefix arithmetic (the
    previous implementation's compaction argsort was the hot spot of this
    stage at scale).
    """
    dtype = slam_times.dtype
    n_valid = jnp.sum(valid)
    rank = jnp.cumsum(valid.astype(jnp.int32))  # 1-based among valid points

    # Time of the PREVIOUS valid point (exclusive prefix max works because
    # times ascend): -inf before the first valid point.
    t_masked = jnp.where(valid, slam_times, -_INF)
    prev_t = jnp.concatenate(
        [jnp.full((1,), -_INF, dtype), jax.lax.cummax(t_masked)[:-1]]
    )
    # A "gap pair" sits at the RIGHT point of two consecutive valid samples.
    gap_pair = valid & (rank >= 2) & ((slam_times - prev_t) > gap_threshold)
    # Rank of the first gap's right point; n+1 when gap-free.
    first_gap_rank = jnp.min(
        jnp.where(gap_pair, rank, jnp.iinfo(jnp.int32).max)
    )
    # The reference slices valid_indices[:first_gap_idx]
    # (EKFGPSSLAM.py:982-984) — the LEFT point of the gap pair (the first
    # segment's last point) is EXCLUDED, so the run keeps ranks
    # 1..first_gap_rank-2; with no gap the segment is all n_valid points.
    run_len = jnp.minimum(first_gap_rank - 2, n_valid)

    run_start_t = jnp.min(jnp.where(valid, slam_times, _INF))
    # Time of the valid point with rank == run_len (the run's last point).
    at_end = valid & (rank == run_len)
    run_end_t = jnp.max(jnp.where(at_end, slam_times, -_INF))

    in_first_run = valid & (slam_times <= run_end_t)
    timed = in_first_run & (slam_times <= run_start_t + max_duration)

    n_run = jnp.sum(in_first_run)
    n_timed = jnp.sum(timed)

    use_all = n_run < min_samples  # first segment too short → all valid points
    use_run = (~use_all) & (n_timed < min_samples)  # timed window too small
    return jnp.where(use_all, valid, jnp.where(use_run, in_first_run, timed))
