"""Out-of-core (>HBM) temporal alignment + Sim(3) estimation on raw GNSS.

Completes the >HBM story end-to-end (VERDICT r2 task 3): together with
``ops.kalman_chunked`` this lets RAW (unaligned, gappy, duplicate-laden)
GNSS fixes and a SLAM stream of any length fuse with O(chunk) device
residency — the full pipeline the in-core ``models.fusion.fuse_core`` runs
(reference recipe EKFGPSSLAM.py:940-1123), re-entrant over host chunks.

Why chunked alignment is exact: the per-segment not-a-knot cubic spline
(reference interp1d path, EKFGPSSLAM.py:325-387) solves a strictly
diagonally dominant tridiagonal system, so a knot's influence on the
moments decays geometrically with distance — factor ≤ 1/(2+√3) ≈ 0.268 per
knot. Evaluating a SLAM chunk against a GPS *window* that extends ``halo``
knots beyond the chunk's span therefore reproduces the full-trajectory
spline to within 0.268^halo (≈1e-37 at the default halo=64 — exact in
float64). The device kernel IS ``alignment.align_gps_to_slam`` on the
window; window-edge cuts behave as segment corners whose boundary-condition
difference decays identically. The one genuinely global property — the
reference's "any within-segment step ≤ 1e-9 skips the whole segment"
(EKFGPSSLAM.py:364-366) — is computed in a host prepass.

Sim(3) at scale: the calc window (first gap-free run ≤ 180 s, reference
EKFGPSSLAM.py:977-998) is found by a host scan of the aligned validity;
RANSAC trials run in-core on (at most) a uniform subsample, and the final
refit streams Umeyama sufficient statistics over ALL inliers
(``umeyama_sim3_from_moments``), so the fitted transform reflects every
point regardless of length.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import Sim3RansacConfig, TimeAlignConfig
from gps_optimize_slam_tpu.ops import alignment, ransac
from gps_optimize_slam_tpu.ops.umeyama import Sim3, umeyama_sim3_from_moments
from gps_optimize_slam_tpu.utils import streaming


# ---------------------------------------------------------------------------
# Host prepass: compaction + global segment health
# ---------------------------------------------------------------------------


class CompactGPS(NamedTuple):
    """Host-side compacted GNSS stream (sorted, deduplicated, offset applied).

    ``ok`` marks samples whose segment survives the reference's global
    bad-step check; they are the only samples the device windows may use.
    """

    times: np.ndarray  # (n_eff,) sorted, strictly increasing
    positions: np.ndarray  # (n_eff, 3)
    ok: np.ndarray  # (n_eff,) bool


def compact_gps_host(
    gps_times,
    gps_positions,
    gps_valid=None,
    time_offset: float = 0.0,
    gap_threshold: float = 5.0,
    chunk: int = 1 << 20,
    dtype=np.float64,
) -> CompactGPS:
    """Streaming host prepass: drop invalid fixes, sort if needed, dedup
    (keep first occurrence — np.unique semantics, like ``_compact_sort``),
    apply the clock offset, and mark samples of segments containing a
    post-dedup step ≤ 1e-9 as unusable (the reference skips such segments
    entirely; a window cut cannot see that globally, hence the prepass).

    Sorted inputs stream in O(chunk) working memory; an unsorted stream
    falls back to one host argsort (the inputs are host-resident anyway).
    """
    m = len(gps_times)
    if gps_valid is None:
        gps_valid = np.ones(m, bool)

    t_out = np.empty(m, dtype)
    p_out = np.empty((m, 3), dtype)
    n = 0
    last_t = -np.inf
    sorted_ok = True
    for a in range(0, m, chunk):
        t = np.asarray(gps_times[a : a + chunk], dtype) + time_offset
        p = np.asarray(gps_positions[a : a + chunk], dtype)
        v = np.asarray(gps_valid[a : a + chunk], bool) & np.isfinite(t)
        tv, pv = t[v], p[v]
        if tv.size == 0:
            continue
        if tv[0] < last_t or np.any(np.diff(tv) < 0):
            sorted_ok = False
            break
        keep = np.empty(tv.size, bool)
        keep[0] = tv[0] > last_t
        keep[1:] = tv[1:] > tv[:-1]
        k = int(keep.sum())
        t_out[n : n + k] = tv[keep]
        p_out[n : n + k] = pv[keep]
        n += k
        last_t = tv[-1]

    if not sorted_ok:
        # Unsorted stream: one host sort over the valid fixes.
        t = np.asarray(gps_times, dtype) + time_offset
        v = np.asarray(gps_valid, bool) & np.isfinite(t)
        tv = t[v]
        pv = np.asarray(gps_positions, dtype)[v]
        order = np.argsort(tv, kind="stable")
        tv, pv = tv[order], pv[order]
        keep = np.empty(tv.size, bool)
        keep[:1] = True
        keep[1:] = tv[1:] > tv[:-1]
        n = int(keep.sum())
        t_out[:n] = tv[keep]
        p_out[:n] = pv[keep]

    t_c, p_c = t_out[:n], p_out[:n]

    # Global segment health: segments split at gaps > threshold; any step
    # ≤ 1e-9 inside a segment poisons the WHOLE segment (reference
    # EKFGPSSLAM.py:364-366). Vectorised over the compacted stream.
    ok = np.ones(n, bool)
    if n >= 2:
        dt = np.diff(t_c)
        gap = dt > gap_threshold
        bad = (dt <= 1e-9) & ~gap
        if bad.any():
            seg_id = np.concatenate([[0], np.cumsum(gap)])
            bad_segs = np.unique(seg_id[:-1][bad])
            ok = ~np.isin(seg_id, bad_segs)
    return CompactGPS(times=t_c, positions=p_c, ok=ok)


# ---------------------------------------------------------------------------
# Chunked alignment driver
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def _align_kernel(cfg: TimeAlignConfig, dtype_name: str, platform: str = "cpu"):
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def kernel(slam_t, win_t, win_p, win_ok):
        # Window arrays come pre-sorted/deduplicated from compact_gps_host
        # — the in-kernel compaction argsort is provably a no-op.
        out = alignment.align_gps_to_slam(
            slam_t.astype(dtype),
            win_t.astype(dtype),
            win_p.astype(dtype),
            gps_valid=win_ok,
            cfg=cfg,
            spline_solver="tridiagonal",
            assume_sorted=True,
            platform=platform,
        )
        return out.aligned, out.valid

    return kernel


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def align_gps_to_slam_chunked(
    slam_times,
    gps_times,
    gps_positions,
    gps_valid=None,
    time_offset: float = 0.0,
    cfg: TimeAlignConfig = TimeAlignConfig(),
    chunk_size: int = 65536,
    halo: int = 64,
    dtype=np.float64,
    out_aligned: Optional[np.ndarray] = None,
    out_valid: Optional[np.ndarray] = None,
    compact: Optional[CompactGPS] = None,
    platform: str = "auto",
) -> Tuple[np.ndarray, np.ndarray]:
    """``alignment.align_gps_to_slam`` for host-resident (memmappable)
    arrays of any length: SLAM timestamps stream through fixed-size chunks,
    each evaluated against the GPS window covering its span plus a ``halo``
    of knots on each side (see module docstring for the exactness argument).

    Returns host ``(aligned (N,3), valid (N,))``; ``out_*`` may be
    preallocated/memmapped. Device residency is O(chunk + window).
    """
    n = len(slam_times)
    dtype = np.dtype(dtype)
    if compact is None:
        compact = compact_gps_host(
            gps_times,
            gps_positions,
            gps_valid,
            time_offset=time_offset,
            gap_threshold=cfg.max_gps_gap_threshold,
            dtype=dtype,
        )
    t_c, p_c, ok_c = compact
    m = len(t_c)

    if out_aligned is None:
        out_aligned = np.empty((n, 3), dtype)
    if out_valid is None:
        out_valid = np.empty(n, bool)
    if m == 0:
        out_aligned[:] = np.nan
        out_valid[:] = False
        return out_aligned, out_valid

    nc = min(chunk_size, n)
    # One fixed window size for all chunks (one compile): the widest
    # chunk-span window, rounded up. Chunk spans are known host-side from
    # two searchsorteds per chunk.
    bounds = []
    w_need = 1
    for a in range(0, n, nc):
        b = min(a + nc, n)
        ta = float(np.min(np.asarray(slam_times[a:b], dtype)))
        tb = float(np.max(np.asarray(slam_times[a:b], dtype)))
        lo = max(int(np.searchsorted(t_c, ta, side="right")) - 1 - halo, 0)
        hi = min(int(np.searchsorted(t_c, tb, side="left")) + 1 + halo, m)
        bounds.append((a, b, lo, hi))
        w_need = max(w_need, hi - lo)
    w = min(_round_up(w_need, 256), m) if m > 256 else m

    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    platform = resolve_platform(platform)  # host-driven: default device
    kernel = _align_kernel(cfg, dtype.name, platform)

    # Chunks are independent programs — software-pipelined like the other
    # out-of-core drivers (utils.streaming).
    def _stage(item):
        a, b, lo, hi = item
        hi = min(max(hi, lo + w), m)
        lo = max(hi - w, 0)
        st = np.full(nc, np.inf, dtype)
        st[: b - a] = np.asarray(slam_times[a:b], dtype)
        wt = np.full(w, np.inf, dtype)
        wp = np.zeros((w, 3), dtype)
        wo = np.zeros(w, bool)
        wt[: hi - lo] = t_c[lo:hi]
        wp[: hi - lo] = p_c[lo:hi]
        wo[: hi - lo] = ok_c[lo:hi]
        # Window-local view cannot know about GPS knots BEFORE the window:
        # a slam timestamp earlier than the window's first knot was already
        # marked invalid by the kernel (slam_times >= t[0]), which is also
        # globally correct since lo>0 implies t_c[lo] <= ta.
        return tuple(jax.device_put(x) for x in (st, wt, wp, wo))

    def _drain(item, out):
        a, b = item[0], item[1]
        aligned, valid = out
        out_aligned[a:b] = np.asarray(aligned)[: b - a]
        out_valid[a:b] = np.asarray(valid)[: b - a]

    streaming.stream_chunks(
        bounds, _stage, lambda item, staged: kernel(*staged), _drain
    )
    return out_aligned, out_valid


# ---------------------------------------------------------------------------
# Host Sim3 window selection + streaming RANSAC/refit
# ---------------------------------------------------------------------------


def sim3_window_mask_host(
    slam_times,
    valid,
    gap_threshold: float,
    max_duration: float,
    min_samples: int,
) -> np.ndarray:
    """Host-NumPy mirror of ``alignment.sim3_window_mask`` (reference window
    selection EKFGPSSLAM.py:977-998) for memmap-scale masks: first gap-free
    run of valid timestamps truncated to ``max_duration``, with the
    too-few-points fallbacks. Vectorised prefix ops, O(N) host."""
    t = np.asarray(slam_times)
    v = np.asarray(valid, bool)
    n_valid = int(v.sum())
    if n_valid == 0:
        return np.zeros(len(t), bool)
    rank = np.cumsum(v)
    t_masked = np.where(v, t, -np.inf)
    prev_t = np.concatenate([[-np.inf], np.maximum.accumulate(t_masked)[:-1]])
    gap_pair = v & (rank >= 2) & ((t - prev_t) > gap_threshold)
    first_gap_rank = (
        int(rank[gap_pair].min()) if gap_pair.any() else np.iinfo(np.int64).max
    )
    run_len = min(first_gap_rank - 2, n_valid)
    run_start_t = t[v].min()
    at_end = v & (rank == run_len)
    run_end_t = t[at_end].max() if at_end.any() else -np.inf
    in_first_run = v & (t <= run_end_t)
    timed = in_first_run & (t <= run_start_t + max_duration)
    if int(in_first_run.sum()) < min_samples:
        return v
    if int(timed.sum()) < min_samples:
        return in_first_run
    return timed


class StreamingSim3Result(NamedTuple):
    sim3: Sim3  # host-backed jnp arrays (R, t, scale, ok)
    num_inliers: int
    num_window: int
    subsampled: bool


@lru_cache(maxsize=8)
def _ransac_kernel(cfg: Sim3RansacConfig, dtype_name: str, platform: str):
    """In-core trial voting as ONE jitted program. Called eagerly from the
    streaming driver, ``ransac.sim3_ransac``'s dozens of constituent ops
    would each compile as a separate per-op XLA program (~0.5-1 s apiece on
    a tunneled TPU — the bulk of the round-4 chunked cold start of 180 s)."""

    @jax.jit
    def kernel(key, src, dst):
        return ransac.sim3_ransac(key, src, dst, cfg=cfg, platform=platform)

    return kernel


@lru_cache(maxsize=8)
def _moment_chunk_kernel(dtype_name: str):
    """Streamed two-pass Umeyama moment kernels with the running
    accumulators FOLDED IN: one jitted program per pass per chunk shape,
    instead of per-op eager compiles for the inlier test, the weighted
    sums, and the accumulator adds."""
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def pass1(src, dst, R, t, s, thr2, acc_w, acc_s, acc_d):
        src = src.astype(dtype)
        dst = dst.astype(dtype)
        pred = s * (src @ R.T.astype(dtype)) + t.astype(dtype)
        res2 = jnp.sum((pred - dst) ** 2, axis=-1)
        w = res2 < thr2
        wf = w.astype(dtype)
        return (
            w,
            acc_w + jnp.sum(wf),
            acc_s + wf @ src,
            acc_d + wf @ dst,
        )

    @jax.jit
    def pass2(src, dst, w, wsum, ssum, dsum, acc_H, acc_v):
        wf = w.astype(dtype)
        mu_s = ssum / jnp.maximum(wsum, 1.0)
        mu_d = dsum / jnp.maximum(wsum, 1.0)
        sc = src.astype(dtype) - mu_s
        dc = dst.astype(dtype) - mu_d
        H = jnp.einsum("ni,nj->ij", wf[:, None] * sc, dc)
        var = jnp.sum(wf * jnp.sum(sc**2, axis=-1))
        return acc_H + H, acc_v + var

    return pass1, pass2


@lru_cache(maxsize=8)
def _refit_kernel(dtype_name: str):
    """Final Umeyama-from-moments refit as ONE jitted program. The eager
    form re-traces its Jacobi-SVD ``lax.scan`` on every call (eager scan
    jaxprs never hit the primitive-callable cache), recompiling even on
    warm passes."""

    @jax.jit
    def kernel(wsum, ssum, dsum, H, var):
        mu_s = ssum / jnp.maximum(wsum, 1.0)
        mu_d = dsum / jnp.maximum(wsum, 1.0)
        return umeyama_sim3_from_moments(wsum, mu_s, mu_d, H, var)

    return kernel


def sim3_ransac_streaming(
    key: jax.Array,
    src,
    dst,
    window_mask,
    cfg: Sim3RansacConfig = Sim3RansacConfig(),
    max_ransac_points: int = 32768,
    chunk_size: int = 262144,
    dtype=np.float64,
    platform: str = "auto",
) -> StreamingSim3Result:
    """Robust Sim(3) on host-resident point streams of any length.

    RANSAC consensus voting runs in-core (``ransac.sim3_ransac``) on the
    window points — or, above ``max_ransac_points``, on a uniform stride
    subsample (trial voting needs only a representative sample; the model is
    4-point anyway). The FINAL fit streams over every window point: the
    winning model's inlier set is evaluated chunk-by-chunk and Umeyama
    sufficient statistics accumulate into ``umeyama_sim3_from_moments`` —
    identical math to the in-core refit, O(chunk) device residency."""
    dtype = np.dtype(dtype)
    idx = np.flatnonzero(np.asarray(window_mask, bool))
    n_win = idx.size
    if n_win < cfg.min_samples:
        eye = jnp.eye(3, dtype=jnp.dtype(dtype.name))
        return StreamingSim3Result(
            sim3=Sim3(
                R=eye,
                t=jnp.zeros(3, eye.dtype),
                scale=jnp.ones((), eye.dtype),
                ok=jnp.asarray(False),
            ),
            num_inliers=0,
            num_window=n_win,
            subsampled=False,
        )

    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    platform = resolve_platform(platform)
    if cfg.unroll_tail is None:
        # Out-of-core fusion is throughput-bound and its cold start is
        # compile-dominated: keep the RANSAC tail's fori form (the unrolled
        # sweeps trade tens of seconds of one-time compile for ~0.4 ms of
        # once-per-fusion launch latency — the wrong trade here).
        import dataclasses

        cfg = dataclasses.replace(cfg, unroll_tail=False)
    subsampled = n_win > max_ransac_points
    sub = idx[:: -(-n_win // max_ransac_points)] if subsampled else idx
    # device_put (no eager convert): staging must not compile per-op.
    src_s = jax.device_put(np.asarray(np.asarray(src)[sub], dtype))
    dst_s = jax.device_put(np.asarray(np.asarray(dst)[sub], dtype))
    res = _ransac_kernel(cfg, dtype.name, platform)(key, src_s, dst_s)
    if not subsampled:
        # Everything fit in-core: the in-core result IS the exact answer.
        return StreamingSim3Result(
            sim3=res.sim3,
            num_inliers=int(res.num_inliers),
            num_window=n_win,
            subsampled=False,
        )

    # Streaming refit on ALL window points: winner-model inliers per chunk,
    # two-pass moment accumulation (centroids, then centered H / var). All
    # device work runs through THREE cached jitted kernels — staging via
    # device_put and host NumPy glue only, so the eager path compiles
    # nothing per-op (tunneled-TPU per-op compiles were the r04 cold-start).
    win_sim3 = res.sim3
    R = jax.device_put(np.asarray(np.asarray(win_sim3.R), dtype))
    t = jax.device_put(np.asarray(np.asarray(win_sim3.t), dtype))
    s = jax.device_put(np.asarray(np.asarray(win_sim3.scale), dtype))
    thr2 = jax.device_put(dtype.type(cfg.residual_threshold**2))
    pass1_k, pass2_k = _moment_chunk_kernel(dtype.name)

    src_np = np.asarray(src)
    dst_np = np.asarray(dst)
    chunks = []
    # Pipelined (utils.streaming); the scalar/3-vector moment accumulators
    # stay device-side so the per-chunk reductions never block the stream.
    acc = {
        "w": jax.device_put(np.zeros((), dtype)),
        "s": jax.device_put(np.zeros(3, dtype)),
        "d": jax.device_put(np.zeros(3, dtype)),
    }

    def _m1_stage(ci):
        return (
            jax.device_put(np.asarray(src_np[ci], dtype)),
            jax.device_put(np.asarray(dst_np[ci], dtype)),
        )

    def _m1_launch(ci, staged):
        sc, dc = staged
        w, acc["w"], acc["s"], acc["d"] = pass1_k(
            sc, dc, R, t, s, thr2, acc["w"], acc["s"], acc["d"]
        )
        return w

    streaming.stream_chunks(
        (idx[a : a + chunk_size] for a in range(0, n_win, chunk_size)),
        _m1_stage,
        _m1_launch,
        lambda ci, w: chunks.append((ci, np.asarray(w))),
    )
    wsum, ssum, dsum = acc["w"], acc["s"], acc["d"]
    n_inl = int(np.asarray(wsum))
    if n_inl < cfg.min_inliers_needed:
        return StreamingSim3Result(
            sim3=Sim3(R=R, t=t, scale=s, ok=jnp.asarray(False)),
            num_inliers=n_inl,
            num_window=n_win,
            subsampled=True,
        )
    acc2 = {
        "H": jax.device_put(np.zeros((3, 3), dtype)),
        "v": jax.device_put(np.zeros((), dtype)),
    }

    def _m2_stage(cw):
        ci, w = cw
        return (
            jax.device_put(np.asarray(src_np[ci], dtype)),
            jax.device_put(np.asarray(dst_np[ci], dtype)),
            jax.device_put(w),
        )

    def _m2_launch(cw, staged):
        sc, dc, wd = staged
        acc2["H"], acc2["v"] = pass2_k(
            sc, dc, wd, wsum, ssum, dsum, acc2["H"], acc2["v"]
        )

    streaming.stream_chunks(chunks, _m2_stage, _m2_launch, None)
    refit = _refit_kernel(dtype.name)(wsum, ssum, dsum, acc2["H"], acc2["v"])
    ok = jnp.asarray(bool(refit.ok) and n_inl >= cfg.min_inliers_needed)
    return StreamingSim3Result(
        sim3=Sim3(R=refit.R, t=refit.t, scale=refit.scale, ok=ok),
        num_inliers=n_inl,
        num_window=n_win,
        subsampled=True,
    )
