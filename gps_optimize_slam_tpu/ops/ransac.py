"""Batched RANSAC estimators: Sim(3) alignment and polynomial GPS gating.

TPU-native replacements for the reference's robust-estimation loops:

* ``sim3_ransac`` — replaces compute_sim3_transform_robust
  (EKFGPSSLAM.py:389-426). The reference runs a 1000-iteration Python loop
  (one 4-point SVD + full residual pass per iteration, 130-230 ms measured,
  SURVEY §6). Here ALL trials run as one vmapped batch: compact-gather
  uniform sampling, structure-of-arrays 4-point Umeyama fits, and a fused
  squared-residual count per trial — trials return COUNTS only (the
  trials×points inlier matrix never hits HBM); the winner's mask is
  recomputed from its PRNG key after the argmax. Optional sklearn-style
  adaptive early stopping (``cfg.stop_probability``) runs 128-trial chunks
  under ``lax.while_loop`` until the ln(1−p)/ln(1−w^k) bound is met.
* ``gps_poly_ransac_mask`` — replaces filter_gps_outliers_ransac
  (EKFGPSSLAM.py:136-247): per-window per-axis degree-2 polynomial RANSAC,
  windows × axes × trials all vmapped. Returns a keep-MASK (static shape)
  instead of filtered arrays; the window inlier sets are OR-ed exactly like
  the reference's sliding-window union (Q12).

RNG note: `np.random.choice` streams cannot be reproduced with `jax.random`;
golden tests must compare converged outputs (SURVEY §7 hard-part d) —
on clean data the best-inlier refit is seed-independent.

sklearn differences (documented): sklearn's RANSACRegressor stops early at
stop_probability=0.99 and tie-breaks equal inlier counts by R² score; this
implementation always runs max_trials and keeps the first maximal count
(the reference's own Sim3 loop uses strict '>' too). Converged inlier sets
on real data are identical.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import GPSFilterConfig, Sim3RansacConfig
from gps_optimize_slam_tpu.utils.precision import highp
from gps_optimize_slam_tpu.ops.umeyama import Sim3, umeyama_sim3


def _sample_without_replacement(key: jax.Array, valid: jnp.ndarray, k: int):
    """Uniform k-subset of the valid indices via Gumbel top-k.

    Exact sampling without replacement, but with `lax.top_k` (O(n·k)-ish)
    instead of the full per-trial sort `jax.random.choice(replace=False)`
    lowers to — the difference is ~5× on the vmapped thousand-trial RANSAC.
    """
    g = jax.random.gumbel(key, valid.shape)
    scores = jnp.where(valid, g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, k)
    return idx


class Sim3RansacResult(NamedTuple):
    sim3: Sim3
    inlier_mask: jnp.ndarray  # (N,) bool — best consensus set ∩ valid
    num_inliers: jnp.ndarray  # ()
    ok: jnp.ndarray  # () bool — enough inliers found


@highp
def sim3_ransac(
    key: jax.Array,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    cfg: Sim3RansacConfig = Sim3RansacConfig(),
    platform: str = "auto",
) -> Sim3RansacResult:
    """RANSAC-robust Sim(3) fit of dst onto src over the valid mask.

    ``platform`` gates the Pallas consensus-count kernel and MUST name the
    platform this computation will COMPILE FOR when the caller traces it
    into a program targeting non-default devices (fuse_core passes its
    resolved ``config.platform``). "auto" consults the process-default
    oracle — correct only for standalone/default-device callers."""
    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    platform = resolve_platform(platform)
    n = src.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    n_valid = jnp.sum(valid)
    enough = n_valid >= cfg.min_samples

    # Valid indices compacted to the front ONCE; each trial then draws
    # min_samples uniform ints and gathers a (min_samples, 3) subset —
    # no per-trial sort/top-k (was ~60% of the RANSAC device time) and the
    # trial fit runs on the tiny subset instead of a masked full-array sum.
    # Sampling is with replacement (the reference's np.random.choice is
    # without); collisions have probability ~k²/2n and merely yield a
    # degenerate trial that loses the consensus vote — converged results
    # are unchanged (and seed-independence is tested).
    # Scatter-based compaction (same trick as alignment._compact_sort):
    # each index's destination is its rank among valid (front) / invalid
    # (back) rows — a unique permutation, so scattering iota through it
    # yields the stable partition WITHOUT the O(n log² n) argsort network
    # (TPU sorts were ~60% of this stage's time at all-KITTI scale).
    iota = jnp.arange(n, dtype=jnp.int32)
    cv = jnp.cumsum(valid.astype(jnp.int32))
    pos = jnp.where(valid, cv - 1, n_valid.astype(jnp.int32) + iota - cv)
    order = (
        jnp.zeros((n,), jnp.int32).at[pos].set(iota, unique_indices=True)
    )
    thr2 = cfg.residual_threshold**2

    def trial_fit(k, unroll_svd=False):
        r = jax.random.randint(
            k, (cfg.min_samples,), 0, jnp.maximum(n_valid, 1)
        )
        idx = order[r]
        return umeyama_sim3(src[idx], dst[idx], unroll_svd=unroll_svd)

    def trial_mask(fit):
        # Squared-distance compare (no sqrt pass over trials×points).
        pred = fit.scale * (src @ fit.R.T) + fit.t
        res2 = jnp.sum((pred - dst) ** 2, axis=-1)
        return (res2 < thr2) & valid

    def trial_count(k):
        fit = trial_fit(k)
        return jnp.where(fit.ok, jnp.sum(trial_mask(fit)), -1).astype(jnp.int32)

    # On accelerators, count consensus with the Pallas tiled kernel: the
    # vmapped jnp count streams O(trials·points) intermediates through HBM
    # (the RANSAC stage's bandwidth wall at all-KITTI scale); the kernel
    # accumulates counts in VMEM with O(points + trials) traffic. Counts may
    # differ only for residuals within f32 rounding of the threshold; the
    # top-k exact re-rank below pins the WINNER to the exact formulation,
    # and the winner's mask/refit always uses the jnp arithmetic.
    use_pallas = platform not in ("cpu",)

    def batch_counts(ks):
        if use_pallas:
            from gps_optimize_slam_tpu.ops.pallas_kernels import ransac_counts

            fits = jax.vmap(trial_fit)(ks)
            c = ransac_counts(
                src, dst, valid, fits.R, fits.t, fits.scale, thr2=float(thr2)
            )
            return jnp.where(fits.ok, c, -1).astype(jnp.int32)
        return jax.vmap(trial_count)(ks)

    # Pallas counts can differ from the exact form by a few near-threshold
    # residuals (f32 rounding of the quadratic-form expansion), which can
    # flip the argmax between near-tie trials. Re-ranking the top-k approx
    # trials with EXACT counts (k·N elementwise work — negligible next to
    # the T·N counting pass) pins the winner to the exact formulation
    # whenever the true winner's approx count reaches the top-k; flips span
    # 1-2 counts (measured: bench ransac_flip_section, 0/100 keys), so k=16
    # covers the rounding band with a wide margin. Residual caveat (fine as
    # documented): bit-for-bit CPU-winner parity is NOT guaranteed when
    # >k trials sit within the rounding band of the maximum — an exact
    # co-winner whose approx count missed the top-k cannot be recovered.
    # lax.top_k is stable (equal counts keep ascending trial index), so
    # first-maximum ties WITHIN the re-rank set already resolve like the
    # CPU path's argmax.
    RERANK_K = 16

    def rerank_exact(counts, ks):
        """(best_count, best_key) — exact-count argmax over the top-k approx
        trials, first-maximum (smallest original trial index) on ties."""
        k = min(RERANK_K, counts.shape[0])
        _, topi = jax.lax.top_k(counts, k)
        exact = jax.vmap(trial_count)(ks[topi])
        best_exact = jnp.max(exact)
        best = jnp.min(
            jnp.where(exact == best_exact, topi, counts.shape[0])
        )
        return best_exact, ks[best]

    # Trials return COUNTS only — the (trials × points) inlier matrix never
    # materialises in HBM; the winner's mask is recomputed from its key.
    keys = jax.random.split(key, cfg.max_trials)
    if cfg.stop_probability is None:
        counts = batch_counts(keys)
        if use_pallas:
            best_count, best_key = rerank_exact(counts, keys)
        else:
            best = jnp.argmax(counts)  # first maximum, like the reference's '>'
            best_key = keys[best]
            best_count = counts[best]
    else:
        # Adaptive early stopping (sklearn-style, config-gated): run
        # fixed-size trial chunks under lax.while_loop until the
        # ln(1−p)/ln(1−w^k) trial bound is met. First-maximum semantics are
        # preserved across chunks (strict '>' against the running best).
        import math

        C = min(cfg.adaptive_chunk, cfg.max_trials)
        n_chunks = -(-cfg.max_trials // C)
        keys = jax.random.split(key, n_chunks * C).reshape(n_chunks, C, *key.shape)
        log1mp = math.log1p(-min(cfg.stop_probability, 1.0 - 1e-12))

        def cond(state):
            i, best_count, _ = state
            w = jnp.clip(
                best_count.astype(src.dtype) / jnp.maximum(n_valid, 1), 0.0, 1.0
            )
            # Clip strictly inside (0, 1): fail→1 (w→0) must yield a HUGE
            # trial bound, not log(1)=0 — and the upper clip must survive
            # the working dtype's rounding (1−1e-9 == 1.0 in float32).
            eps1 = 16.0 * float(jnp.finfo(src.dtype).eps)
            fail = jnp.clip(1.0 - w**cfg.min_samples, 1e-12, 1.0 - eps1)
            n_needed = jnp.where(
                w >= 1.0, jnp.zeros((), src.dtype), log1mp / jnp.log(fail)
            )
            return (i < n_chunks) & ((i * C) < n_needed)

        def body(state):
            i, best_count, best_key = state
            counts = batch_counts(keys[i])
            if use_pallas:
                cb, kb = rerank_exact(counts, keys[i])
            else:
                b = jnp.argmax(counts)
                cb, kb = counts[b], keys[i][b]
            better = cb > best_count  # strict: earlier chunk wins ties
            return (
                i + 1,
                jnp.where(better, cb, best_count),
                jnp.where(better, kb, best_key),
            )

        _, best_count, best_key = jax.lax.while_loop(
            cond,
            body,
            (jnp.zeros((), jnp.int32), jnp.asarray(-1, jnp.int32), keys[0][0]),
        )
    # Tail = the step's critical path (round-5 stage split: ~0.47 ms of the
    # 0.99 ms fused step): two SEQUENTIAL scalar SVD chains. Unrolled sweep
    # loops collapse each chain's 12 launches into one fused kernel (same
    # op order, few-ulp reassociation — see linalg3.svd3x3_soa). The unroll
    # trades COMPILE time for launch latency, so it is off on CPU (LLVM
    # chokes: the vmapped bucketing program went 90 s → >7 min) and
    # batched/vmapped orchestrators force it off via cfg.unroll_tail (the
    # tail amortizes across the batch there anyway).
    unroll_tail = (
        cfg.unroll_tail
        if cfg.unroll_tail is not None
        else platform not in ("cpu",)
    )
    best_mask = trial_mask(trial_fit(best_key, unroll_svd=unroll_tail)) & enough
    max_inliers = jnp.maximum(best_count, 0)

    ok = enough & (max_inliers >= cfg.min_inliers_needed)
    refit = umeyama_sim3(
        src, dst, best_mask.astype(src.dtype), unroll_svd=unroll_tail
    )
    ok = ok & refit.ok
    return Sim3RansacResult(
        sim3=Sim3(R=refit.R, t=refit.t, scale=refit.scale, ok=ok),
        inlier_mask=best_mask,
        num_inliers=max_inliers,
        ok=ok,
    )


# ---------------------------------------------------------------------------
# Polynomial GPS outlier gating
# ---------------------------------------------------------------------------


def reference_window_starts(times, cfg: GPSFilterConfig):
    """Host-side sliding-window start times, reproducing the reference's
    while-loop exactly (EKFGPSSLAM.py:199-237): step = duration·factor,
    degenerate-step jump-to-next-distinct-time, and the final tail-window
    adjustment. Returns a NumPy array of window start times."""
    import numpy as np

    times = np.asarray(times)
    if times.size == 0:
        return np.zeros((0,))
    duration = cfg.window_duration_seconds
    step = duration * cfg.window_step_factor
    start_time = float(times[0])
    end_time = float(times[-1])
    starts = []
    cur = start_time
    while cur < end_time:
        starts.append(cur)
        cur_end = cur + duration
        if step <= 1e-6:
            nxt = times[times > cur]
            if len(nxt) == 0:
                break
            cur = float(nxt[0])
        else:
            cur += step
        if cur >= end_time and times[-1] >= cur_end:
            cur = max(start_time, times[-1] - duration + 1e-6)
    return np.asarray(starts)


def window_starts_device(
    times: jnp.ndarray,
    cfg: GPSFilterConfig,
    max_windows: int,
    valid: Optional[jnp.ndarray] = None,
):
    """Device-side exact equivalent of :func:`reference_window_starts`.

    The reference's while-loop (EKFGPSSLAM.py:199-237) re-expressed as a
    ``lax.scan`` over ``max_windows`` static steps: the same accumulation
    order (``cur += step``), the same degenerate-step jump to the next
    distinct timestamp, and the same tail-window adjustment arithmetic —
    bit-exact against the host loop at matching dtype for nondecreasing
    ``times`` (the reference's precondition; first/last element become a
    masked min/max here so padded batch rows work), so the batched/mesh
    preprocessing path needs no host loop. jit/vmap-safe (static shapes).

    ``valid``: optional (m,) mask for padded batched rows — the first/last
    time and the next-distinct search honour only valid entries.

    Returns ``(starts, count)``: (max_windows,) NaN-padded start times and
    the number emitted. If the true window count exceeds ``max_windows``
    the output is truncated (count == max_windows); size the bound from
    the data (≈ span/step + span/step tail terms) or assert on count.
    """
    times = jnp.asarray(times)
    m = times.shape[0]
    dtype = times.dtype
    if valid is None:
        valid = jnp.ones((m,), bool)
    if m == 0:
        return jnp.full((max_windows,), jnp.nan, dtype), jnp.zeros((), jnp.int32)
    big = jnp.asarray(jnp.inf, dtype)
    t0 = jnp.min(jnp.where(valid, times, big))
    end = jnp.max(jnp.where(valid, times, -big))
    duration = cfg.window_duration_seconds
    step = duration * cfg.window_step_factor
    degenerate = step <= 1e-6  # static (config) branch, like the reference

    def body(carry, _):
        cur, active = carry
        emit = active & (cur < end)
        start = jnp.where(emit, cur, jnp.nan)
        if degenerate:
            # Jump to the next distinct valid timestamp; no next ⇒ the
            # reference breaks BEFORE the tail adjustment.
            nxt = jnp.min(jnp.where(valid & (times > cur), times, big))
            alive = emit & jnp.isfinite(nxt)
        else:
            nxt = cur + step
            alive = emit
        adjust = (nxt >= end) & (end >= cur + duration)
        nxt = jnp.where(adjust, jnp.maximum(t0, end - duration + 1e-6), nxt)
        return (nxt, alive), start

    (_, _), starts = jax.lax.scan(
        body, (t0, jnp.any(valid)), None, length=max_windows
    )
    return starts, jnp.sum(jnp.isfinite(starts)).astype(jnp.int32)


def _poly_design(t: jnp.ndarray, degree: int) -> jnp.ndarray:
    return jnp.stack([t**d for d in range(degree + 1)], axis=-1)


@highp
def gps_poly_ransac_mask(
    key: jax.Array,
    times: jnp.ndarray,
    positions: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    window_starts: Optional[jnp.ndarray] = None,
    cfg: GPSFilterConfig = GPSFilterConfig(),
) -> jnp.ndarray:
    """Inlier mask from per-window per-axis polynomial RANSAC.

    ``window_starts``: (W,) window start times (from
    ``reference_window_starts``; may contain NaN for padding). When None (or
    when cfg.use_sliding_window is False) a single global window covering
    everything is used — the reference's global mode (EKFGPSSLAM.py:150-183),
    whose per-axis inlier masks are AND-ed; in sliding mode the reference
    instead ORs each window's AND-ed mask into the result (union, Q12).

    With cfg.enabled False, returns ``valid`` unchanged.
    """
    m = times.shape[0]
    if valid is None:
        valid = jnp.ones((m,), bool)
    if not cfg.enabled:
        return valid

    dtype = positions.dtype
    use_windows = cfg.use_sliding_window and window_starts is not None
    if not use_windows:
        # Global mode: one window spanning everything. The start value is a
        # placeholder — window_mask branches statically on use_windows, so no
        # time comparison (and no finite-start gate) applies to it.
        window_starts = jnp.zeros((1,), dtype)
        duration = cfg.window_duration_seconds
    else:
        window_starts = jnp.asarray(window_starts, dtype)
        duration = cfg.window_duration_seconds

    design_all = _poly_design(times, cfg.polynomial_degree)

    def axis_ransac(k, w_mask, y):
        # Counts-only trials (like sim3_ransac): the (trials × m) inlier
        # matrix never materialises; the winner's mask is recomputed from
        # its PRNG key after the argmax.
        def trial_fit(tk):
            idx = _sample_without_replacement(tk, w_mask, cfg.min_samples)
            X = _poly_design(times[idx], cfg.polynomial_degree)
            coef, _, _, _ = jnp.linalg.lstsq(X, y[idx])
            return coef

        def trial_mask(coef):
            res = jnp.abs(design_all @ coef - y)
            return (res < cfg.residual_threshold_meters) & w_mask

        def trial_count(tk):
            coef = trial_fit(tk)
            ok = jnp.all(jnp.isfinite(coef))
            return jnp.where(ok, jnp.sum(trial_mask(coef)), -1).astype(jnp.int32)

        if cfg.stop_probability is None:
            keys = jax.random.split(k, cfg.max_trials)
            counts = jax.vmap(trial_count)(keys)
            best = jnp.argmax(counts)
            best_key, best_count = keys[best], counts[best]
        else:
            # Adaptive early stopping (config-gated extension; sklearn's
            # RANSACRegressor default is stop_probability=0.99 — the
            # faithful default here stays fixed-count). Same chunked
            # while_loop pattern as sim3_ransac.
            import math

            C = min(cfg.adaptive_chunk, cfg.max_trials)
            n_chunks = -(-cfg.max_trials // C)
            ckeys = jax.random.split(k, n_chunks * C).reshape(n_chunks, C, *k.shape)
            log1mp = math.log1p(-min(cfg.stop_probability, 1.0 - 1e-12))
            n_w = jnp.sum(w_mask)

            def cond(state):
                i, best_count, _ = state
                w = jnp.clip(
                    best_count.astype(y.dtype) / jnp.maximum(n_w, 1), 0.0, 1.0
                )
                eps1 = 16.0 * float(jnp.finfo(y.dtype).eps)
                fail = jnp.clip(1.0 - w**cfg.min_samples, 1e-12, 1.0 - eps1)
                n_needed = jnp.where(
                    w >= 1.0, jnp.zeros((), y.dtype), log1mp / jnp.log(fail)
                )
                return (i < n_chunks) & ((i * C) < n_needed)

            def body(state):
                i, best_count, best_key = state
                counts = jax.vmap(trial_count)(ckeys[i])
                b = jnp.argmax(counts)
                better = counts[b] > best_count
                return (
                    i + 1,
                    jnp.where(better, counts[b], best_count),
                    jnp.where(better, ckeys[i][b], best_key),
                )

            _, best_count, best_key = jax.lax.while_loop(
                cond,
                body,
                (jnp.zeros((), jnp.int32), jnp.asarray(-1, jnp.int32), ckeys[0][0]),
            )
        inl = trial_mask(trial_fit(best_key))
        return inl & (best_count >= 0), best_count >= 0

    def window_mask(k, start):
        if use_windows:
            in_window = (times >= start) & (times < start + duration) & valid
            n_w = jnp.sum(in_window)
            # NaN window starts are padding rows — drop them.
            window_ok = (n_w >= cfg.min_samples) & jnp.isfinite(start)
        else:
            in_window = valid  # the single global window covers everything
            n_w = jnp.sum(in_window)
            window_ok = n_w >= cfg.min_samples

        ks = jax.random.split(k, 3)
        inl_axes, ok_axes = jax.vmap(
            lambda kk, yy: axis_ransac(kk, in_window, yy), in_axes=(0, 1)
        )(ks, positions)
        combined = jnp.all(inl_axes, axis=0) & jnp.all(ok_axes)
        return jnp.where(window_ok, combined, jnp.zeros((m,), bool))

    n_windows = window_starts.shape[0]
    wkeys = jax.random.split(key, n_windows)
    per_window = jax.vmap(window_mask)(wkeys, window_starts)

    if use_windows:
        mask = jnp.any(per_window, axis=0)  # union across windows (Q12)
        # Reference behaviour: if fewer points than min_samples overall, the
        # filter is skipped entirely (EKFGPSSLAM.py:144-146, 193-195).
        mask = jnp.where(jnp.sum(valid) < cfg.min_samples, valid, mask)
        return mask
    else:
        # Global mode: single window; AND across axes already applied. If the
        # fit failed (or too few points) the reference keeps everything.
        mask = per_window[0]
        fit_failed = ~jnp.any(mask)
        return jnp.where(
            (jnp.sum(valid) < cfg.min_samples) | fit_failed, valid, mask
        )
