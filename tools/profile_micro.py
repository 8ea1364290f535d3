#!/usr/bin/env python
"""Micro-profile of alignment + RANSAC sub-components at all-KITTI scale.

Each candidate hot spot is timed as a K-chained jitted program on the
bench_scale batch shapes, isolating where the 22 ms (alignment) and 23 ms
(RANSAC) stage times go. Guides the <50 ms north-star work."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _enable_compile_cache  # noqa: E402
from bench_scale import KITTI_LENGTHS, synth_sequence  # noqa: E402


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from gps_optimize_slam_tpu.config import FusionConfig
    from gps_optimize_slam_tpu.ops import alignment, ransac
    from gps_optimize_slam_tpu.ops.umeyama import umeyama_sim3, sim3_residuals
    from gps_optimize_slam_tpu.ops.linalg3 import svd3x3
    from gps_optimize_slam_tpu.parallel import batch as pbatch

    cfg = FusionConfig()
    dtype = jnp.float32

    slams, gts, gps_list, valids = [], [], [], []
    for i, n in enumerate(KITTI_LENGTHS):
        s, gt, gp, v = synth_sequence(n, i)
        slams.append(s)
        gts.append(gt)
        gps_list.append(gp)
        valids.append(v)
    b = pbatch.pad_batch(slams, gts, gps_list, valids, pad_multiple=128)

    st = jnp.asarray(b.slam_times, dtype)
    sp = jnp.asarray(b.slam_pos, dtype)
    gt_ = jnp.asarray(b.gps_times, dtype)
    gp_ = jnp.asarray(b.gps_pos, dtype)
    gv = jnp.asarray(b.gps_valid)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(len(slams)))
    B, M = gt_.shape
    N = st.shape[1]
    K = 20

    def timeit(name, fn, *args):
        # Differential chained timing: (T(2K) - T(K)) / K cancels the
        # dispatch fixed cost (same estimator as bench._chained_device_ms).
        def make(n_iters):
            @jax.jit
            def chained(*a):
                def body(i, acc):
                    out = fn(*a, i)
                    leaves = [
                        x
                        for x in jax.tree.leaves(out)
                        if jnp.issubdtype(x.dtype, jnp.floating)
                    ]
                    return acc + sum(jnp.sum(x).astype(jnp.float32) for x in leaves)

                return jax.lax.fori_loop(0, n_iters, body, jnp.zeros((), jnp.float32))

            return chained

        f1, f2 = make(K), make(2 * K)
        np.asarray(f1(*args))
        np.asarray(f2(*args))
        t1s, t2s = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f1(*args))
            t1s.append((time.perf_counter() - t0) * 1e3)
            t0 = time.perf_counter()
            np.asarray(f2(*args))
            t2s.append((time.perf_counter() - t0) * 1e3)
        ms = (float(np.median(t2s)) - float(np.median(t1s))) / K
        print(json.dumps({"part": name, "ms": round(ms, 3)}))
        return ms

    # ---- alignment sub-parts ----
    def part_compact(gt_, gp_, gv, i):
        return alignment._compact_sort(gt_ + 0.0 * i, gp_, gv)

    timeit("align/compact_sort", jax.vmap(part_compact, in_axes=(0, 0, 0, None)), gt_, gp_, gv)

    t_c, p_c, n_eff = jax.jit(jax.vmap(lambda *a: alignment._compact_sort(*a)))(gt_, gp_, gv)

    def part_seg(t_c, n_eff, i):
        return alignment._segment_structure(t_c + 0.0 * i, n_eff, cfg.time_alignment.max_gps_gap_threshold)

    timeit("align/segment_structure", jax.vmap(part_seg, in_axes=(0, 0, None)), t_c, n_eff)

    seg = jax.jit(
        jax.vmap(lambda t, n: alignment._segment_structure(t, n, cfg.time_alignment.max_gps_gap_threshold))
    )(t_c, n_eff)

    v_moments = jax.vmap(
        lambda t, p, s0, s1, s2, s3, s4, s5, i: alignment._notaknot_moments_tridiag(
            t + 0.0 * i, p, s0, s1, s2, s3, s4, s5
        ),
        in_axes=(0,) * 8 + (None,),
    )
    timeit(
        "align/moments_tridiag",
        v_moments,
        t_c,
        p_c,
        seg[0],
        seg[1],
        seg[2],
        seg[3],
        seg[6],
        seg[7],
    )

    def part_eval(st, t_c, p_c, i):
        # searchsorted + gather + cubic evaluation
        moments = jnp.zeros_like(p_c)
        j = jnp.searchsorted(t_c, st + 0.0 * i, side="right") - 1
        j = jnp.clip(j, 0, t_c.shape[0] - 1)
        y0 = p_c[j]
        m0 = moments[j]
        return y0 + m0

    timeit("align/searchsorted_eval", jax.vmap(part_eval, in_axes=(0, 0, 0, None)), st, t_c, p_c)

    # ---- full alignment for reference ----
    def part_align(st, gt_, gp_, gv, i):
        return alignment.align_gps_to_slam(st, gt_ + 0.0 * i, gp_, gps_valid=gv, cfg=cfg.time_alignment)

    timeit("align/FULL", jax.vmap(part_align, in_axes=(0, 0, 0, 0, None)), st, gt_, gp_, gv)

    # ---- RANSAC sub-parts ----
    aligned = jax.jit(jax.vmap(lambda *a: alignment.align_gps_to_slam(*a, cfg=cfg.time_alignment)))(
        st, gt_, gp_, gv
    )
    dst = jnp.nan_to_num(aligned.aligned, nan=0.0)
    window = jax.jit(
        jax.vmap(
            lambda t, v: alignment.sim3_window_mask(
                t,
                v,
                gap_threshold=cfg.time_alignment.max_gps_gap_threshold,
                max_duration=cfg.sim3_ransac.max_initial_duration,
                min_samples=cfg.sim3_ransac.min_samples,
            )
        )
    )(st, aligned.valid)
    rcfg = cfg.sim3_ransac

    def trials_fit_only(key, src, dstv, valid, i):
        n = src.shape[0]
        n_valid = jnp.sum(valid)
        order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)

        def trial(k):
            r = jax.random.randint(k, (rcfg.min_samples,), 0, jnp.maximum(n_valid, 1))
            idx = order[r]
            fit = umeyama_sim3(src[idx], dstv[idx])
            return fit.scale + jnp.sum(fit.R) + jnp.sum(fit.t)

        ks = jax.random.split(jax.random.fold_in(key, i), rcfg.max_trials)
        return jax.vmap(trial)(ks)

    timeit(
        "ransac/1000trial_fits(svd)",
        jax.vmap(trials_fit_only, in_axes=(0, 0, 0, 0, None)),
        keys,
        sp,
        dst,
        window,
    )

    def trials_resid_only(key, src, dstv, valid, i):
        # fixed plausible fit, count inliers for 1000 perturbed thresholds
        from gps_optimize_slam_tpu.ops.umeyama import Sim3

        R = jnp.eye(3, dtype=src.dtype)
        t = jnp.zeros((3,), src.dtype)

        def trial(k):
            s = 1.0 + 1e-6 * jax.random.uniform(k)
            pred = s * (src @ R.T) + t
            res2 = jnp.sum((pred - dstv) ** 2, axis=-1)
            inl = (res2 < rcfg.residual_threshold**2) & valid
            return jnp.sum(inl)

        ks = jax.random.split(jax.random.fold_in(key, i), rcfg.max_trials)
        return jax.vmap(trial)(ks)

    timeit(
        "ransac/1000resid_passes",
        jax.vmap(trials_resid_only, in_axes=(0, 0, 0, 0, None)),
        keys,
        sp,
        dst,
        window,
    )

    def part_svd(H, i):
        return svd3x3(H + 0.0 * i)

    Hb = jax.random.normal(jax.random.PRNGKey(0), (11 * 1000, 3, 3), dtype)
    timeit("ransac/svd3x3_11k", part_svd, Hb)

    def full_ransac(key, src, dstv, valid, i):
        return ransac.sim3_ransac(jax.random.fold_in(key, i), src, dstv, valid=valid, cfg=rcfg)

    timeit(
        "ransac/FULL",
        jax.vmap(full_ransac, in_axes=(0, 0, 0, 0, None)),
        keys,
        sp,
        dst,
        window,
    )


if __name__ == "__main__":
    main()
