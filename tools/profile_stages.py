#!/usr/bin/env python
"""Per-stage device-time breakdown of the all-KITTI-scale fusion workload.

Times each pipeline stage (alignment, Sim3 window, RANSAC, transform,
EKF+RTS) as its own K-chained jitted program on the bench_scale batch, so
the ~35 ms tunnel RTT amortises away and the numbers are honest device
times. Guides the <50 ms north-star push (VERDICT r1 #2/#3).
"""

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
    from gps_optimize_slam_tpu.ops import alignment, kalman_parallel, ransac, se3
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
    sq = jnp.asarray(b.slam_quat, dtype)
    gt_ = jnp.asarray(b.gps_times, dtype)
    gp_ = jnp.asarray(b.gps_pos, dtype)
    gv = jnp.asarray(b.gps_valid)
    sm = jnp.asarray(b.slam_mask)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(len(slams)))

    B = st.shape[0]
    K = 20

    def timeit(name, fn, *args):
        """Differential K-chained device time of jitted fn over the batch:
        (T(2K) − T(K)) / K cancels the dispatch fixed cost (~30 ms tunnel
        RTT) exactly — same estimator as bench._chained_device_ms."""

        def make(n_iters):
            @jax.jit
            def chained(*a):
                def body(i, acc):
                    out = fn(*a, i)
                    leaves = [x for x in jax.tree.leaves(out) if jnp.issubdtype(x.dtype, jnp.floating)]
                    return acc + sum(jnp.sum(x).astype(jnp.float32) for x in leaves)

                return jax.lax.fori_loop(0, n_iters, body, jnp.zeros((), jnp.float32))

            return chained

        f1, f2 = make(K), make(2 * K)
        np.asarray(f1(*args))  # compile + warm
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
        print(json.dumps({"stage": name, "ms": round(ms, 3)}))
        return ms

    # Stage 1: temporal alignment (+ slam mask application)
    def stage_align(st, gt_, gp_, gv, sm, i):
        a = alignment.align_gps_to_slam(
            st, gt_ + 0.0 * i, gp_, gps_valid=gv, cfg=cfg.time_alignment
        )
        valid = a.valid & sm
        return jnp.nan_to_num(a.aligned, nan=0.0), valid

    v_align = jax.vmap(stage_align, in_axes=(0, 0, 0, 0, 0, None))
    t_align = timeit("alignment", v_align, st, gt_, gp_, gv, sm)

    # Precompute alignment output for downstream stages.
    aligned, avalid = jax.jit(jax.vmap(lambda *a: stage_align(*a, 0)))(st, gt_, gp_, gv, sm)
    aligned = jax.block_until_ready(aligned)

    # Stage 2: sim3 window mask
    def stage_window(st, avalid, i):
        return alignment.sim3_window_mask(
            st,
            avalid & (i >= 0),
            gap_threshold=cfg.time_alignment.max_gps_gap_threshold,
            max_duration=cfg.sim3_ransac.max_initial_duration,
            min_samples=cfg.sim3_ransac.min_samples,
        )

    t_window = timeit(
        "sim3_window", jax.vmap(stage_window, in_axes=(0, 0, None)), st, avalid
    )
    window = jax.jit(jax.vmap(lambda *a: stage_window(*a, 0)))(st, avalid)

    # Stage 3: Sim3 RANSAC
    def stage_ransac(k, sp, aligned, window, i):
        return ransac.sim3_ransac(
            jax.random.fold_in(k, i), sp, aligned, valid=window, cfg=cfg.sim3_ransac
        )

    t_ransac = timeit(
        "sim3_ransac",
        jax.vmap(stage_ransac, in_axes=(0, 0, 0, 0, None)),
        keys,
        sp,
        aligned,
        window,
    )
    s3 = jax.jit(jax.vmap(lambda *a: stage_ransac(*a, 0)))(keys, sp, aligned, window)

    # Stage 4: trajectory transform
    def stage_transform(sp, sq, R, t, s, i):
        return se3.transform_trajectory(sp, sq, R, t, s * (1.0 + 0.0 * i))

    t_tf = timeit(
        "transform",
        jax.vmap(stage_transform, in_axes=(0, 0, 0, 0, 0, None)),
        sp,
        sq,
        s3.sim3.R,
        s3.sim3.t,
        s3.sim3.scale,
    )
    sim3_pos, sim3_quat = jax.jit(jax.vmap(lambda *a: stage_transform(*a, 0)))(
        sp, sq, s3.sim3.R, s3.sim3.t, s3.sim3.scale
    )

    # Stage 5: EKF + RTS (parallel associative path)
    def stage_kalman(st, sp, sq, s3p, s3q, ag, av, i):
        return kalman_parallel.fuse_ekf_rts_parallel(
            st,
            sp,
            sq,
            s3p,
            s3q,
            ag + 0.0 * i,
            av,
            cfg.ekf,
            cfg.rts_decision,
            rts_mode=cfg.rts_mode,
        )

    t_k = timeit(
        "ekf_rts_parallel",
        jax.vmap(stage_kalman, in_axes=(0,) * 7 + (None,)),
        st,
        sp,
        sq,
        sim3_pos,
        sim3_quat,
        aligned,
        avalid,
    )

    total = t_align + t_window + t_ransac + t_tf + t_k
    print(
        json.dumps(
            {
                "stage": "TOTAL(stages)",
                "ms": round(total, 3),
                "batch": int(B),
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
