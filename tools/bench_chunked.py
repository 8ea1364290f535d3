#!/usr/bin/env python
"""Out-of-core scale demonstration: a 1M-pose trajectory fused through
fixed-size device chunks (ops.kalman_chunked), with an unchunked cross-check
on a 100k-pose prefix (VERDICT r1 task 8 done-criterion).

Host memory holds the full trajectory (NumPy; memmap-compatible); device
memory is O(chunk_size). Prints one JSON line."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _enable_compile_cache  # noqa: E402


def synth(n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    t = (np.arange(n) * 0.1).astype(np.float64)
    yaw = np.cumsum(rng.normal(0.002, 0.01, n))
    heading = np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n)], -1)
    pos = np.cumsum(0.3 * heading, 0).astype(dtype)
    quat = np.stack(
        [np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1
    ).astype(dtype)
    gps = (pos * 1.02 + rng.normal(size=(n, 3)) * 0.05).astype(dtype)
    valid = np.ones(n, bool)
    for s in range(50_000, n - 1000, 100_000):
        valid[s : s + 500] = False  # periodic outages
    gps = np.where(valid[:, None], gps, np.nan).astype(dtype)
    return t.astype(dtype), pos, quat, gps, valid


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from gps_optimize_slam_tpu.ops import kalman_chunked, kalman_parallel
    from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig

    platform = jax.devices()[0].platform
    dtype = np.float32 if platform != "cpu" else np.float64
    n = 1_000_000
    chunk = 131_072
    t, pos, quat, gps, valid = synth(n, dtype=dtype)

    t0 = time.perf_counter()
    out_p, out_q = kalman_chunked.fuse_ekf_rts_chunked(
        t, pos, quat, pos[0], quat[0], gps, valid,
        EKFConfig(), RTSDecisionConfig(), chunk_size=chunk, dtype=dtype,
    )
    wall_s = time.perf_counter() - t0
    assert np.isfinite(out_p).all()

    # Unchunked cross-check on a 100k prefix (fits in HBM comfortably).
    m = 100_000
    ref_p, _ = kalman_parallel.fuse_ekf_rts_parallel(
        jnp.asarray(t[:m]),
        jnp.asarray(pos[:m]),
        jnp.asarray(quat[:m]),
        jnp.asarray(pos[:m]),
        jnp.asarray(quat[:m]),
        jnp.asarray(gps[:m]),
        jnp.asarray(valid[:m]),
        EKFConfig(),
        RTSDecisionConfig(),
    )
    # The prefix of the chunked run equals the unchunked prefix run wherever
    # the RTS suffix information is identical — i.e. outside the last
    # RTS-smoothable span before index m; compare on the first 90% of the
    # overlap to stay clear of the boundary.
    k = int(m * 0.9)
    err = float(np.max(np.abs(np.asarray(ref_p)[:k] - out_p[:k])))
    tol = 2e-2 if dtype == np.float32 else 1e-8
    print(
        json.dumps(
            {
                "metric": "chunked_1M_pose_fusion",
                "value": round(wall_s, 2),
                "unit": "s",
                "poses": n,
                "chunk_size": chunk,
                "poses_per_sec": round(n / wall_s, 0),
                "overlap_check_poses": k,
                "overlap_max_err_m": err,
                "overlap_ok": err < tol,
                "platform": platform,
            }
        )
    )
    assert err < tol, f"overlap mismatch: {err}"


if __name__ == "__main__":
    main()
