#!/usr/bin/env python
"""Out-of-core fusion of a trajectory larger than device memory.

Streams a long host-resident (memmap-compatible) trajectory through
fixed-size device chunks (`ops.kalman_chunked`): the associative Kalman
filter/smoother re-enter across chunks via carried composite elements, so
device residency is O(chunk_size) regardless of trajectory length.

    python examples/out_of_core_1m.py [--poses 200000] [--chunk 65536]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=200_000)
    ap.add_argument("--chunk", type=int, default=65_536)
    args = ap.parse_args()

    import jax

    from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
    from gps_optimize_slam_tpu.ops import kalman_chunked

    platform = jax.devices()[0].platform
    dtype = np.float32 if platform != "cpu" else np.float64

    n = args.poses
    rng = np.random.default_rng(0)
    t = (np.arange(n) * 0.1).astype(dtype)
    yaw = np.cumsum(rng.normal(0.002, 0.01, n))
    heading = np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n)], -1)
    pos = np.cumsum(0.3 * heading, 0).astype(dtype)
    quat = np.stack(
        [np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1
    ).astype(dtype)
    gps = (pos * 1.02 + rng.normal(size=(n, 3)) * 0.05).astype(dtype)
    valid = np.ones(n, bool)
    valid[n // 3 : n // 3 + 400] = False  # a long GNSS outage
    gps = np.where(valid[:, None], gps, np.nan).astype(dtype)

    t0 = time.perf_counter()
    out_pos, out_quat = kalman_chunked.fuse_ekf_rts_chunked(
        t, pos, quat, pos[0], quat[0], gps, valid,
        EKFConfig(), RTSDecisionConfig(), chunk_size=args.chunk, dtype=dtype,
    )
    dt = time.perf_counter() - t0
    assert np.isfinite(out_pos).all()
    print(
        f"{n} poses through {args.chunk}-pose chunks on {platform}: "
        f"{dt:.1f}s ({n/dt:,.0f} poses/s incl. host streaming)"
    )


if __name__ == "__main__":
    main()
