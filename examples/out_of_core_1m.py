#!/usr/bin/env python
"""Out-of-core fusion of a trajectory larger than device memory — from RAW
(unaligned) GNSS.

The FULL pipeline runs chunked (models.fusion_chunked): gap-aware cubic
temporal alignment over chunk+halo GPS windows, host Sim3 window selection,
streaming RANSAC/Umeyama, and the re-entrant associative EKF+RTS
(ops.kalman_chunked) — device residency is O(chunk_size) regardless of
trajectory length; host arrays may be memmaps.

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

    from gps_optimize_slam_tpu.config import FusionConfig
    from gps_optimize_slam_tpu.models import fusion_chunked

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

    # RAW GNSS: its own clock (0.9 Hz, jittered — NOT the SLAM timestamps),
    # metric scale vs the 0.97-scaled "monocular" SLAM, noise, invalid
    # fixes, and a long outage. Nothing is pre-aligned.
    m = int(n * 0.09)
    gt = np.sort(rng.uniform(t[0], t[-1], m)).astype(dtype)
    gp = np.stack([np.interp(gt, t, pos[:, k]) for k in range(3)], -1)
    gp = (gp + rng.normal(size=(m, 3)) * 0.05).astype(dtype)
    gv = np.ones(m, bool)
    gv[rng.choice(m, m // 50, replace=False)] = False
    gv[m // 3 : m // 3 + 60] = False  # ~60 s GNSS outage
    slam_pos = (pos * 0.97).astype(dtype)  # monocular scale

    t0 = time.perf_counter()
    out = fusion_chunked.fuse_core_chunked(
        t, slam_pos, quat, gt, gp, gv,
        key=jax.random.PRNGKey(0),
        config=FusionConfig(),
        chunk_size=args.chunk,
        dtype=dtype,
    )
    dt = time.perf_counter() - t0
    assert out.ok, "Sim3 failed"
    assert np.isfinite(out.corrected_pos).all()
    scale = float(np.asarray(out.sim3.scale))
    assert abs(scale - 1.0 / 0.97) < 0.01, scale
    print(
        f"{n} poses + {m} RAW GNSS fixes through {args.chunk}-pose chunks on "
        f"{platform}: {dt:.1f}s ({n/dt:,.0f} poses/s incl. host streaming); "
        f"sim3 scale {scale:.4f}, {int(out.gps_valid.sum())} aligned samples"
    )

    # Streamed evaluation: NN + paired-ATE stats with O(chunk) device
    # residency — the full trajectory never materialises on device.
    t0 = time.perf_counter()
    ev = fusion_chunked.evaluate_chunked(
        t, slam_pos, quat, out, chunk_size=args.chunk, dtype=dtype
    )
    dt = time.perf_counter() - t0
    print(
        f"streamed evaluation in {dt:.1f}s — EKF NN rmse "
        f"{float(ev.nn_ekf.rmse):.3f} m (mean {float(ev.nn_ekf.mean):.3f}), "
        f"ATE rmse {float(ev.ate_ekf.rmse):.3f} m over {int(ev.nn_ekf.count)} pts"
    )
    # Sanity bound: ATE here is measured against the noisy interpolated GNSS
    # itself (0.9 Hz fixes, 5 cm noise), so a ~1 m RMSE is the expected
    # floor, not a regression.
    assert float(ev.ate_ekf.rmse) < 3.0, float(ev.ate_ekf.rmse)


if __name__ == "__main__":
    main()
