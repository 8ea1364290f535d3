#!/usr/bin/env python
"""North-star scale benchmark: ~23k poses (all-KITTI-odometry scale) fused
in one batched device call (BASELINE.json: target <50 ms on one v5e chip).

KITTI 00-10 isn't shipped (only the seq-04 slice), so eleven sequences with
KITTI-like statistics (10 Hz, ~2 m/frame, gentle+sharp turns, 0.9 Hz GPS
with outages) are synthesised at the real sequence lengths. Prints one JSON
line (bench.py remains the driver-recorded headline benchmark).
"""

import json
import time

import numpy as np

# KITTI odometry sequence lengths (00-10).
KITTI_LENGTHS = [4541, 1101, 4661, 801, 271, 2761, 1101, 1101, 4071, 1591, 1201]


def synth_sequence(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) * 0.104
    yaw_rate = rng.normal(0.0, 3.0, n)
    yaw_rate[n // 3 : n // 3 + 40] += 60.0  # a sharp turn
    yaw = np.cumsum(np.deg2rad(yaw_rate) * 0.104)
    heading = np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n)], -1)
    pos = np.cumsum(1.9 * 0.104 * heading, axis=0)
    pos[:, 2] = np.cumsum(rng.normal(0, 0.01, n))
    quat = np.stack([np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1)
    slam = {"timestamps": t, "positions": pos * 0.99, "quaternions": quat}

    m = int(n * 1.03)
    gt = np.linspace(t[0], t[-1], m)
    gp = np.stack([np.interp(gt, t, pos[:, k]) for k in range(3)], -1)
    gp += rng.normal(size=(m, 3)) * 0.15
    valid = np.ones(m, bool)
    o = rng.integers(m // 4, m // 2)
    valid[o : o + 60] = False  # GNSS outage
    return slam, gt, gp, valid


def main():
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache

    _enable_compile_cache()

    from gps_optimize_slam_tpu.parallel import batch as pbatch
    from gps_optimize_slam_tpu.parallel import mesh as pmesh
    from gps_optimize_slam_tpu.config import FusionConfig

    platform = jax.devices()[0].platform
    slams, gts, gps_list, valids = [], [], [], []
    for i, n in enumerate(KITTI_LENGTHS):
        s, gt, gp, v = synth_sequence(n, i)
        slams.append(s)
        gts.append(gt)
        gps_list.append(gp)
        valids.append(v)
    total_poses = sum(KITTI_LENGTHS)

    b = pbatch.pad_batch(slams, gts, gps_list, valids, pad_multiple=128)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(len(slams)))
    cfg = FusionConfig()

    def run():
        out = pmesh.fuse_batch(b, keys, config=cfg, dtype=jnp.float32)
        jax.block_until_ready(out.corrected_pos)
        return out

    t0 = time.perf_counter()
    out = run()
    compile_s = time.perf_counter() - t0
    assert bool(jnp.all(out.ok)), "batched fusion did not converge"

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        run()
        times.append((time.perf_counter() - t0) * 1e3)
    wall_ms = float(np.median(times))

    print(
        json.dumps(
            {
                "metric": "kitti_all_sequences_scale_fusion",
                "value": round(wall_ms, 2),
                "unit": "ms",
                "vs_baseline": round((total_poses / 3000.0 * 1000.0) / wall_ms, 1),
                "platform": platform,
                "total_poses": total_poses,
                "sequences": len(KITTI_LENGTHS),
                "poses_per_sec": round(total_poses / (wall_ms / 1e3), 0),
                "north_star_ms": 50.0,
                "compile_s": round(compile_s, 1),
                "baseline_note": "vs_baseline = speedup over the reference's ~3k poses/s",
            }
        )
    )


if __name__ == "__main__":
    main()
