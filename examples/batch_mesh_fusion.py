#!/usr/bin/env python
"""Batched multi-sequence fusion sharded over all available devices.

Pads a list of sequences to common static shapes, builds a 1-D device
mesh over the batch ("seq") axis, and fuses everything in one sharded
device program — the framework's data-parallel scale-out path (SURVEY
§2.4). Works on any device count, including a single chip or a virtual
CPU mesh (run with XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu for a multi-device dry run without TPUs).

Length bucketing caps padding waste when sequence lengths are mixed;
`estimate_offsets=True` recovers per-sequence GPS clock offsets on device.

    python examples/batch_mesh_fusion.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthetic_sequence(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) * 0.1
    yaw = np.cumsum(rng.normal(0.02, 0.02, n))
    heading = np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n)], -1)
    pos = np.cumsum(0.5 * heading, axis=0)
    quat = np.stack([np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1)
    m = int(n * 1.05)
    gt = np.linspace(t[0], t[-1], m)
    gp = np.stack([np.interp(gt, t, pos[:, k]) for k in range(3)], -1)
    gp = gp * 1.02 + rng.normal(size=(m, 3)) * 0.05  # monocular scale + noise
    return {"timestamps": t, "positions": pos, "quaternions": quat}, gt, gp


def main():
    import jax

    from gps_optimize_slam_tpu.parallel import batch as pbatch
    from gps_optimize_slam_tpu.parallel import mesh as pmesh

    lengths = [240, 260, 250, 900, 870]  # mixed: bucketing pays off
    slams, gts, gps_list = [], [], []
    for i, n in enumerate(lengths):
        s, gt, gp = synthetic_sequence(n, seed=i)
        slams.append(s)
        gts.append(gt)
        gps_list.append(gp)

    mesh = pmesh.make_mesh()
    print(f"devices: {mesh.devices.size} ({next(iter(mesh.devices.flat)).platform})")

    keys = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(len(lengths))])
    buckets = pbatch.bucket_by_length(slams, gts, gps_list, max_waste=2.0)
    print(f"buckets: {[list(idx) for idx, _ in buckets]}")

    per_seq = pmesh.fuse_buckets(buckets, keys, mesh=mesh, estimate_offsets=True)
    for i, out in enumerate(per_seq):
        print(
            f"seq {i}: poses={out.corrected_pos.shape[0]} "
            f"scale={float(out.sim3.scale):.4f} ok={bool(out.ok)}"
        )


if __name__ == "__main__":
    main()
