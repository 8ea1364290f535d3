#!/usr/bin/env python
"""Multi-host (multi-process) fusion demo.

Role 1 — launcher (no args): spawns two worker processes on this machine,
each with 2 virtual CPU devices, joined into one 4-device global mesh via
`jax.distributed` + gloo collectives. On a real TPU pod you would instead
run this script once per host (role 2) with the pod's coordinator address
and platform left as TPU.

Role 2 — worker: `python examples/distributed_launch.py <coord> <nproc> <pid>`

    python examples/distributed_launch.py
"""

import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def worker(coord: str, nproc: int, pid: int) -> None:
    from gps_optimize_slam_tpu.parallel import batch as pbatch
    from gps_optimize_slam_tpu.parallel import distributed as dist

    # On a TPU pod: dist.initialize(coord, nproc, pid) — no platform forcing.
    dist.initialize(coord, nproc, pid, local_devices_per_process=2, platform="cpu")
    import jax

    from examples.batch_mesh_fusion import synthetic_sequence

    slams, gts, gps_list = [], [], []
    for i in range(6):
        s, gt, gp = synthetic_sequence(120 + 8 * i, seed=i)
        slams.append(s)
        gts.append(gt)
        gps_list.append(gp)
    b = pbatch.pad_batch(slams, gts, gps_list)
    keys = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(len(slams))])

    out, n_real = dist.fuse_batch_distributed(b, keys)
    gathered = dist.gather_outputs(out, n_real=n_real)
    if pid == 0:
        print(
            f"global mesh: {jax.device_count()} devices / {jax.process_count()} "
            f"processes; fused {n_real} sequences, "
            f"scales={np.round(np.asarray(gathered.sim3.scale), 4)}"
        )


def main() -> None:
    if len(sys.argv) == 4:
        worker(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
        return
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__), coord, "2", str(p)], env=env)
        for p in range(2)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0, 0], rcs


if __name__ == "__main__":
    main()
