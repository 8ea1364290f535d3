"""Multi-host (multi-process) fusion: global-mesh parity (SURVEY §2.4).

Spawns two OS processes, each with 2 virtual CPU devices, joined via
`jax.distributed` + gloo CPU collectives into one 4-device global mesh.
Each worker fuses a 5-sequence batch sharded over the global mesh, gathers
results, and asserts parity with a process-local computation
(tests/distributed_worker.py). This is the standard way to validate
multi-host logic without a TPU pod; on a pod the same code spans hosts
over ICI/DCN.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh_parity(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # Workers configure their own platform/devices; scrub inherited forcing.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    # XLA's cpu_aot_loader logs a ~4 kB machine-feature warning per cached
    # executable it loads (benign tuning pseudo-features like
    # +prefer-no-scatter; parity below proves correctness). Keep the volume
    # down — and, critically, write worker output to FILES, not PIPEs:
    # draining the pipes sequentially deadlocked worker 1 once its 64 kB
    # pipe filled with those warnings while worker 0 was being drained.
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

    logs = [tmp_path / f"worker{pid}.log" for pid in range(2)]
    handles = [open(log, "w") for log in logs]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, "2", str(pid)],
            stdout=handle,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid, handle in enumerate(handles)
    ]
    try:
        for p in procs:
            p.wait(timeout=540)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for handle in handles:
            handle.close()
    outs = [log.read_text() for log in logs]

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"PARITY_OK {pid}" in out, f"worker {pid} no parity line:\n{out[-4000:]}"
        assert f"SEQPAR_OK {pid}" in out, f"worker {pid} no seqpar line:\n{out[-4000:]}"
