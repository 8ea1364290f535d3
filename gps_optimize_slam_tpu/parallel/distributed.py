"""Multi-host (multi-process) scale-out for batched fusion.

The reference is a single process with no distributed story (SURVEY §2.4,
"Distributed comm backend: none" — EKFGPSSLAM.py is one Python loop). The
TPU-native equivalent promised there: `jax.distributed` + a process-spanning
`jax.sharding.Mesh`, with XLA inserting ICI/DCN collectives where needed.
This module is that path:

* ``initialize`` — one-call `jax.distributed.initialize` wrapper that also
  enables cross-process CPU collectives (gloo) so the SAME code is testable
  with multiple local processes (no TPU pod required — the standard JAX
  pattern for validating multi-host logic).
* ``global_mesh`` — 1-D mesh over ALL processes' devices on the "seq"
  (data-parallel) axis.
* ``fuse_batch_distributed`` — every process contributes its local shard of
  the sequence batch; inputs become global sharded arrays via
  ``jax.make_array_from_process_local_data`` and run through the exact same
  jitted vmapped fusion program as the single-process path
  (`parallel.mesh._fused_fn`), so multi-host is a *placement* change, not a
  different program. The per-sequence scans never cross devices; only the
  final gather communicates.
* ``gather_outputs`` — all-gather the sharded outputs back to every host
  (`jax.experimental.multihost_utils.process_allgather`).

Process topology: the batch axis is padded to the global device count and
split contiguously — process p owns rows [p·B/P, (p+1)·B/P) — matching the
row-major device order of the mesh.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gps_optimize_slam_tpu.config import FusionConfig
from gps_optimize_slam_tpu.parallel.batch import SequenceBatch
from gps_optimize_slam_tpu.parallel.mesh import SEQ_AXIS, _fused_fn, _round_up


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_devices_per_process: Optional[int] = None,
    platform: Optional[str] = None,
    timeout_s: int = 120,
) -> None:
    """Join the process group. Call once per process, before any computation.

    On CPU (testing / no pod) this enables gloo collectives so processes see
    a global device set; ``local_devices_per_process`` forces that many
    virtual host devices (must be set before JAX creates its backends). On
    TPU pods none of that is needed — each host's chips register themselves.
    """
    import os

    if local_devices_per_process is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={local_devices_per_process}"
            ).strip()
    if platform is not None:
        # The config API wins over the JAX_PLATFORMS env var (some images pin
        # the platform via sitecustomize) — force it through both.
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
    if (platform or "").startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=timeout_s,
    )


def global_mesh() -> Mesh:
    """1-D data-parallel mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), axis_names=(SEQ_AXIS,))


def _local_rows(b_pad: int) -> tuple[int, int]:
    """Contiguous row span [lo, hi) owned by this process."""
    nproc = jax.process_count()
    per = b_pad // nproc
    lo = jax.process_index() * per
    return lo, lo + per


def fuse_batch_distributed(
    batch: SequenceBatch,
    keys,
    config: FusionConfig = FusionConfig(),
    mesh: Optional[Mesh] = None,
    dtype=None,
    time_offsets=None,
):
    """Fuse a batch across ALL processes' devices.

    Every process passes the SAME full host-side ``batch`` (deterministic
    replication — the cheap, simple contract for trajectory-scale data; the
    arrays are MBs, not TBs). Each process materialises only its own row
    shard on device. Returns the globally-sharded FusionOutputs; use
    ``gather_outputs`` to replicate results to every host.
    """
    import jax.numpy as jnp

    mesh = mesh or global_mesh()
    n_dev = mesh.devices.size
    dtype = dtype or jnp.result_type(np.asarray(batch.slam_pos).dtype, jnp.float32)

    if time_offsets is None:
        time_offsets = np.zeros(np.asarray(batch.slam_times).shape[0])
    host_args = (
        np.asarray(batch.slam_times, dtype),
        np.asarray(batch.slam_pos, dtype),
        np.asarray(batch.slam_quat, dtype),
        np.asarray(batch.gps_times, dtype),
        np.asarray(batch.gps_pos, dtype),
        np.asarray(batch.gps_valid),
        np.asarray(keys),
        np.asarray(batch.slam_mask),
        np.asarray(time_offsets, dtype),
    )
    b = host_args[0].shape[0]
    b_pad = _round_up(b, n_dev)
    if b_pad != b:
        reps = np.concatenate([np.arange(b), np.zeros(b_pad - b, np.intp)])
        host_args = tuple(a[reps] for a in host_args)

    shard = NamedSharding(mesh, P(SEQ_AXIS))
    lo, hi = _local_rows(b_pad)
    args = tuple(
        jax.make_array_from_process_local_data(
            shard, a[lo:hi], global_shape=(b_pad,) + a.shape[1:]
        )
        for a in host_args
    )
    out = _fused_fn(config, mesh, len(args))(*args)
    # NOTE: padding rows are NOT sliced off here — slicing a global array
    # re-shards; callers slice after gather_outputs (which returns NumPy).
    return out, b


def gather_outputs(outputs, n_real: Optional[int] = None):
    """Replicate sharded outputs to every host as NumPy (drops padding)."""
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(outputs, tiled=True)
    if n_real is not None:
        gathered = jax.tree.map(lambda x: x[:n_real], gathered)
    return gathered
