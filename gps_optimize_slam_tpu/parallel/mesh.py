"""Device-mesh scale-out for batched fusion.

Multi-chip story (replacing "none" in the reference, SURVEY §2.4): the
sequence batch is data-parallel — shard the batch axis of every input over a
1-D `jax.sharding.Mesh` ("seq" axis) and jit the vmapped fusion with those
shardings; XLA partitions the whole program with zero communication in the
hot path (each sequence's scan stays on one chip) and inserts ICI/DCN
collectives only for the scalar evaluation reductions, exactly where they
belong. Works identically on N real TPU chips or a
`--xla_force_host_platform_device_count` virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gps_optimize_slam_tpu.config import FusionConfig
from gps_optimize_slam_tpu.models import fusion
from gps_optimize_slam_tpu.parallel.batch import SequenceBatch

SEQ_AXIS = "seq"


def make_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the sequence (data) axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                # Fall back to the virtual CPU platform when asked for more
                # chips than the accelerator platform exposes.
                devices = jax.devices("cpu")
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(SEQ_AXIS,))


from functools import lru_cache


@lru_cache(maxsize=32)
def _fused_fn(config: FusionConfig, mesh: Optional[Mesh], n_args: int):
    """Cached jitted vmapped fusion — building a fresh jax.jit closure per
    call would miss the jit cache and recompile every invocation (measured:
    a 47 s "run" that was 10 recompiles)."""
    # ekf_scan="auto" resolves against the DEFAULT backend inside fuse_core,
    # which is wrong when the mesh places execution elsewhere (e.g. the
    # multichip dry-run builds a virtual CPU mesh under a TPU-default
    # process — the parallel path's CPU compile is minutes-slow). Resolve
    # it here against the mesh's actual platform.
    if config.ekf_scan == "auto" and mesh is not None:
        platform = next(iter(mesh.devices.flat)).platform
        resolved = "sequential" if platform == "cpu" else "parallel"
        if (
            resolved == "parallel"
            and config.rts_decision.default_ekf_transition_steps_on_sharp_turn != 0
        ):
            resolved = "sequential"
        config = config.replace(ekf_scan=resolved)

    def one(st, sp, sq, gt, gp, gv, k, sm):
        return fusion.fuse_core(st, sp, sq, gt, gp, gv, k, config=config, slam_mask=sm)

    fused = jax.vmap(one)
    if mesh is None:
        return jax.jit(fused)
    shard = NamedSharding(mesh, P(SEQ_AXIS))
    return jax.jit(fused, in_shardings=(shard,) * n_args, out_shardings=shard)


def fuse_batch(
    batch: SequenceBatch,
    keys: jax.Array,
    config: FusionConfig = FusionConfig(),
    mesh: Optional[Mesh] = None,
    dtype=None,
):
    """Fuse a padded batch of sequences; one `vmap`ped device program.

    With ``mesh`` given, inputs/outputs are sharded over the batch axis —
    each device fuses its shard of sequences independently.
    Batch size must be divisible by the mesh size.
    """
    dtype = dtype or jnp.result_type(batch.slam_pos.dtype, jnp.float32)

    args = (
        jnp.asarray(batch.slam_times, dtype),
        jnp.asarray(batch.slam_pos, dtype),
        jnp.asarray(batch.slam_quat, dtype),
        jnp.asarray(batch.gps_times, dtype),
        jnp.asarray(batch.gps_pos, dtype),
        jnp.asarray(batch.gps_valid),
        keys,
        jnp.asarray(batch.slam_mask),
    )
    fn = _fused_fn(config, mesh, len(args))
    if mesh is not None:
        shard = NamedSharding(mesh, P(SEQ_AXIS))
        args = tuple(jax.device_put(a, shard) for a in args)
    return fn(*args)


@lru_cache(maxsize=8)
def _eval_fn(skip_seconds: float):
    return jax.jit(jax.vmap(partial(fusion.evaluate, skip_seconds=skip_seconds)))


def evaluate_batch(batch: SequenceBatch, outputs, skip_seconds: float = 5.0):
    """Vmapped evaluation over the batch (masked to real poses)."""
    return _eval_fn(skip_seconds)(
        jnp.asarray(batch.slam_times, outputs.corrected_pos.dtype),
        jnp.asarray(batch.slam_pos, outputs.corrected_pos.dtype),
        outputs,
    )
