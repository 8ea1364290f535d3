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
from typing import NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gps_optimize_slam_tpu.config import FusionConfig
from gps_optimize_slam_tpu.models import fusion
from gps_optimize_slam_tpu.parallel.batch import SequenceBatch
from gps_optimize_slam_tpu.utils import streaming

SEQ_AXIS = "seq"


def make_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the sequence (data) axis."""
    if devices is None:
        try:
            devices = jax.devices()
        except Exception:
            # Default platform broken/absent (e.g. a dead TPU client during
            # a CPU-mesh dry run) — the CPU platform always exists.
            devices = jax.devices("cpu")
        if n_devices is not None:
            if len(devices) < n_devices:
                # Fall back to the virtual CPU platform when asked for more
                # chips than the accelerator platform exposes.
                devices = jax.devices("cpu")
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(SEQ_AXIS,))


from functools import lru_cache


def _resolved_config(config: FusionConfig, mesh: Optional[Mesh]) -> FusionConfig:
    """PLATFORM RESOLUTION BOUNDARY: every "auto" dispatch knob resolves
    HERE against the MESH's platform — the devices the fused program will
    actually compile for — never against the process default. (The process
    default can differ: the multichip dry-run builds a virtual CPU mesh
    under a TPU-default process. Keying ekf_scan on the default made the
    parallel path's CPU compile minutes-slow in round 1; keying the Pallas
    gates on it emitted non-interpret Mosaic kernels into a CPU-compiled
    program and crashed MULTICHIP_r03.) Resolution happens BEFORE
    ``_fused_fn``'s lru_cache key so two calls under different default
    platforms can never share a stale closure."""
    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    platform = resolve_platform(config.platform, mesh=mesh)
    config = config.replace(platform=platform)
    if config.ekf_scan == "auto":
        resolved = "sequential" if platform == "cpu" else "parallel"
        if (
            resolved == "parallel"
            and config.rts_decision.default_ekf_transition_steps_on_sharp_turn != 0
        ):
            resolved = "sequential"
        config = config.replace(ekf_scan=resolved)
    if config.sim3_ransac.unroll_tail is None:
        # Batched fusion vmaps fuse_core: the RANSAC tail's unrolled sweep
        # chains balloon compile time under vmap (XLA:CPU: the bucketing
        # program went 90 s → >7 min) and the tail's launch latency
        # amortizes across the batch anyway — force the fori form.
        import dataclasses

        config = config.replace(
            sim3_ransac=dataclasses.replace(config.sim3_ransac, unroll_tail=False)
        )
    return config


@lru_cache(maxsize=32)
def _fused_fn(config: FusionConfig, mesh: Optional[Mesh], n_args: int):
    """Cached jitted vmapped fusion — building a fresh jax.jit closure per
    call would miss the jit cache and recompile every invocation (measured:
    a 47 s "run" that was 10 recompiles). ``config`` must be RESOLVED
    (``_resolved_config``) so the cache key carries the platform."""

    def one(st, sp, sq, gt, gp, gv, k, sm, toff):
        return fusion.fuse_core(
            st, sp, sq, gt, gp, gv, k, config=config, slam_mask=sm, time_offset=toff
        )

    fused = jax.vmap(one)
    if mesh is None:
        return jax.jit(fused)
    shard = NamedSharding(mesh, P(SEQ_AXIS))
    return jax.jit(fused, in_shardings=(shard,) * n_args, out_shardings=shard)


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


@lru_cache(maxsize=8)
def _offsets_fn(mesh: Optional[Mesh], max_lag_seconds: float, n_grid: int):
    from gps_optimize_slam_tpu.ops import alignment

    def one(st, sp, sm, gt, gp, gv):
        return alignment.estimate_time_offset_xcorr_device(
            st,
            sp,
            gt,
            gp,
            slam_mask=sm,
            gps_valid=gv,
            max_lag_seconds=max_lag_seconds,
            n_grid=n_grid,
        )

    fn = jax.vmap(one)
    if mesh is None:
        return jax.jit(fn)
    shard = NamedSharding(mesh, P(SEQ_AXIS))
    return jax.jit(fn, in_shardings=(shard,) * 6, out_shardings=shard)


def estimate_offsets_batch(
    batch: SequenceBatch,
    mesh: Optional[Mesh] = None,
    dtype=None,
    max_lag_seconds: float = 10.0,
    n_grid: int = 4096,
) -> np.ndarray:
    """Per-sequence clock offsets, estimated ON DEVICE (vmapped FFT speed
    cross-correlation — ops.alignment.estimate_time_offset_xcorr_device),
    honouring padding masks. Returns a host (B,) array suitable for
    ``fuse_batch(..., time_offsets=...)``."""
    dtype = dtype or jnp.result_type(np.asarray(batch.slam_pos).dtype, jnp.float32)
    host_args = (
        np.asarray(batch.slam_times, dtype),
        np.asarray(batch.slam_pos, dtype),
        np.asarray(batch.slam_mask),
        np.asarray(batch.gps_times, dtype),
        np.asarray(batch.gps_pos, dtype),
        np.asarray(batch.gps_valid),
    )
    if mesh is None:
        # No mesh → the process-default backend IS the intended target
        # (single-device use); hermeticity obligations only exist when a
        # caller named a mesh (then everything below stages onto it).
        args = tuple(jnp.asarray(a) for a in host_args)
    else:
        b = host_args[0].shape[0]
        b_pad = _round_up(b, mesh.devices.size)
        if b_pad != b:
            reps = np.concatenate([np.arange(b), np.zeros(b_pad - b, np.intp)])
            host_args = tuple(a[reps] for a in host_args)
        shard = NamedSharding(mesh, P(SEQ_AXIS))
        args = tuple(jax.device_put(a, shard) for a in host_args)
    out = np.asarray(_offsets_fn(mesh, max_lag_seconds, n_grid)(*args))
    return out[: batch.slam_times.shape[0]]


class StagedBatch(NamedTuple):
    """A batch already resident on its target devices/sharding.

    Produced by ``stage_batch``; pass to ``fuse_batch`` in place of a
    ``SequenceBatch`` to skip the host→device transfer on repeated calls
    (the transfer + host marshalling dominates a warm ``fuse_batch`` —
    ~70 ms vs ~17 ms device time at all-KITTI scale over the tunnel).
    ``n_real`` is the row count before batch-axis mesh padding.
    """

    args: tuple  # the 9 fused-program inputs, device-resident
    n_real: int
    # Every row's VALID GPS timestamps were verified nondecreasing on host
    # at staging time — fuse_batch may then run the fused program with
    # config.gps_sorted=True (skips the alignment compaction argsort;
    # identical outputs, see ops.alignment._compact_sort).
    gps_sorted: bool = False


def _is_staged_on(x, sharding) -> bool:
    """True when ``x`` is a committed device array already on ``sharding``
    (or on the default device when sharding is None)."""
    if not isinstance(x, jax.Array):
        return False
    if sharding is None:
        return True
    return x.sharding.is_equivalent_to(sharding, x.ndim)


def stage_batch(
    batch: SequenceBatch,
    keys: jax.Array,
    mesh: Optional[Mesh] = None,
    dtype=None,
    time_offsets=None,
) -> StagedBatch:
    """Marshal + transfer a batch onto the target devices ONCE.

    Leaves that are already device-resident on the target sharding are
    passed through without a copy, so restaging a ``StagedBatch``'s own
    arrays is free. With a mesh, the batch axis is padded to a mesh
    multiple with copies of row 0 (sliced off outputs by ``fuse_batch``).
    """
    dtype = dtype or jnp.result_type(np.asarray(batch.slam_times).dtype, jnp.float32)
    if time_offsets is None:
        time_offsets = np.zeros(np.asarray(batch.slam_times).shape[0])
    raw = (
        (batch.slam_times, dtype),
        (batch.slam_pos, dtype),
        (batch.slam_quat, dtype),
        (batch.gps_times, dtype),
        (batch.gps_pos, dtype),
        (batch.gps_valid, None),
        (keys, None),
        (batch.slam_mask, None),
        (time_offsets, dtype),
    )
    shard = NamedSharding(mesh, P(SEQ_AXIS)) if mesh is not None else None
    b = batch.slam_times.shape[0]
    b_pad = _round_up(b, mesh.devices.size) if mesh is not None else b

    args = []
    for x, dt in raw:
        if b_pad == b and _is_staged_on(x, shard) and (
            dt is None or x.dtype == jnp.dtype(dt)
        ):
            args.append(x)
            continue
        h = np.asarray(x, dt) if dt is not None else np.asarray(x)
        if b_pad != b:
            reps = np.concatenate([np.arange(b), np.zeros(b_pad - b, np.intp)])
            h = h[reps]
        # Mesh-platform hermeticity (the round-1 MULTICHIP failure): host
        # NumPy staged straight onto the target sharding — nothing
        # dispatches on the DEFAULT backend, so a CPU mesh works even when
        # the default accelerator platform is broken or absent.
        # (mesh=None → default backend is the intended single-device target;
        # with a mesh, device_put onto the NamedSharding keeps this hermetic.)
        args.append(jax.device_put(h, shard) if shard is not None else jnp.asarray(h))
    # Host sortedness check, once per staging (same check pipeline.fuse_arrays
    # applies): nondecreasing valid GPS times let fuse_batch skip the
    # alignment compaction argsort. Only checkable with host inputs — a
    # device-resident gps_times row would cost a transfer to inspect.
    gps_sorted = False
    if not isinstance(batch.gps_times, jax.Array):
        gt = np.asarray(batch.gps_times)
        gv = np.asarray(batch.gps_valid, bool)
        gps_sorted = all(
            np.all(np.diff(row[vrow]) >= 0) for row, vrow in zip(gt, gv)
        )
    return StagedBatch(args=tuple(args), n_real=b, gps_sorted=gps_sorted)


def fuse_batch(
    batch,
    keys: Optional[jax.Array] = None,
    config: FusionConfig = FusionConfig(),
    mesh: Optional[Mesh] = None,
    dtype=None,
    time_offsets=None,
    estimate_offsets: bool = False,
):
    """Fuse a padded batch of sequences; one `vmap`ped device program.

    ``batch`` is a ``SequenceBatch`` (host arrays, staged on every call) or
    a ``StagedBatch`` from ``stage_batch`` (device-resident — repeated
    calls pay device time + dispatch only, VERDICT r2 task 7).

    ``estimate_offsets=True`` (with ``time_offsets=None``) estimates the
    per-sequence clock offsets on device first (``estimate_offsets_batch``)
    and fuses with them applied.

    With ``mesh`` given, inputs/outputs are sharded over the batch axis —
    each device fuses its shard of sequences independently. Any batch size
    works: when B is not a mesh multiple, the batch axis is padded with
    copies of the first sequence and the padding rows are sliced off the
    outputs (per-row results are independent under vmap, so duplicates
    cannot perturb real rows). ``keys`` must be raw uint32 PRNG keys
    (jax.random.PRNGKey); they are staged through NumPy like everything
    else.
    """
    if isinstance(batch, StagedBatch):
        staged = batch
    else:
        if keys is None:
            raise TypeError("fuse_batch needs `keys` with a SequenceBatch input")
        dtype = dtype or jnp.result_type(np.asarray(batch.slam_pos).dtype, jnp.float32)
        if time_offsets is None and estimate_offsets:
            time_offsets = estimate_offsets_batch(batch, mesh=mesh, dtype=dtype)
        staged = stage_batch(
            batch, keys, mesh=mesh, dtype=dtype, time_offsets=time_offsets
        )
    if staged.gps_sorted and not config.gps_sorted:
        config = config.replace(gps_sorted=True)
    out = _fused_fn(_resolved_config(config, mesh), mesh, len(staged.args))(
        *staged.args
    )
    if staged.args[0].shape[0] != staged.n_real:
        out = jax.tree.map(lambda x: x[: staged.n_real], out)
    return out


def fuse_buckets(
    buckets,
    keys,
    config: FusionConfig = FusionConfig(),
    mesh: Optional[Mesh] = None,
    dtype=None,
    estimate_offsets: bool = False,
):
    """Fuse length-bucketed sequences (``batch.bucket_by_length`` output).

    Each bucket runs as its own padded program (bounded padding waste, one
    compile per bucket shape). ``keys`` is (B_total, 2) in the ORIGINAL
    sequence order. Returns a list in original order of per-sequence
    FusionOutputs with every slam-indexed leaf sliced to the sequence's
    real length (host NumPy).

    Buckets are independent programs, so the sweep is software-pipelined
    (utils.streaming): bucket i+1's staging and bucket i-1's host
    read-back overlap bucket i's device time."""
    total = sum(len(idxs) for idxs, _ in buckets)
    results = [None] * total

    def _stage(bucket):
        idxs, b = bucket
        dt = dtype or jnp.result_type(np.asarray(b.slam_pos).dtype, jnp.float32)
        toff = (
            estimate_offsets_batch(b, mesh=mesh, dtype=dt)
            if estimate_offsets
            else None
        )
        return stage_batch(
            b, np.asarray(keys)[idxs], mesh=mesh, dtype=dt, time_offsets=toff
        )

    def _launch(bucket, staged):
        return fuse_batch(staged, config=config, mesh=mesh)

    def _drain(bucket, out):
        idxs, b = bucket
        host = jax.tree.map(np.asarray, out)
        n_max = b.slam_times.shape[1]
        for row, i in enumerate(idxs):
            n = int(b.n_slam[row])

            def slice_leaf(x, row=row, n=n):
                x_row = x[row]
                if x_row.ndim >= 1 and x_row.shape[0] == n_max:
                    return x_row[:n]
                return x_row

            results[int(i)] = jax.tree.map(slice_leaf, host)

    streaming.stream_chunks(buckets, _stage, _launch, _drain)
    return results


def _outputs_to_tree(out: fusion.FusionOutputs) -> dict:
    d = out._asdict()
    d["sim3"] = d["sim3"]._asdict()
    return d


def _outputs_from_tree(d: dict) -> fusion.FusionOutputs:
    from gps_optimize_slam_tpu.ops.umeyama import Sim3

    return fusion.FusionOutputs(**{**d, "sim3": Sim3(**d["sim3"])})


def fuse_buckets_checkpointed(
    buckets,
    keys,
    ckpt_dir: str,
    config: FusionConfig = FusionConfig(),
    mesh: Optional[Mesh] = None,
    dtype=None,
    estimate_offsets: bool = False,
):
    """``fuse_buckets`` with per-bucket checkpoint/resume (SURVEY §5;
    ROADMAP "orbax checkpointing for batched sweeps").

    Each completed bucket is persisted to ``ckpt_dir/bucket_NNNN`` as it
    drains (orbax state first, metadata.json last — the metadata file is
    the completion marker). A re-run with the same ``ckpt_dir`` restores
    finished buckets from disk and only computes the rest, so a killed
    multi-hour sweep loses at most one bucket of work. Results are
    identical to ``fuse_buckets`` (kill/resume determinism tested).

    The caller owns cache invalidation: pass a fresh ``ckpt_dir`` when the
    inputs/config change (bucket composition is sanity-checked against the
    stored sequence indices)."""
    import os

    from gps_optimize_slam_tpu.utils import checkpoint as ckpt_util

    total = sum(len(idxs) for idxs, _ in buckets)
    results = [None] * total

    def _bucket_path(j: int) -> str:
        return os.path.join(ckpt_dir, f"bucket_{j:04d}")

    pending = []
    for j, bucket in enumerate(buckets):
        idxs = np.asarray(bucket[0])
        bpath = _bucket_path(j)
        if os.path.exists(os.path.join(bpath, "metadata.json")):
            state, meta = ckpt_util.restore_checkpoint_untyped(bpath)
            stored = np.asarray(meta["indices"])
            if not np.array_equal(stored, idxs):
                raise ValueError(
                    f"checkpoint {bpath} was written for sequences "
                    f"{stored.tolist()}, bucket {j} now holds "
                    f"{idxs.tolist()} — pass a fresh ckpt_dir"
                )
            for i in idxs:
                results[int(i)] = _outputs_from_tree(state[f"seq_{int(i)}"])
        else:
            pending.append((j, bucket))

    def _stage(jb):
        _, bucket = jb
        idxs, b = bucket
        dt = dtype or jnp.result_type(np.asarray(b.slam_pos).dtype, jnp.float32)
        toff = (
            estimate_offsets_batch(b, mesh=mesh, dtype=dt)
            if estimate_offsets
            else None
        )
        return stage_batch(
            b, np.asarray(keys)[idxs], mesh=mesh, dtype=dt, time_offsets=toff
        )

    def _launch(jb, staged):
        return fuse_batch(staged, config=config, mesh=mesh)

    def _drain(jb, out):
        j, (idxs, b) = jb
        host = jax.tree.map(np.asarray, out)
        n_max = b.slam_times.shape[1]
        state = {}
        for row, i in enumerate(idxs):
            n = int(b.n_slam[row])

            def slice_leaf(x, row=row, n=n):
                x_row = x[row]
                if x_row.ndim >= 1 and x_row.shape[0] == n_max:
                    return x_row[:n]
                return x_row

            res = jax.tree.map(slice_leaf, host)
            results[int(i)] = res
            state[f"seq_{int(i)}"] = _outputs_to_tree(res)
        ckpt_util.save_checkpoint(
            _bucket_path(j),
            state,
            metadata={"bucket": j, "indices": np.asarray(idxs).tolist()},
        )

    streaming.stream_chunks(pending, _stage, _launch, _drain)
    return results


@lru_cache(maxsize=8)
def _eval_fn(skip_seconds: float, platform: str):
    return jax.jit(
        jax.vmap(
            partial(fusion._evaluate, skip_seconds=skip_seconds, platform=platform)
        )
    )


def evaluate_batch(batch: SequenceBatch, outputs, skip_seconds: float = 5.0):
    """Vmapped evaluation over the batch (masked to real poses).

    Inputs are placed on the outputs' own sharding — like ``fuse_batch``,
    nothing dispatches on the default backend when outputs live on a mesh;
    the Pallas NN gate likewise resolves against that sharding's platform
    (resolution boundary), not the process default.
    """
    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    dt = outputs.corrected_pos.dtype
    place = outputs.corrected_pos.sharding
    platform = resolve_platform(sharding=place)
    return _eval_fn(skip_seconds, platform)(
        jax.device_put(np.asarray(batch.slam_times, dt), place),
        jax.device_put(np.asarray(batch.slam_pos, dt), place),
        outputs,
    )
