"""Sequence parallelism: ONE trajectory's pose axis sharded over a mesh.

The batch-axis story (``parallel.mesh``) scales ACROSS sequences; this
module scales WITHIN one — the complement SURVEY §2.4 calls
"sequence-length scaling". All three recursions of the fused filter are
associative scans (``ops.kalman_parallel``), and an associative scan
decomposes exactly across devices the same way ``ops.kalman_chunked``
re-enters it across host chunks:

1. each device scans its contiguous pose block locally (log-depth),
2. the per-block TOTAL composites — one 27-component filtering element /
   one quaternion / one 12-component smoothing element per device — are
   ``all_gather``-ed over ICI (D·27 floats: trivially latency-bound),
3. a D-length scan over the block totals yields each device's exclusive
   prefix (suffix, for the reverse RTS scan), which one broadcasted
   ``combine`` folds into the local results.

Everything OUTSIDE the scans (controls, relative poses, element
construction, gating) is elementwise or slice/cumsum work that XLA's SPMD
partitioner handles from the input shardings, so the implementation is one
``shard_map`` wrapper around the scan — injected into
``fuse_ekf_rts_parallel`` via its ``scan_fn`` hook — not a parallel fork
of the filter.

Replaces: nothing in the reference (its trajectories are Python loops on
one core, EKFGPSSLAM.py:864-930); this is the TPU-native scaling axis for
trajectories that fit HBM but starve one chip's VPU, and it composes with
``ops.kalman_chunked`` (host chunks → device blocks) beyond HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.ops import kalman_parallel


def _block_scan(combine, elems, axis_name: str, reverse: bool, local_scan):
    """Cross-device associative scan body (runs INSIDE shard_map).

    ``elems``: pytree of (L,) local component arrays (L = N/D). Performs the
    local scan, exchanges block totals, and folds this block's exclusive
    prefix (suffix when ``reverse``) into the local results. Blocks at the
    global boundary keep their local results unchanged (no identity element
    needs constructing). ``local_scan`` is the per-device scan — lax by
    default; the single-kernel VMEM ladder (ops.pallas_scan) on TPU meshes,
    or the compile-cheap fori ladder on CPU meshes, when the
    caller bound an identity via :func:`sequence_parallel_scan`'s
    ``bind_identity`` (the cross-device block-total scan below stays lax:
    D elements, trivially cheap)."""
    local = local_scan(combine, elems, reverse=reverse)
    # Block total: last local composite (first, for a reverse/suffix scan).
    total = jax.tree.map(lambda x: x[0] if reverse else x[-1], local)
    gathered = jax.tree.map(
        lambda x: jax.lax.all_gather(x, axis_name), total
    )  # (D,) leaves
    block_scan = jax.lax.associative_scan(combine, gathered, reverse=reverse)
    idx = jax.lax.axis_index(axis_name)
    d = jax.lax.psum(1, axis_name)
    if reverse:
        # Exclusive suffix: the inclusive suffix of block idx+1.
        neighbor = jnp.minimum(idx + 1, d - 1)
        at_edge = idx == d - 1
    else:
        # Exclusive prefix: the inclusive prefix of block idx-1.
        neighbor = jnp.maximum(idx - 1, 0)
        at_edge = idx == 0
    ext = jax.tree.map(lambda x: x[neighbor], block_scan)
    # combine(earlier, later): for the forward scan the exclusive prefix is
    # the EARLIER operand; for the reverse (suffix) scan the convention in
    # kalman_parallel passes the larger-k composite as `earlier`, so the
    # exclusive suffix is again the first operand. Scalar components
    # broadcast against the (L,) local leaves.
    fixed = combine(ext, local)
    return jax.tree.map(
        lambda f, l: jnp.where(at_edge, l, f), fixed, local
    )


def sequence_parallel_scan(
    mesh: Mesh, axis_name: Optional[str] = None, local_scan=None
):
    """A drop-in ``lax.associative_scan`` replacement that shards the scan
    axis over ``mesh`` (1-D). Pass as ``scan_fn=`` to
    ``kalman_parallel.fuse_ekf_rts_parallel`` / ``parallel_quat_chain`` /
    ``parallel_position_filter``. Leaf length must divide evenly by the
    mesh size (``fuse_ekf_rts_seqparallel`` pads for you).

    The returned scan_fn carries a ``bind_identity(identity)`` method:
    given the combine's two-sided identity element it returns a variant
    whose PER-DEVICE local scan runs as one VMEM-resident Pallas kernel
    (``ops.pallas_scan``) when the local block fits the budget.
    ``kalman_parallel._maybe_pallas_scan`` calls it off-CPU, so the
    sequence-parallel path gets the same single-kernel ladder as the
    single-device path with no caller changes."""
    if axis_name is None:
        (axis_name,) = mesh.axis_names
    if local_scan is None:
        local_scan = jax.lax.associative_scan

    def scan_fn(combine, elems, reverse: bool = False):
        spec = P(axis_name)
        body = partial(
            _block_scan,
            combine,
            axis_name=axis_name,
            reverse=reverse,
            local_scan=local_scan,
        )
        kwargs = {}
        if getattr(local_scan, "interpret", False):
            # INTERPRET-mode Pallas local scans (tests only) are discharged
            # to HLO, exposing the kernel's internal identity-block concats
            # to shard_map's vma checker — unvaried constants concatenated
            # with axis-varying operands fail it; disabling the check is
            # the jax-documented workaround. The COMPILED path keeps
            # check_vma ON: the kernel is opaque (out_shape propagates the
            # input vma) and the host-side identity padding is pcast to
            # varying (ops.pallas_scan._ident_fill).
            kwargs["check_vma"] = False
        try:
            inner = shard_map(
                body, mesh=mesh, in_specs=(spec,), out_specs=spec, **kwargs
            )
        except TypeError:  # older jax: no check_vma (and no vma checking)
            inner = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec)
        return inner(elems)

    def bind_identity(identity, interpret: bool = False):
        # Guard on the MESH's platform, which is what the shard_map body
        # compiles for — NOT the process default (the class of bug behind
        # MULTICHIP_r03): on a CPU mesh under a TPU-default process the
        # Pallas ladder must NOT bind (non-interpret Mosaic kernels cannot
        # lower on XLA:CPU); the local scans run associative_scan_fori
        # instead (one fori_loop body — lax.associative_scan's unrolled
        # combine copies cost XLA:CPU minutes of compile per program).
        if not interpret:
            platform = next(iter(mesh.devices.flat)).platform
            if platform == "cpu":
                from gps_optimize_slam_tpu.ops.pallas_scan import make_fori_scan

                return sequence_parallel_scan(
                    mesh, axis_name, local_scan=make_fori_scan(identity)
                )
        from gps_optimize_slam_tpu.ops.pallas_scan import make_scan_fn

        return sequence_parallel_scan(
            mesh, axis_name, local_scan=make_scan_fn(identity, interpret)
        )

    scan_fn.bind_identity = bind_identity
    # Introspection for platform-resolution boundaries (kalman_chunked):
    # the mesh this scan compiles for.
    scan_fn.mesh = mesh
    return scan_fn


def _pad_for_mesh(n: int, d: int) -> int:
    return -(-n // d) * d


def _local_mesh_device(mesh: Mesh):
    """First mesh device THIS process can address — the hermeticity scope
    target for eager staging. A multi-process global mesh contains remote
    devices; ``jax.default_device`` on one of those raises, so
    ``mesh.devices.flat[0]`` is only correct single-process."""
    pid = jax.process_index()
    for d in mesh.devices.flat:
        if d.process_index == pid:
            return d
    # A mesh with no addressable devices cannot be staged from this
    # process at all; surface that clearly.
    raise ValueError("mesh contains no devices addressable by this process")


def fuse_ekf_rts_seqparallel(
    mesh: Mesh,
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    slam_quat: jnp.ndarray,
    sim3_pos: jnp.ndarray,
    sim3_quat: jnp.ndarray,
    aligned_gps: jnp.ndarray,
    valid_mask: jnp.ndarray,
    ekf_cfg: EKFConfig = EKFConfig(),
    rts_cfg: RTSDecisionConfig = RTSDecisionConfig(),
    rts_mode: str = "outage",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``kalman_parallel.fuse_ekf_rts_parallel`` with the pose axis sharded
    over a 1-D ``mesh``: inputs are staged block-cyclic-contiguously onto
    the devices, the three scans run as cross-device block scans, and every
    other op partitions under SPMD from the input shardings.

    The trajectory is padded to a mesh multiple with inert trailing steps
    (zero motion, invalid GPS — a trailing outage the controls state machine
    treats as dead-reckoning; RTS non-members reset the suffix recursion, so
    padding never perturbs real poses). Outputs are sliced back to N.

    Matches ``fuse_ekf_rts_parallel`` to float round-off (tested ≤1e-8 in
    f64 on the virtual 8-device CPU mesh)."""
    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    # Resolution boundary: kernel dispatch inside the filter (the Pallas
    # local-scan binding) keys on the MESH's platform, not the default.
    platform = resolve_platform(mesh=mesh)
    (axis_name,) = mesh.axis_names
    d = mesh.devices.size
    n = slam_times.shape[0]
    n_pad = _pad_for_mesh(n, d)
    # dtype probe must not materialize an array (jnp.asarray would dispatch
    # an eager convert on the DEFAULT backend — the MULTICHIP_r04 failure).
    dtype = jnp.result_type(slam_pos)

    def pad_repeat(x):
        """Repeat the last row (zero motion) out to the mesh multiple."""
        x = jnp.asarray(x, dtype)
        if n_pad == n:
            return x
        return jnp.concatenate([x, jnp.repeat(x[-1:], n_pad - n, axis=0)])

    # Mesh-platform hermeticity: every eager creation/convert below
    # (asarray, arange, full, zeros, concatenate on uncommitted operands)
    # would otherwise run on the process-default backend, which may be a
    # broken/absent accelerator when the mesh is a virtual-CPU dry run.
    # Scoping default_device to a mesh device commits them all to the mesh
    # platform; the explicit NamedSharding device_put then distributes.
    with jax.default_device(_local_mesh_device(mesh)):
        st = jnp.asarray(slam_times, dtype)
        if n_pad != n:
            # Strictly increasing padded timestamps keep dt > 0 (controls/Qd).
            tail = st[-1] + 1e-3 * jnp.arange(1, n_pad - n + 1, dtype=dtype)
            st = jnp.concatenate([st, tail])
        sp, sq, s3p, s3q = map(
            pad_repeat, (slam_pos, slam_quat, sim3_pos, sim3_quat)
        )
        gz = jnp.asarray(aligned_gps, dtype)
        gv = jnp.asarray(valid_mask, bool)
        if n_pad != n:
            gz = jnp.concatenate([gz, jnp.full((n_pad - n, 3), jnp.nan, dtype)])
            gv = jnp.concatenate([gv, jnp.zeros(n_pad - n, bool)])

        shard = NamedSharding(mesh, P(axis_name))
        st, sp, sq, s3p, s3q, gz, gv = (
            jax.device_put(x, shard) for x in (st, sp, sq, s3p, s3q, gz, gv)
        )

    scan_fn = sequence_parallel_scan(mesh, axis_name)

    @partial(jax.jit, static_argnames=("rts_mode_",))
    def run(st, sp, sq, s3p, s3q, gz, gv, rts_mode_):
        return kalman_parallel.fuse_ekf_rts_parallel(
            st, sp, sq, s3p, s3q, gz, gv,
            ekf_cfg, rts_cfg, rts_mode=rts_mode_, scan_fn=scan_fn,
            platform=platform,
        )

    pos, quat_out = run(st, sp, sq, s3p, s3q, gz, gv, rts_mode)
    # The unpad slice also runs EAGERLY: its index constants would be
    # created on the process-default backend (the same leak class as the
    # padding above), so keep it scoped to the mesh.
    with jax.default_device(_local_mesh_device(mesh)):
        return pos[:n], quat_out[:n]
