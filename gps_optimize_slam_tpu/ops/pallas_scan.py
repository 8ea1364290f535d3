"""Single-kernel associative scan: the whole Hillis-Steele ladder in
one Pallas launch, VMEM-resident.

``jax.lax.associative_scan`` lowers to ~2·log₂N rounds of slice/combine/
concat HLOs; each round is its own fusion with its own HBM round-trip and
launch overhead. At the framework's trajectory lengths (N ≤ ~20k, tiny
per-element state) the scans are ROUND-bound, not FLOP-bound: the three
log-depth Kalman scans (quaternion chain, five-tuple forward filter, RTS
suffix — ops.kalman_parallel) measure ~4 ms of the all-KITTI fused program
while moving only ~5 MB of state. This module runs the SAME prefix
computation as ONE kernel with every leaf held in VMEM:

  * layout: each (N,) leaf is padded with IDENTITY elements to a multiple
    of 128 and viewed as (R, 128) — rows on sublanes, consecutive elements
    on lanes (n = r·128 + l);
  * phase 1 — lane ladder: 7 Hillis-Steele steps with stride 1,2,…,64;
    the "earlier" operand is built by static slice+concat of an identity
    block (no roll-direction ambiguity, no mask);
  * phase 2 — row ladder: each row's total (lane 127) is broadcast across
    lanes, prefix-combined over rows (≤ log₂R steps + one exclusive
    shift), and combined into every element of the row.

Total: ≤ 7 + log₂R + 2 combine applications on (R, 128) VMEM arrays —
one launch instead of ~2·log₂N fusions. The combine runs UNCHANGED (plain
jnp elementwise on the leaf tree), so results match lax.associative_scan
to float rounding; ``reverse=True`` mirrors both ladders (suffix scan,
matching jax's r[k] = combine(r[k+1], e[k]) argument order — the later-k
suffix arrives as the FIRST argument, exactly like lax).

The caller must supply the combine's two-sided IDENTITY element (used for
padding and ladder edges): combine(id, x) == x == combine(x, id). All
three Kalman scans have trivial ones (identity quaternion; (A=I, b=0,
C=0, η=0, J=0); (M=I, c=0)).

Used by ops.kalman_parallel when the leaves fit the VMEM budget (padding
included); callers fall back to lax.associative_scan on CPU, for f64, or
beyond the budget — e.g. the >HBM chunked path at 131k-pose chunks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# Conservative VMEM budget for in+out leaf residency (16 MB/core total;
# leave headroom for the ladder temporaries the scheduler keeps live).
_VMEM_BUDGET_BYTES = 4 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scan_kernel(*refs, combine, treedef, idents, R, reverse):
    n_leaves = len(idents)
    in_refs, out_refs = refs[:n_leaves], refs[n_leaves:]
    xs = [r[:, :] for r in in_refs]  # each (R, 128)
    dtype = xs[0].dtype

    def blk(i, shape):
        return jnp.full(shape, idents[i], dtype)

    def apply(earlier, later):
        out = combine(
            jax.tree.unflatten(treedef, earlier),
            jax.tree.unflatten(treedef, later),
        )
        return jax.tree.leaves(out)

    # Phase 1 — lane ladder (within-row prefix/suffix).
    s = 1
    while s < _LANES:
        if not reverse:
            # earlier[l] = x[l-s] (identity for l < s)
            prev = [
                jnp.concatenate([blk(i, (R, s)), x[:, : _LANES - s]], axis=1)
                for i, x in enumerate(xs)
            ]
            xs = apply(prev, xs)
        else:
            # later-suffix[l] = x[l+s] (identity for l ≥ 128-s)
            nxt = [
                jnp.concatenate([x[:, s:], blk(i, (R, s))], axis=1)
                for i, x in enumerate(xs)
            ]
            xs = apply(nxt, xs)
        s *= 2

    if R > 1:
        # Phase 2 — row ladder on the per-row totals, broadcast over lanes.
        tot_col = 0 if reverse else _LANES - 1
        ts = [
            jnp.broadcast_to(x[:, tot_col : tot_col + 1], (R, _LANES))
            for x in xs
        ]
        s = 1
        while s < R:
            if not reverse:
                prev = [
                    jnp.concatenate([blk(i, (s, _LANES)), t[: R - s, :]], axis=0)
                    for i, t in enumerate(ts)
                ]
                ts = apply(prev, ts)
            else:
                nxt = [
                    jnp.concatenate([t[s:, :], blk(i, (s, _LANES))], axis=0)
                    for i, t in enumerate(ts)
                ]
                ts = apply(nxt, ts)
            s *= 2
        # Exclusive shift: row r gets rows 0..r-1 (forward) / r+1.. (reverse).
        if not reverse:
            excl = [
                jnp.concatenate([blk(i, (1, _LANES)), t[: R - 1, :]], axis=0)
                for i, t in enumerate(ts)
            ]
        else:
            excl = [
                jnp.concatenate([t[1:, :], blk(i, (1, _LANES))], axis=0)
                for i, t in enumerate(ts)
            ]
        # In forward mode the first combine argument is the EARLIER
        # composite; in reverse mode it is the LATER one (jax's reverse
        # semantics: r[k] = combine(r[k+1], e[k])). excl is the earlier
        # rows in forward and the later rows in reverse — first arg both
        # ways.
        xs = apply(excl, xs)

    for r, x in zip(out_refs, xs):
        r[:, :] = x


def _kernel_fits(n_leaves: int, n_padded: int, itemsize: int) -> bool:
    return 2 * n_leaves * n_padded * itemsize <= _VMEM_BUDGET_BYTES


def associative_scan_vmem(
    combine,
    elems,
    identity,
    reverse: bool = False,
    interpret: bool = False,
):
    """``lax.associative_scan(combine, elems, reverse=...)`` as ONE Pallas
    kernel. ``identity`` is a pytree matching ``elems``'s structure of
    PYTHON scalars — the combine's two-sided identity element, used to pad
    N to a lane multiple and to feed the ladder edges.

    All leaves must be 1-D of equal length and share one floating dtype.
    Raises ValueError when the leaves don't fit the VMEM budget — callers
    gate with :func:`fits_vmem` and fall back to lax.
    """
    leaves, treedef = jax.tree.flatten(elems)
    idents = [float(x) for x in jax.tree.leaves(identity)]
    if len(idents) != len(leaves):
        raise ValueError("identity tree does not match elems tree")
    n = leaves[0].shape[0]
    dtype = leaves[0].dtype
    for lf in leaves:
        if lf.ndim != 1 or lf.shape[0] != n or lf.dtype != dtype:
            raise ValueError("leaves must be equal-length 1-D, one dtype")
    n_pad = _round_up(max(n, _LANES), _LANES)
    if not _kernel_fits(len(leaves), n_pad, dtype.itemsize):
        raise ValueError("leaves exceed the VMEM scan budget")
    R = n_pad // _LANES

    padded = [
        jnp.concatenate(
            [lf, jnp.full((n_pad - n,), idents[i], dtype)]
        ).reshape(R, _LANES)
        for i, lf in enumerate(leaves)
    ]
    kernel = functools.partial(
        _scan_kernel,
        combine=combine,
        treedef=treedef,
        idents=tuple(idents),
        R=R,
        reverse=reverse,
    )
    # Inside shard_map the outputs vary over the same mesh axes as the
    # inputs — propagate the input aval's vma so shard_map's check_vma
    # accepts the kernel (no-op outside shard_map / on older jax).
    try:
        vma = jax.typeof(padded[0]).vma
        out_shape = [jax.ShapeDtypeStruct((R, _LANES), dtype, vma=vma)] * len(leaves)
    except (AttributeError, TypeError):
        out_shape = [jax.ShapeDtypeStruct((R, _LANES), dtype)] * len(leaves)
    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(leaves),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(leaves),
        out_shape=out_shape,
        interpret=interpret,
    )(*padded)
    flat = [o.reshape(n_pad)[:n] for o in outs]
    return jax.tree.unflatten(treedef, flat)


def fits_vmem(elems) -> bool:
    """True when ``associative_scan_vmem`` can hold ``elems`` (padded,
    in+out) within the VMEM budget."""
    leaves = jax.tree.leaves(elems)
    n = leaves[0].shape[0]
    n_pad = _round_up(max(n, _LANES), _LANES)
    return _kernel_fits(len(leaves), n_pad, leaves[0].dtype.itemsize)


def make_scan_fn(identity, interpret: bool = False):
    """A drop-in for ``jax.lax.associative_scan`` bound to ``identity``:
    runs the single-kernel scan when the leaves fit VMEM (and the dtype is
    f32), falls back to lax otherwise."""

    def scan(combine, elems, reverse: bool = False):
        leaves = jax.tree.leaves(elems)
        if leaves[0].dtype == jnp.float32 and fits_vmem(elems):
            return associative_scan_vmem(
                combine, elems, identity, reverse=reverse, interpret=interpret
            )
        return jax.lax.associative_scan(combine, elems, reverse=reverse)

    return scan
