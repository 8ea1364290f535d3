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
included). Beyond the budget (e.g. the >HBM chunked path at 131k-pose
chunks), :func:`associative_scan_tiled` runs the same computation as one
HBM-resident kernel: (block_rows, 128) tiles stream through the grid
(sequential on TPU) with the running composite carried in a VMEM scratch —
the cross-block decomposition parallel.seqpar uses across devices, within
one kernel. Callers fall back to lax.associative_scan for non-f32/non-1-D
trees (make_scan_fn gates all of this). On CPU the swap target is
:func:`associative_scan_fori` instead — the same Hillis-Steele ladder as a
``lax.fori_loop`` whose body XLA compiles ONCE, because
``lax.associative_scan``'s unrolled ~2·log₂N combine copies make XLA:CPU
compiles of the 27-leaf filter combine take minutes (it is a compile-time
fallback, not a runtime one: CPU is the test/dryrun platform here).
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


def _ladder(xs, *, combine, treedef, idents, R, reverse):
    """The in-VMEM Hillis-Steele ladder on (R, 128) leaf blocks: lane-ladder
    phase 1 + row-ladder phase 2 (see module docstring). Returns the
    inclusive prefix (suffix when ``reverse``) of the block."""
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
    return xs


def _scan_kernel(*refs, combine, treedef, idents, R, reverse):
    n_leaves = len(idents)
    in_refs, out_refs = refs[:n_leaves], refs[n_leaves:]
    xs = [r[:, :] for r in in_refs]  # each (R, 128)
    xs = _ladder(xs, combine=combine, treedef=treedef, idents=idents, R=R,
                 reverse=reverse)
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

    # Identity padding, marked varying over the leaves' own manual axes:
    # inside shard_map, concatenating an UNVARIED constant with an
    # axis-varying operand fails the vma check — pvary/pcast is jax's
    # sanctioned fix, and it keeps check_vma ON for the compiled production
    # path (the interpret-mode kernel discharge still needs the scoped
    # check_vma=False in parallel.seqpar).
    def _ident_fill(i, k):
        fill = jnp.full((k,), idents[i], dtype)
        vma = getattr(jax.typeof(leaves[i]), "vma", None)
        if vma:
            fill = jax.lax.pcast(fill, tuple(vma), to="varying")
        return fill

    padded = [
        (
            jnp.concatenate([lf, _ident_fill(i, n_pad - n)])
            if n_pad != n
            else lf
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


def _tiled_scan_kernel(
    *refs, combine, treedef, idents, Rb, reverse, n_blocks
):
    """Grid-carried scan over HBM-resident leaves (one (Rb, 128) block per
    grid step; TPU grids execute SEQUENTIALLY, so a VMEM scratch carries the
    running composite between blocks — the same decomposition
    parallel.seqpar._block_scan uses across devices, here across grid
    steps within ONE kernel). ``reverse`` walks the blocks back-to-front via
    the BlockSpec index maps; the carry then holds the exclusive SUFFIX."""
    n_leaves = len(idents)
    in_refs = refs[:n_leaves]
    out_refs = refs[n_leaves : 2 * n_leaves]
    carry_refs = refs[2 * n_leaves :]
    g = pl.program_id(0)
    dtype = in_refs[0].dtype

    @pl.when(g == 0)
    def _():
        for i, c in enumerate(carry_refs):
            c[:, :] = jnp.full((1, _LANES), idents[i], dtype)

    def apply(earlier, later):
        out = combine(
            jax.tree.unflatten(treedef, earlier),
            jax.tree.unflatten(treedef, later),
        )
        return jax.tree.leaves(out)

    xs = [r[:, :] for r in in_refs]  # (Rb, 128)
    xs = _ladder(xs, combine=combine, treedef=treedef, idents=idents, R=Rb,
                 reverse=reverse)
    # Fold the carried exclusive prefix (suffix) into every block element.
    # combine's first argument: forward = earlier composite (the carry);
    # reverse = later composite (also the carry — it came from larger-k
    # blocks, which the reversed grid visits first). combine(identity, x)
    # == x makes the g == 0 fold a no-op by the identity contract.
    cs = [c[:, :] for c in carry_refs]  # (1, 128), broadcasts over rows
    xs = apply(cs, xs)
    for r, x in zip(out_refs, xs):
        r[:, :] = x
    # New carry: the block's folded total — last element (first, in
    # reverse), broadcast across lanes for the next fold.
    for c, x in zip(carry_refs, xs):
        if reverse:
            c[:, :] = jnp.broadcast_to(x[0:1, 0:1], (1, _LANES))
        else:
            c[:, :] = jnp.broadcast_to(x[Rb - 1 : Rb, _LANES - 1 :], (1, _LANES))


def associative_scan_tiled(
    combine,
    elems,
    identity,
    reverse: bool = False,
    interpret: bool = False,
    block_rows: int | None = None,
):
    """``lax.associative_scan`` as ONE Pallas kernel for leaf trees BEYOND
    the VMEM budget: leaves stay HBM-resident and stream through the kernel
    in (block_rows, 128) tiles; a VMEM scratch carries the running composite
    across the (sequential) grid. HBM traffic is the streaming minimum —
    read + write each leaf once — vs lax's ~2·log₂N round-trips.

    ``block_rows`` defaults to the largest multiple of 8 the VMEM budget
    accepts for this leaf count. Same eligibility contract as
    :func:`associative_scan_vmem` (1-D equal-length single-dtype leaves).
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
    if block_rows is None:
        block_rows = (
            _VMEM_BUDGET_BYTES // (2 * len(leaves) * _LANES * dtype.itemsize) // 8
        ) * 8
    Rb = max(8, block_rows)
    block = Rb * _LANES
    n_pad = _round_up(max(n, block), block)
    n_blocks = n_pad // block

    def _ident_fill(i, k):
        fill = jnp.full((k,), idents[i], dtype)
        vma = getattr(jax.typeof(leaves[i]), "vma", None)
        if vma:
            fill = jax.lax.pcast(fill, tuple(vma), to="varying")
        return fill

    padded = [
        (
            jnp.concatenate([lf, _ident_fill(i, n_pad - n)])
            if n_pad != n
            else lf
        ).reshape(n_blocks * Rb, _LANES)
        for i, lf in enumerate(leaves)
    ]
    kernel = functools.partial(
        _tiled_scan_kernel,
        combine=combine,
        treedef=treedef,
        idents=tuple(idents),
        Rb=Rb,
        reverse=reverse,
        n_blocks=n_blocks,
    )
    # Reverse scans walk the blocks back-to-front.
    if reverse:
        imap = lambda g: (n_blocks - 1 - g, 0)  # noqa: E731
    else:
        imap = lambda g: (g, 0)  # noqa: E731
    try:
        vma = jax.typeof(padded[0]).vma
        out_shape = [
            jax.ShapeDtypeStruct((n_blocks * Rb, _LANES), dtype, vma=vma)
        ] * len(leaves)
    except (AttributeError, TypeError):
        out_shape = [jax.ShapeDtypeStruct((n_blocks * Rb, _LANES), dtype)] * len(
            leaves
        )
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((Rb, _LANES), imap)] * len(leaves),
        out_specs=[pl.BlockSpec((Rb, _LANES), imap)] * len(leaves),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((1, _LANES), dtype)] * len(leaves),
        interpret=interpret,
    )(*padded)
    flat = [o.reshape(n_pad)[:n] for o in outs]
    return jax.tree.unflatten(treedef, flat)


def associative_scan_fori(combine, elems, identity, reverse: bool = False):
    """``lax.associative_scan(combine, elems, reverse=...)`` as a
    Hillis-Steele ladder driven by ONE ``lax.fori_loop``.

    ``lax.associative_scan`` UNROLLS its recursion: the combine body is
    inlined ~2·log₂N times into the HLO, and XLA:CPU's compile time on the
    27-leaf Kalman filter combine then runs to MINUTES per program (the
    dominant cost of the CPU test suite and the virtual-mesh dryruns). Here
    the ladder step is a loop body traced and compiled ONCE: at step d each
    element combines with the element 2^d before it (after it, when
    ``reverse``), boundary positions receiving the two-sided ``identity``
    so no output select is needed (combine(id, x) == x).

    O(N·log₂N) work instead of lax's O(N) — the right trade on CPU where
    programs are compile-bound, wrong on TPU where the single-kernel Pallas
    ladders (above) already collapse the rounds. Argument order matches lax
    exactly: the accumulated composite arrives FIRST both directions (the
    larger-k suffix composite first under ``reverse``).

    ``identity``: pytree of Python scalars matching ``elems``' structure —
    the combine's two-sided identity (same contract as
    :func:`associative_scan_vmem`). Works for any leaf ndim/dtype with a
    shared leading length (the scan axis is axis 0).
    """
    leaves, treedef = jax.tree.flatten(elems)
    idents = [float(x) for x in jax.tree.leaves(identity)]
    if len(idents) != len(leaves):
        raise ValueError("identity tree does not match elems tree")
    n = leaves[0].shape[0]
    if n < 2:
        return elems
    steps = (n - 1).bit_length()  # ceil(log2(n)); max offset 2^(steps-1) < n

    def _shifted(x, ident, offset):
        """x shifted by ``offset`` along axis 0 toward the scan direction,
        identity-filled at the boundary: forward → s[i] = x[i-offset] for
        i ≥ offset; reverse → s[i] = x[i+offset] for i < n-offset."""
        blk = jnp.full(x.shape, ident, x.dtype)
        # Inside shard_map the identity block must be marked varying over
        # the operand's manual axes before concatenation (see _ident_fill).
        vma = getattr(jax.typeof(x), "vma", None)
        if vma:
            blk = jax.lax.pcast(blk, tuple(vma), to="varying")
        if reverse:
            cat = jnp.concatenate([x, blk], axis=0)
            start = offset
        else:
            cat = jnp.concatenate([blk, x], axis=0)
            start = n - offset
        starts = (start,) + (0,) * (x.ndim - 1)
        return jax.lax.dynamic_slice(cat, starts, x.shape)

    def body(d, xs):
        offset = jnp.int32(1) << d
        shifted = [_shifted(x, idents[i], offset) for i, x in enumerate(xs)]
        out = combine(
            jax.tree.unflatten(treedef, shifted),
            jax.tree.unflatten(treedef, list(xs)),
        )
        return tuple(jax.tree.leaves(out))

    out = jax.lax.fori_loop(0, steps, body, tuple(leaves))
    return jax.tree.unflatten(treedef, list(out))


def make_fori_scan(identity):
    """A drop-in for ``lax.associative_scan`` bound to ``identity`` that
    always runs :func:`associative_scan_fori` — the compile-cheap CPU scan
    kalman_parallel._maybe_pallas_scan and parallel.seqpar swap in when the
    resolved platform is "cpu". Dispatch decisions are appended to
    :data:`DISPATCH_LOG` as ``("fori", n)``."""

    def scan(combine, elems, reverse: bool = False):
        n = jax.tree.leaves(elems)[0].shape[0]
        DISPATCH_LOG.append(("fori", n))
        return associative_scan_fori(combine, elems, identity, reverse=reverse)

    scan.interpret = False
    return scan


def fits_vmem(elems) -> bool:
    """True when ``associative_scan_vmem`` can hold ``elems`` (padded,
    in+out) within the VMEM budget."""
    leaves = jax.tree.leaves(elems)
    n = leaves[0].shape[0]
    n_pad = _round_up(max(n, _LANES), _LANES)
    return _kernel_fits(len(leaves), n_pad, leaves[0].dtype.itemsize)


# Trace-time dispatch log: (impl, n) appended whenever a make_scan_fn scan
# resolves its implementation — "vmem" (the single-kernel Pallas ladder) or
# "lax" (fallback: ineligible tree / over budget). Python-level and
# trace-time only, so entries appear per TRACE, not per execution (a
# cache-hit re-run adds nothing). Used by the multichip dryrun and tests to
# assert the Pallas ladder actually engaged (or was correctly skipped)
# instead of silently falling back.
DISPATCH_LOG: list = []


def _tree_eligible(leaves) -> bool:
    """Shape/dtype eligibility for the single-kernel scans: 1-D equal-length
    f32 leaves. Checked BEFORE dispatch so ineligible trees (mixed dtype,
    non-1-D) silently take the lax path as documented, instead of raising
    inside the kernels."""
    n = leaves[0].shape[0] if leaves[0].ndim else None
    return all(
        lf.ndim == 1 and lf.shape[0] == n and lf.dtype == jnp.float32
        for lf in leaves
    )


def make_scan_fn(identity, interpret: bool = False):
    """A drop-in for ``jax.lax.associative_scan`` bound to ``identity``:
    runs the single-kernel VMEM scan when the leaf tree is eligible (1-D
    equal-length f32 leaves) and fits the VMEM budget, the HBM-tiled
    grid-carried kernel (``associative_scan_tiled``) for eligible trees
    BEYOND the budget, and lax otherwise. Each trace-time dispatch decision
    is appended to :data:`DISPATCH_LOG`."""

    def scan(combine, elems, reverse: bool = False):
        leaves = jax.tree.leaves(elems)
        if _tree_eligible(leaves):
            n = leaves[0].shape[0]
            if _kernel_fits(
                len(leaves),
                _round_up(max(n, _LANES), _LANES),
                leaves[0].dtype.itemsize,
            ):
                DISPATCH_LOG.append(("vmem", n))
                return associative_scan_vmem(
                    combine, elems, identity, reverse=reverse, interpret=interpret
                )
            DISPATCH_LOG.append(("vmem_tiled", n))
            return associative_scan_tiled(
                combine, elems, identity, reverse=reverse, interpret=interpret
            )
        DISPATCH_LOG.append(("lax", getattr(leaves[0], "shape", (0,))[0]))
        return jax.lax.associative_scan(combine, elems, reverse=reverse)

    # Introspection: parallel.seqpar scopes its shard_map check_vma
    # workaround to interpret-mode scans (where the kernel body is
    # discharged to HLO and its internal identity concats become visible to
    # the vma checker).
    scan.interpret = interpret
    return scan
