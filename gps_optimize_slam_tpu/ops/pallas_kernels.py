"""Pallas TPU kernels for the framework's hot memory-bound ops.

``nn_min_dist2`` — tiled nearest-neighbour squared-distance reduction:
for each trajectory point, min over all candidate points of the squared
euclidean distance. The jnp formulation materialises the full (N, M)
distance matrix in HBM (2.1 GB at the 23k-pose all-KITTI scale) before
reducing; this kernel streams (TILE_N × TILE_M) blocks through VMEM and
keeps a running row-minimum, so HBM traffic drops from O(N·M) to
O(N + M) — the evaluation metric's memory wall disappears.

Numerics: distances are computed as Σ(aₖ−bₖ)² with an unrolled coordinate
loop, NOT the ‖a‖²+‖b‖²−2a·b matmul form — the latter cancels
catastrophically in float32 when nearby points have large coordinates
(error ~ eps·‖a‖², metres of noise on sub-metre distances).

Layout notes: coordinates live transposed as (8, N)/(8, M) so blocks are
(8 sublanes × 128k lanes) — the native f32 VMEM tile; the output lives as
(1, N) with the 128-aligned tile on the lane dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_N = 256
TILE_M = 512
_PAD_DIM = 8


def _nn_kernel(a_ref, b_ref, bmask_ref, out_ref):
    j = pl.program_id(1)
    bmask = bmask_ref[0, :]  # (TILE_M,)

    d2 = jnp.zeros((TILE_N, TILE_M), jnp.float32)
    for k in range(3):  # unrolled coordinate loop — no cancellation
        diff = a_ref[k, :][:, None] - b_ref[k, :][None, :]
        d2 = d2 + diff * diff
    d2 = jnp.where(bmask[None, :], d2, jnp.inf)
    tile_min = jnp.min(d2, axis=1)[None, :]  # (1, TILE_N)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = tile_min

    @pl.when(j > 0)
    def _():
        out_ref[:, :] = jnp.minimum(out_ref[:, :], tile_min)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_min_dist2(
    traj: jnp.ndarray,
    candidates: jnp.ndarray,
    cand_mask: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-trajectory-point min squared distance to any valid candidate.

    traj (N,3), candidates (M,3), cand_mask (M,) → (N,) float32.
    ``interpret=True`` runs the kernel in interpreter mode (CPU testing).
    """
    n, m = traj.shape[0], candidates.shape[0]
    n_pad = _round_up(max(n, 8), TILE_N)
    m_pad = _round_up(max(m, 8), TILE_M)

    # Transposed (8, ·) coordinate layout — native f32 (8, 128) tiling.
    a = jnp.zeros((_PAD_DIM, n_pad), jnp.float32).at[:3, :n].set(
        traj.astype(jnp.float32).T
    )
    b = jnp.zeros((_PAD_DIM, m_pad), jnp.float32).at[:3, :m].set(
        candidates.astype(jnp.float32).T
    )
    bm = jnp.zeros((1, m_pad), bool).at[0, :m].set(cand_mask)

    grid = (n_pad // TILE_N, m_pad // TILE_M)
    out = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_PAD_DIM, TILE_N), lambda i, j: (0, i)),
            pl.BlockSpec((_PAD_DIM, TILE_M), lambda i, j: (0, j)),
            pl.BlockSpec((1, TILE_M), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, TILE_N), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
    )(a, b, bm)
    return out[0, :n]


def nn_errors_pallas(
    traj: jnp.ndarray,
    candidates: jnp.ndarray,
    traj_mask: jnp.ndarray,
    cand_mask: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in Pallas version of ops.metrics.nn_errors."""
    d2 = nn_min_dist2(traj, candidates, cand_mask, interpret=interpret)
    err = jnp.sqrt(d2).astype(traj.dtype)
    return jnp.where(traj_mask, err, jnp.inf)
