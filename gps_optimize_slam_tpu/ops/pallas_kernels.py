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


# ---------------------------------------------------------------------------
# Sim3 RANSAC consensus counting.
#
# The trials×points residual pass is the RANSAC stage's wall: the jnp
# formulation (ops.ransac.sim3_ransac trial_count) streams O(T·N)
# intermediates through HBM, and a direct elementwise kernel is VPU-bound
# (~25 broadcast ops per trial×point — measured 2.3-2.8 ms at all-KITTI
# scale). This kernel instead puts the FLOPs where they belong on TPU — the
# MXU: the residual ‖s·R·p + t − d‖² is a quadratic form, exactly equal to
# an 18-term dot product  c(R,t,s) · f(p,d)  with
#   f = [vec(d⊗p), p, d, ‖p‖², ‖d‖², 1]          (per point, 18 values)
#   c = [−2s·vec(R), 2s·Rᵀt, −2t, s², 1, ‖t‖²]   (per trial, 18 values)
# so a (TILE_T, 32)×(32, TILE_P) matmul computes the whole distance block in
# one MXU pass; compare+count stay in VMEM. HBM traffic O(N + T), compute on
# the systolic array instead of the vector units.
#
# Numerics: the expansion cancels (‖p‖² ≈ ‖d−t‖² terms), so the wrapper
# CENTERS both clouds (p−μp, d−μd, t adjusted per trial) — block-local
# magnitudes drop from UTM/ENU spans to cloud radii and the f32/bf16x3 error
# stays ≪ the metres-scale RANSAC threshold. Counts may still differ from
# the exact formulation for residuals within rounding of the threshold — an
# equivalent consensus (the winner's mask/refit is recomputed exactly by the
# caller).
# ---------------------------------------------------------------------------

TILE_T = 256  # trials per block
TILE_P = 2048  # points per block
_NF = 32  # feature rows (18 used, padded to a lane-friendly 32)


def _ransac_count_kernel(coef_ref, feat_ref, vmask_ref, out_ref, *, thr2):
    j = pl.program_id(1)
    # HIGHEST: full-f32 products (bf16x6 passes). The MXU's default bf16x1
    # mantissa (8 bits) on quadratic-form terms of magnitude ~cloud-radius²
    # flips hundreds of counts per trial at all-KITTI scale (measured);
    # even at 6 passes this stays one MXU op per 32-wide contraction vs
    # ~25 VPU broadcast ops for the elementwise form.
    d2 = jnp.dot(
        coef_ref[:, :],
        feat_ref[:, :],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TILE_T, TILE_P)
    inl = (d2 < thr2) & vmask_ref[0, :][None, :]
    cnt = jnp.sum(inl.astype(jnp.int32), axis=1)[None, :]  # (1, TILE_T)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = cnt

    @pl.when(j > 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + cnt


@functools.partial(jax.jit, static_argnames=("thr2", "interpret"))
def ransac_counts(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    valid: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    s: jnp.ndarray,
    thr2: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-trial Sim3 consensus count: #{i : valid_i ∧ ‖s·R·src_i+t −
    dst_i‖² < thr2} for every trial hypothesis.

    src/dst (N,3), valid (N,), R (T,3,3), t (T,3), s (T,) → (T,) int32.
    Residuals within f32 rounding of the threshold may count differently
    than the exact elementwise form (see module comment)."""
    n, T = src.shape[0], R.shape[0]
    n_pad = _round_up(max(n, 8), TILE_P)
    t_pad = _round_up(max(T, 8), TILE_T)

    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    R = R.astype(jnp.float32)
    t = t.astype(jnp.float32)
    s = s.astype(jnp.float32)

    # Center both clouds (masked means) — kills the quadratic-form
    # cancellation; residuals are translation-invariant with t adjusted.
    w = valid.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mu_p = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    p = src - mu_p
    d = dst - mu_d
    # t' = t + s·R·μp − μd  (per trial)
    t_adj = t + s[:, None] * jnp.einsum("tij,j->ti", R, mu_p) - mu_d

    # Features (32, N): [vec(d⊗p), p, d, ‖p‖², ‖d‖², 1, 0-pad].
    outer = d[:, :, None] * p[:, None, :]  # (N, 3, 3), [i, j] = d_i p_j
    feats = jnp.concatenate(
        [
            outer.reshape(n, 9),
            p,
            d,
            jnp.sum(p * p, axis=1, keepdims=True),
            jnp.sum(d * d, axis=1, keepdims=True),
            jnp.ones((n, 1), jnp.float32),
        ],
        axis=1,
    )  # (N, 18)
    # Coefficients (T, 32): [−2s·vec(R), 2s·Rᵀt', −2t', s², 1, ‖t'‖²].
    rt_t = jnp.einsum("tji,tj->ti", R, t_adj)  # Rᵀ t'
    coefs = jnp.concatenate(
        [
            -2.0 * s[:, None] * R.reshape(T, 9),
            2.0 * s[:, None] * rt_t,
            -2.0 * t_adj,
            (s * s)[:, None],
            jnp.ones((T, 1), jnp.float32),
            jnp.sum(t_adj * t_adj, axis=1, keepdims=True),
        ],
        axis=1,
    )  # (T, 18)

    f = jnp.zeros((_NF, n_pad), jnp.float32).at[:18, :n].set(feats.T)
    c = jnp.zeros((t_pad, _NF), jnp.float32).at[:T, :18].set(coefs)
    vm = jnp.zeros((1, n_pad), bool).at[0, :n].set(valid)

    grid = (t_pad // TILE_T, n_pad // TILE_P)
    out = pl.pallas_call(
        functools.partial(_ransac_count_kernel, thr2=float(thr2)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_T, _NF), lambda i, j: (i, 0)),
            pl.BlockSpec((_NF, TILE_P), lambda i, j: (0, j)),
            pl.BlockSpec((1, TILE_P), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, TILE_T), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, t_pad), jnp.int32),
        interpret=interpret,
    )(c, f, vm)
    return out[0, :T]
