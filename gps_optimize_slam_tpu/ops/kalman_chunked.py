"""Out-of-core (>HBM) EKF + RTS fusion: the associative scans re-entrant
over host-streamed chunks.

SURVEY §2.4 (long-trajectory row): `lax.scan`/`associative_scan` handle
10⁵-10⁶ poses in one device program, but a trajectory larger than device
memory needs CHUNKING. Both passes of the temporally-parallel filter
(ops.kalman_parallel) are associative scans, so they re-enter exactly:

* forward — the composite PREFIX element of everything before a chunk is a
  single 27-component filtering element (A 3×3, b 3, C sym 6, η 3, J sym 6);
  prepend it, scan the chunk, keep the last composite as the next carry.
  The quaternion chain carries one quaternion the same way.
* backward (RTS) — the composite SUFFIX element after a chunk is one
  12-component smoothing element (M 3×3, c 3); append it, reverse-scan.

Host-side orchestration streams chunk inputs with `jax.device_put` and
writes outputs into preallocated (possibly memory-mapped) NumPy arrays —
device residency is O(chunk), host residency is O(N) streamable. Control
signals (outage runs, recovery analysis, RTS membership — the logic of
``kalman.precompute_controls``) are recomputed in NumPy: elementwise +
prefix ops, IO-bound at out-of-core scale anyway.

Matches ``kalman_parallel.fuse_ekf_rts_parallel`` exactly (same element
algebra, same combine order) — tested to float equality on overlapping
scales. Same validity domain: hard updates only (transition steps ≡ 0,
the reference's default — SURVEY Q5).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.ops import se3
from gps_optimize_slam_tpu.ops import quaternion as quat
from gps_optimize_slam_tpu.ops.kalman import ekf_params
from gps_optimize_slam_tpu.utils import streaming
from gps_optimize_slam_tpu.ops.kalman_parallel import (
    _combine_filter,
    _FILTER_IDENTITY,
    _madd,
    _maybe_pallas_scan,
    _minv,
    _mmul,
    _mvec,
    _RTS_IDENTITY,
    _sym_expand,
    _vadd,
    _vsub,
    parallel_quat_chain,
)


# ---------------------------------------------------------------------------
# NumPy controls (host-side mirror of kalman.precompute_controls)
# ---------------------------------------------------------------------------


def controls_numpy(
    slam_times: np.ndarray,
    slam_quats: np.ndarray,
    aligned_gps: np.ndarray,
    valid_mask: np.ndarray,
    rts_cfg: RTSDecisionConfig,
    rts_mode: str = "outage",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(avail, rts_member, rts_end) as host bool arrays.

    Same semantics as ``kalman.precompute_controls`` (reference outage
    bookkeeping, EKFGPSSLAM.py:861-899) — vectorised NumPy prefix ops,
    suitable for memmapped inputs."""
    n = len(slam_times)
    avail = np.asarray(valid_mask) & ~np.isnan(np.asarray(aligned_gps)).any(-1)
    idx = np.arange(n)
    avail_prev = np.concatenate([avail[:1], avail[:-1]])
    is_recovery = avail & ~avail_prev
    is_recovery[0] = False

    last_avail = np.maximum.accumulate(np.where(avail, idx, -1))
    run_start = last_avail + 1
    run_len_at = idx - last_avail

    q = np.asarray(slam_quats, np.float64)
    # Yaw from quaternion (zyx convention, matching ops.quaternion.yaw).
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    yaws = np.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    dyaw = np.mod(yaws[1:] - yaws[:-1] + np.pi, 2.0 * np.pi) - np.pi
    dts = np.asarray(slam_times)[1:] - np.asarray(slam_times)[:-1]
    rate = np.where(dts > 0, np.abs(dyaw / np.where(dts > 0, dts, 1.0)), 0.0)
    thresh = np.deg2rad(rts_cfg.sharp_turn_yaw_rate_threshold_deg_per_sec)
    pair_in_run = (~avail[:-1]) & (~avail[1:])
    high = pair_in_run & (rate > thresh)
    cum_high = np.concatenate([[0], np.cumsum(high.astype(np.int64))])
    bad_quat = (np.linalg.norm(q, axis=-1) < 1e-15) & ~avail
    cum_bad = np.concatenate([[0], np.cumsum(bad_quat.astype(np.int64))])

    prev_run_start = np.concatenate([[0], run_start[:-1]])
    prev_run_len = np.concatenate([[0], run_len_at[:-1]])
    analyse = is_recovery & (prev_run_len >= 2)
    s_clip = np.clip(prev_run_start, 0, n - 1)
    any_high = (cum_high[np.clip(idx - 1, 0, n - 1)] - cum_high[s_clip]) > 0
    any_bad = (cum_bad[idx] - cum_bad[s_clip]) > 0
    sharp = analyse & (any_high | any_bad)
    perform_rts = is_recovery & ~sharp

    run_last = (~avail) & np.concatenate([avail[1:], [False]])
    e_rev = np.maximum.accumulate(np.where(run_last, (n - 1) - idx, -1)[::-1])[::-1]
    found = e_rev >= 0
    run_end = (n - 1) - np.where(found, e_rev, 0)
    member_invalid = (~avail) & found & perform_rts[np.clip(run_end + 1, 0, n - 1)]
    rts_member = member_invalid | perform_rts
    rts_end = perform_rts

    if rts_mode == "full":
        rts_member = np.ones(n, bool)
        rts_end = np.zeros(n, bool)
        rts_end[n - 1] = True
    return avail, rts_member, rts_end


# ---------------------------------------------------------------------------
# Element packing (carries cross the host boundary as flat vectors)
# ---------------------------------------------------------------------------


def _pack_fwd(e):
    return jnp.stack(list(e["A"]) + list(e["b"]) + list(e["C"]) + list(e["eta"]) + list(e["J"]))


def _unpack_fwd(v):
    return dict(
        A=tuple(v[i] for i in range(9)),
        b=tuple(v[9 + i] for i in range(3)),
        C=tuple(v[12 + i] for i in range(6)),
        eta=tuple(v[18 + i] for i in range(3)),
        J=tuple(v[21 + i] for i in range(6)),
    )


def _identity_fwd(m0, P0_diag, dtype):
    """The prior element (A=0, b=m₀, C=P₀, η=0, J=0) as a flat DEVICE carry.

    Built in host NumPy + device_put: the drivers call this eagerly once per
    fusion, and an on-device .at[].set build would compile several per-op
    XLA programs (seconds each over a tunneled TPU)."""
    v = np.zeros(27, np.dtype(jnp.dtype(dtype).name))
    v[9:12] = np.asarray(m0)
    v[12], v[15], v[17] = np.asarray(P0_diag)[:3]
    return jax.device_put(v)


def _filter_step_elements(avail, d, Qd_diag, zs, R_diag, dtype):
    """Per-step filtering five-tuple elements (diagonal Q/R, H = I) for one
    chunk — shared by the forward fusion kernel and the robust gate kernel
    (models.robust). Same algebra as kalman_parallel.parallel_position_filter."""
    L = d.shape[0]
    zeros = jnp.zeros((L,), dtype)
    S = Qd_diag + R_diag[None, :]
    K = Qd_diag / S
    IK = 1.0 - K
    ikd = jnp.where(avail[:, None], IK, 1.0)
    A = (ikd[:, 0], zeros, zeros, zeros, ikd[:, 1], zeros, zeros, zeros, ikd[:, 2])
    b_arr = jnp.where(avail[:, None], IK * d + K * zs, d)
    b = tuple(b_arr[:, i] for i in range(3))
    Cd = jnp.where(avail[:, None], IK * Qd_diag, Qd_diag)
    C = (Cd[:, 0], zeros, zeros, Cd[:, 1], zeros, Cd[:, 2])
    eta_arr = jnp.where(avail[:, None], (zs - d) / S, 0.0)
    eta = tuple(eta_arr[:, i] for i in range(3))
    Jd = jnp.where(avail[:, None], 1.0 / S, 0.0)
    J = (Jd[:, 0], zeros, zeros, Jd[:, 1], zeros, Jd[:, 2])
    return dict(A=A, b=b, C=C, eta=eta, J=J)


# ---------------------------------------------------------------------------
# Jitted chunk kernels (cached per (L, dtype, config) via lru_cache)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def _fwd_kernel(ekf_cfg: EKFConfig, dtype_name: str, scan_fn=None, platform: str = "cpu"):
    dtype = jnp.dtype(dtype_name)
    scan = scan_fn or jax.lax.associative_scan
    # Off-CPU, run the chunk's filtering scan as ONE Pallas kernel: the
    # single-kernel VMEM ladder when the chunk fits the budget, the
    # HBM-tiled grid-carried kernel beyond it (131k-element chunks × 27
    # leaves) — instead of lax's ~2·log₂L fusion rounds per chunk.
    filter_scan = _maybe_pallas_scan(scan, _FILTER_IDENTITY, platform)

    @jax.jit
    def kernel(times, pos, quats, z, avail, q_carry, elem_carry):
        """One forward chunk over L steps (L+1 poses incl. the overlap pose).

        Returns (q_f (L,4) for poses 1..L of the chunk, m_f (L,3),
        P_f6 (L,6), d (L,3), Qd (L,3), new_q_carry, new_elem_carry)."""
        params = ekf_params(ekf_cfg, dtype=dtype)
        Q_pos_diag = jnp.diag(params.Q_per_sec)[:3].astype(dtype)
        R_diag = jnp.diag(params.R).astype(dtype)

        dp, dq = se3.relative_poses_along(pos, quats)  # (L,·)
        qf = parallel_quat_chain(q_carry, dq, scan_fn=scan, platform=platform)  # (L+1,4)
        d = quat.rotate(qf[:-1], dp)  # (L,3)

        dt = jnp.maximum(1e-6, times[1:] - times[:-1])
        Qd_diag = Q_pos_diag[None, :] * dt[:, None]
        zs = jnp.nan_to_num(z, nan=0.0)

        steps = _filter_step_elements(avail, d, Qd_diag, zs, R_diag, dtype)

        carry = _unpack_fwd(elem_carry)
        cat = lambda c, rest: jnp.concatenate([c[None], rest])  # noqa: E731
        elems = {
            k: tuple(cat(c, r) for c, r in zip(carry[k], steps[k]))
            for k in ("A", "b", "C", "eta", "J")
        }
        out = filter_scan(_combine_filter, elems)
        m_f = jnp.stack([out["b"][i][1:] for i in range(3)], axis=-1)
        P_f6 = jnp.stack([out["C"][i][1:] for i in range(6)], axis=-1)
        last = jax.tree.map(lambda x: x[-1], out)
        return (
            qf[1:],
            m_f,
            P_f6,
            d,
            Qd_diag,
            qf[-1],
            _pack_fwd(last),
        )

    return kernel


@lru_cache(maxsize=16)
def _bwd_kernel(dtype_name: str, scan_fn=None, platform: str = "cpu"):
    dtype = jnp.dtype(dtype_name)
    scan = scan_fn or jax.lax.associative_scan
    # Same single-kernel upgrade as _fwd_kernel, for the RTS suffix scan.
    rts_scan = _maybe_pallas_scan(scan, _RTS_IDENTITY, platform)

    @jax.jit
    def kernel(m_f, P_f6, d, Qd_diag, interior, carry_M, carry_c):
        """One backward (RTS) chunk over L steps.

        ``m_f``/``P_f6`` are the filtered stats at the chunk's pose indices
        k (the LEFT pose of each step), ``interior`` marks RTS-interior
        steps. Returns (m_s (L,3), new_carry_M (9,), new_carry_c (3,))."""
        L = d.shape[0]
        zero = jnp.zeros((L,), dtype)
        Qd_m = (
            Qd_diag[:, 0], zero, zero,
            zero, Qd_diag[:, 1], zero,
            zero, zero, Qd_diag[:, 2],
        )
        Pf_m = _sym_expand(tuple(P_f6[:, i] for i in range(6)))
        E = _mmul(Pf_m, _minv(_madd(Pf_m, Qd_m)))
        E = tuple(jnp.where(interior, e, zero) for e in E)
        mf_v = tuple(m_f[:, i] for i in range(3))
        m_p_next = tuple(m + dd for m, dd in zip(mf_v, tuple(d[:, i] for i in range(3))))
        c_full = _vsub(mf_v, _mvec(E, m_p_next))
        c = tuple(jnp.where(interior, cf, mf) for cf, mf in zip(c_full, mf_v))

        cat = lambda arr, tail: jnp.concatenate([arr, tail[None]])  # noqa: E731
        Mc = dict(
            M=tuple(cat(e, carry_M[i]) for i, e in enumerate(E)),
            c=tuple(cat(ci, carry_c[i]) for i, ci in enumerate(c)),
        )

        def combine(earlier, later):
            M2, c2 = earlier["M"], earlier["c"]
            M1, c1 = later["M"], later["c"]
            return dict(M=_mmul(M1, M2), c=_vadd(_mvec(M1, c2), c1))

        out = rts_scan(combine, Mc, reverse=True)
        m_s = jnp.stack([out["c"][i][:-1] for i in range(3)], axis=-1)
        first = jax.tree.map(lambda x: x[0], out)
        return m_s, jnp.stack(first["M"]), jnp.stack(first["c"])

    return kernel


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


def fuse_ekf_rts_chunked(
    slam_times: np.ndarray,
    slam_pos: np.ndarray,
    slam_quat: np.ndarray,
    sim3_pos0: np.ndarray,
    sim3_quat0: np.ndarray,
    aligned_gps: np.ndarray,
    valid_mask: np.ndarray,
    ekf_cfg: EKFConfig = EKFConfig(),
    rts_cfg: RTSDecisionConfig = RTSDecisionConfig(),
    rts_mode: str = "outage",
    chunk_size: int = 262144,
    dtype=np.float64,
    out_pos: np.ndarray = None,
    out_quat: np.ndarray = None,
    scan_fn=None,
    platform: str = "auto",
) -> Tuple[np.ndarray, np.ndarray]:
    """EKF + RTS over a host-resident (possibly memmapped) trajectory of any
    length, streaming fixed-size chunks through the device.

    All inputs are NumPy arrays (or memmaps); device memory use is
    O(chunk_size). ``out_pos``/``out_quat`` may be preallocated (memmapped)
    outputs but must NOT alias the inputs — chunk transfers are software-
    pipelined (utils.streaming), so chunk i+1's input reads precede chunk
    i's output writes. Equivalent to
    ``kalman_parallel.fuse_ekf_rts_parallel`` — same element algebra,
    re-entered across chunks via carried composite elements.

    ``scan_fn`` (e.g. ``parallel.seqpar.sequence_parallel_scan(mesh)``)
    shards each chunk's associative scans over a device mesh — host chunks
    × device blocks, the >HBM form of sequence parallelism. Each scan runs
    over chunk_size+1 elements (the carried composite is element 0), so
    pick ``chunk_size = k·D − 1`` for a D-device mesh.

    ``platform``: resolution boundary for kernel dispatch inside the chunk
    kernels — "auto" resolves against ``scan_fn``'s mesh when it carries one
    (parallel.seqpar attaches it), else the process default (the device the
    chunk kernels actually dispatch on)."""
    if rts_cfg.default_ekf_transition_steps_on_sharp_turn != 0:
        raise ValueError("chunked scan requires hard updates (transition steps == 0)")
    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    platform = resolve_platform(platform, mesh=getattr(scan_fn, "mesh", None))
    n = len(slam_times)
    dtype = np.dtype(dtype)
    jdt = dtype.name
    avail, member, end = controls_numpy(
        slam_times, slam_quat, aligned_gps, valid_mask, rts_cfg, rts_mode
    )

    if out_pos is None:
        out_pos = np.empty((n, 3), dtype)
    if out_quat is None:
        out_quat = np.empty((n, 4), dtype)
    m_f_all = np.empty((n, 3), dtype)
    P_f6_all = np.empty((n, 6), dtype)
    d_all = np.empty((max(n - 1, 0), 3), dtype)
    Qd_all = np.empty((max(n - 1, 0), 3), dtype)

    # Prior carries built in HOST NumPy + device_put: the eager on-device
    # form (ekf_params diag + _identity_fwd .at sets) compiled ~10 per-op
    # XLA programs — ~10 s of a tunneled-TPU cold start for two tiny arrays.
    P0_diag = np.asarray(ekf_cfg.initial_cov_diag, dtype)[:3]

    fwd = _fwd_kernel(ekf_cfg, jdt, scan_fn, platform)
    q0 = np.asarray(sim3_quat0, dtype)
    m0 = np.asarray(sim3_pos0, dtype)
    q_carry = jax.device_put(q0)
    elem_carry = _identity_fwd(m0, P0_diag, jdt)

    # Pose 0 outputs.
    out_pos[0] = m0
    qn = q0 / max(np.linalg.norm(q0), 1e-30)
    out_quat[0] = qn
    m_f_all[0] = m0
    P_f6_all[0] = [P0_diag[0], 0.0, 0.0, P0_diag[1], 0.0, P0_diag[2]]

    # --- forward chunks over steps k = 0..n-2 (step k joins poses k,k+1) ---
    # Software-pipelined (utils.streaming): while the device runs chunk i,
    # the host stages chunk i+1 and drains chunk i-1 — only the carry chain
    # serialises the kernel launches themselves.
    L = int(chunk_size)

    def _fwd_stage(ab):
        a, b = ab
        # Pad the last chunk to the fixed kernel shape with repeats (zero
        # motion, invalid GPS — inert steps whose outputs are discarded;
        # carries are unused after the final chunk, so their pollution by
        # padded steps is harmless).
        lb = b - a
        sl_t = np.asarray(slam_times[a : b + 1], dtype)
        sl_p = np.asarray(slam_pos[a : b + 1], dtype)
        sl_q = np.asarray(slam_quat[a : b + 1], dtype)
        z = np.asarray(aligned_gps[a + 1 : b + 1], dtype)
        av = avail[a + 1 : b + 1]
        if lb < L:
            padp = L - lb
            sl_t = np.concatenate([sl_t, sl_t[-1] + 1e-3 * np.arange(1, padp + 1)])
            sl_p = np.concatenate([sl_p, np.repeat(sl_p[-1:], padp, 0)])
            sl_q = np.concatenate([sl_q, np.repeat(sl_q[-1:], padp, 0)])
            z = np.concatenate([z, np.zeros((padp, 3), dtype)])
            av = np.concatenate([av, np.zeros(padp, bool)])
        return tuple(jax.device_put(x) for x in (sl_t, sl_p, sl_q, z, av))

    def _fwd_launch(ab, staged):
        nonlocal q_carry, elem_carry
        qf, m_f, P_f6, d, Qd, q_carry, elem_carry = fwd(*staged, q_carry, elem_carry)
        return qf, m_f, P_f6, d, Qd

    def _fwd_drain(ab, launched):
        a, b = ab
        lb = b - a
        qf, m_f, P_f6, d, Qd = launched
        out_quat[a + 1 : b + 1] = np.asarray(qf)[:lb]
        m_f_all[a + 1 : b + 1] = np.asarray(m_f)[:lb]
        P_f6_all[a + 1 : b + 1] = np.asarray(P_f6)[:lb]
        d_all[a:b] = np.asarray(d)[:lb]
        Qd_all[a:b] = np.asarray(Qd)[:lb]

    streaming.stream_chunks(
        ((a, min(a + L, n - 1)) for a in range(0, n - 1, L)),
        _fwd_stage,
        _fwd_launch,
        _fwd_drain,
    )

    # --- backward chunks (suffix scan) ---
    bwd = _bwd_kernel(jdt, scan_fn, platform)
    interior_steps = member[:-1] & ~end[:-1] if n > 1 else np.zeros(0, bool)
    m_s_all = np.empty((n, 3), dtype)
    m_s_all[n - 1] = m_f_all[n - 1]
    # Anchor carry: (M=0, c=m_f[n-1]).
    carry_M = jax.device_put(np.zeros(9, dtype))
    carry_c = jax.device_put(np.asarray(m_f_all[n - 1], dtype))
    def _bwd_stage(ab):
        a, b = ab
        lb = b - a
        m_f = np.asarray(m_f_all[a:b], dtype)
        P_f6 = np.asarray(P_f6_all[a:b], dtype)
        d = d_all[a:b]
        Qd = Qd_all[a:b]
        it = interior_steps[a:b]
        if lb < L:
            padp = L - lb
            # Left-pad with inert identity steps (interior=False, m_f=0):
            # non-interior elements are (M=0, c=m_f) resets, so padding
            # rows produce pad outputs that we discard.
            m_f = np.concatenate([np.zeros((padp, 3), dtype), m_f])
            P_f6 = np.concatenate(
                [np.tile(np.asarray([1.0, 0, 0, 1.0, 0, 1.0], dtype), (padp, 1)), P_f6]
            )
            d = np.concatenate([np.zeros((padp, 3), dtype), d])
            Qd = np.concatenate([np.ones((padp, 3), dtype), Qd])
            it = np.concatenate([np.zeros(padp, bool), it])
        return tuple(jax.device_put(x) for x in (m_f, P_f6, d, Qd, it))

    def _bwd_launch(ab, staged):
        nonlocal carry_M, carry_c
        m_s, carry_M, carry_c = bwd(*staged, carry_M, carry_c)
        return m_s

    def _bwd_drain(ab, m_s):
        a, b = ab
        lb = b - a
        m_s_all[a:b] = np.asarray(m_s)[L - lb :] if lb < L else np.asarray(m_s)

    streaming.stream_chunks(
        ((max(b - L, 0), b) for b in range(n - 1, 0, -L)),
        _bwd_stage,
        _bwd_launch,
        _bwd_drain,
    )

    use = member[:, None]
    out_pos[:] = np.where(use, m_s_all, m_f_all)
    return out_pos, out_quat
