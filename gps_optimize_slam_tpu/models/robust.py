"""Robust fusion: chi-square GNSS innovation gating + iterated smoothing.

Extension beyond the reference (BASELINE.json config 4: "iterated-EKF + RTS
smoother with chi-square GNSS outlier gating (dropout/noisy GPS)"). The
reference gates GPS outliers only in preprocessing (polynomial RANSAC); a
filter-consistent gate rejects measurements whose normalised innovation
squared (NIS) νᵀS⁻¹ν exceeds a χ²₃ threshold — catching outliers that are
locally plausible to a polynomial but inconsistent with the filter state.

Note on "iterated EKF": the measurement model here is LINEAR (H = [I₃ 0]),
so the classical IEKF relinearisation is a no-op; iteration is applied at
the SMOOTHER level instead — each pass re-runs the filter with the gate
evaluated against the previous pass's (smoother-informed) trajectory, which
is the fixed-point the IEKF analogy actually buys in this model family.

Gating changes GNSS availability, which drives the outage/RTS control flow —
so each pass: (1) a gate pass records the effective availability mask,
(2) the standard fusion (parallel scans) reruns with that mask. Two gate
forms share a fixed point: the sequential within-pass gate (lax.scan) and
the O(log N) parallel gate (``_parallel_nis`` — NIS scored against the
associative filter of the previous pass's decisions). All jittable, static
shapes. ``fuse_robust_chunked`` streams the parallel form over
host-resident trajectories of any length (>HBM robust fusion).
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.ops import kalman, kalman_parallel
from gps_optimize_slam_tpu.ops import quaternion as quat
from gps_optimize_slam_tpu.ops import se3
from gps_optimize_slam_tpu.utils.precision import highp

# 95th percentile of chi-square with 3 dof.
CHI2_3DOF_95 = 7.814727903251179


class RobustFusionResult(NamedTuple):
    positions: jnp.ndarray  # (N,3)
    quaternions: jnp.ndarray  # (N,4)
    accepted: jnp.ndarray  # (N,) bool — measurements that survived the gate
    nis: jnp.ndarray  # (N,) normalised innovation squared (0 where no meas)
    # () bool — the accept mask reached a fixed point within n_iterations.
    # False means consecutive outlier clusters may still mask each other
    # (decisions fold in one iteration late); rerun with more iterations.
    # (python bool default: a jnp default here would dispatch at import)
    gate_converged: jnp.ndarray = True


@highp
def _gated_availability(
    slam_times, slam_pos, slam_quat, init_pos, init_quat, aligned_gps,
    avail_eval, avail_update, params: kalman.EKFParams, gate: float,
    platform: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sequential forward pass computing the χ² gate decisions.

    The NIS gate is EVALUATED for every measurement in ``avail_eval`` (the
    original availability), while the filter state only UPDATES with
    measurements that pass the gate AND were accepted on the previous
    iteration (``avail_update``) — the fixed-point iteration re-admits
    measurements a transient outlier had pushed out. Returns
    (accepted (N,), nis (N,)). Only the 3×3 position block matters
    (covariance is block-diagonal, see ops.kalman_parallel).
    """
    dp, dq = se3.relative_poses_along(slam_pos, slam_quat)
    q_chain = kalman_parallel.parallel_quat_chain(init_quat, dq, platform=platform)
    d = quat.rotate(q_chain[:-1], dp)
    dt = jnp.maximum(1e-6, slam_times[1:] - slam_times[:-1])
    Q = params.Q_per_sec[:3, :3]
    R = params.R
    z = jnp.nan_to_num(aligned_gps[1:], nan=0.0)
    av_e = avail_eval[1:]
    av_u = avail_update[1:]

    def step(carry, inp):
        m, P = carry
        d_i, dt_i, z_i, ave_i, avu_i = inp
        m_pred = m + d_i
        P_pred = P + Q * dt_i
        S = P_pred + R
        nu = z_i - m_pred
        nis = nu @ jnp.linalg.solve(S, nu)
        accept = ave_i & (nis <= gate)
        use = accept & avu_i
        K = jnp.linalg.solve(S.T, P_pred.T).T  # P_pred S⁻¹ (H = I)
        m_upd = m_pred + K @ nu
        P_upd = (jnp.eye(3, dtype=P.dtype) - K) @ P_pred
        m_new = jnp.where(use, m_upd, m_pred)
        P_new = jnp.where(use, P_upd, P_pred)
        return (m_new, P_new), (accept, jnp.where(ave_i, nis, 0.0))

    init = (init_pos, params.P0[:3, :3])
    _, (acc, nis) = jax.lax.scan(step, init, (d, dt, z, av_e, av_u))
    accepted = jnp.concatenate([avail_eval[:1], acc])
    nis_full = jnp.concatenate([jnp.zeros((1,), nis.dtype), nis])
    return accepted, nis_full


@highp
def _parallel_nis(
    slam_times, slam_pos, slam_quat, init_pos, init_quat, aligned_gps,
    avail_eval, avail_update, params: kalman.EKFParams, gate: float,
    platform: str = "auto", scan_fn=jax.lax.associative_scan,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """O(log N) gate pass: filter with ``avail_update`` via the associative
    position filter, then score every candidate measurement's one-step-ahead
    NIS against the FILTERED state in parallel.

    Differs from ``_gated_availability`` only mid-iteration: that pass folds
    each gate decision into the filter state immediately (within-pass
    sequential coupling), this one folds decisions in on the NEXT iteration.
    Both fixed points coincide — when ``accepted == avail_update`` the two
    recursions are the same filter, and Q/R/P₀ are diagonal so the full-
    covariance solve there equals the diagonal division here. This is the
    TPU-scalable form (three parallel scans instead of an N-step lax.scan)
    and the one the chunked driver streams.
    """
    dtype = slam_pos.dtype
    dp, dq = se3.relative_poses_along(slam_pos, slam_quat)
    q_chain = kalman_parallel.parallel_quat_chain(
        init_quat, dq, scan_fn=scan_fn, platform=platform
    )
    d = quat.rotate(q_chain[:-1], dp)
    dt = jnp.maximum(1e-6, slam_times[1:] - slam_times[:-1])
    Q_pos_diag = jnp.diag(params.Q_per_sec)[:3].astype(dtype)
    R_diag = jnp.diag(params.R).astype(dtype)
    Qd_diag = Q_pos_diag[None, :] * dt[:, None]
    z = jnp.nan_to_num(aligned_gps[1:], nan=0.0)

    m_f, P_f6 = kalman_parallel.parallel_position_filter(
        init_pos, params.P0[:3, :3], d, Qd_diag, R_diag, z,
        avail_update[1:], scan_fn=scan_fn, platform=platform,
    )
    # One-step-ahead prediction for step k (pose k+1) from pose k's
    # filtered state; P stays diagonal (diagonal Q, R, P₀ and H = I).
    Pf_diag = jnp.stack([P_f6[0], P_f6[3], P_f6[5]], axis=-1)  # (N,3)
    m_pred = m_f[:-1] + d
    S_diag = Pf_diag[:-1] + Qd_diag + R_diag[None, :]
    nu = z - m_pred
    nis = jnp.sum(nu * nu / S_diag, axis=-1)
    av_e = avail_eval[1:]
    accept = av_e & (nis <= gate)
    accepted = jnp.concatenate([avail_eval[:1], accept])
    nis_full = jnp.concatenate(
        [jnp.zeros((1,), nis.dtype), jnp.where(av_e, nis, 0.0)]
    )
    return accepted, nis_full


def fuse_robust(
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    slam_quat: jnp.ndarray,
    sim3_pos: jnp.ndarray,
    sim3_quat: jnp.ndarray,
    aligned_gps: jnp.ndarray,
    valid_mask: jnp.ndarray,
    ekf_cfg: EKFConfig = EKFConfig(),
    rts_cfg: RTSDecisionConfig = RTSDecisionConfig(),
    gate_chi2: float = CHI2_3DOF_95,
    n_iterations: int = 2,
    scan: str = "auto",
    platform: str = "auto",
    gate_mode: str = "sequential",
) -> RobustFusionResult:
    """EKF + RTS fusion with χ²-gated GNSS updates, iterated to a fixed
    point of the gate decisions.

    ``scan`` mirrors FusionConfig.ekf_scan: "auto" resolves to the O(log N)
    associative path on accelerators and the sequential scan on CPU (whose
    associative-path compile is minutes-slow on XLA:CPU); both produce the
    same trajectory. ``platform`` mirrors FusionConfig.platform — "auto"
    resolves against the process default HERE, outside the jit; callers
    compiling for non-default devices pass the resolved value.

    ``gate_mode``: "sequential" folds each gate decision into the filter
    state within the pass (an N-step lax.scan); "parallel" scores all NIS
    values against the associative filter of the PREVIOUS pass's decisions
    (three O(log N) scans — the TPU-scalable form, and the semantics
    ``fuse_robust_chunked`` streams at >HBM scale). Fixed points coincide;
    mid-iteration decisions can differ only for measurements whose
    acceptance flips within one pass."""
    if platform == "auto":
        from gps_optimize_slam_tpu.utils.backend import resolve_platform

        platform = resolve_platform()
    res = _fuse_robust(
        slam_times, slam_pos, slam_quat, sim3_pos, sim3_quat, aligned_gps,
        valid_mask, ekf_cfg, rts_cfg, gate_chi2, n_iterations, scan, platform,
        gate_mode,
    )
    # One scalar fetch: surface gate truncation at the user-facing boundary
    # (heavily contaminated data where consecutive outlier clusters mask
    # each other can need more than the default two passes).
    import numpy as _np

    if not bool(_np.asarray(res.gate_converged)):
        from gps_optimize_slam_tpu.utils.logging import get_logger

        get_logger().warning(
            "robust gate accept mask did not reach a fixed point within "
            "n_iterations=%d; rerun with a larger n_iterations (result "
            "carries gate_converged=False).",
            n_iterations,
        )
    return res


# n_iterations is TRACED (a while_loop bound), not static: rerunning with a
# larger cap — the documented move for heavily contaminated data — reuses
# the compiled program instead of re-tracing it.
@partial(
    jax.jit,
    static_argnames=("ekf_cfg", "rts_cfg", "scan", "platform", "gate_mode"),
)
def _fuse_robust(
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    slam_quat: jnp.ndarray,
    sim3_pos: jnp.ndarray,
    sim3_quat: jnp.ndarray,
    aligned_gps: jnp.ndarray,
    valid_mask: jnp.ndarray,
    ekf_cfg: EKFConfig = EKFConfig(),
    rts_cfg: RTSDecisionConfig = RTSDecisionConfig(),
    gate_chi2: float = CHI2_3DOF_95,
    n_iterations: int = 2,
    scan: str = "auto",
    platform: str = "cpu",
    gate_mode: str = "sequential",
) -> RobustFusionResult:
    dtype = slam_pos.dtype
    params = kalman.ekf_params(ekf_cfg, dtype=dtype)
    avail = valid_mask & ~jnp.any(jnp.isnan(aligned_gps), axis=-1)

    gate_fn = _gated_availability if gate_mode == "sequential" else _parallel_nis

    def gate_once(accepted):
        return gate_fn(
            slam_times, slam_pos, slam_quat, sim3_pos[0], sim3_quat[0],
            aligned_gps, avail, accepted, params, gate_chi2, platform=platform,
        )

    # Iterate the gate to a FIXED POINT of the accept mask, capped at
    # n_iterations (lax.while_loop: converged masks exit early and pay no
    # further scans). ``changed`` False on exit ⇒ the final pass left the
    # mask unchanged ⇒ fixed point reached — otherwise the cap truncated
    # the iteration and gate_converged is False (see RobustFusionResult;
    # heavily contaminated data may need a larger n_iterations because
    # parallel/chunked decisions only take effect one iteration late).
    def cond(state):
        i, _, _, changed = state
        return (i < n_iterations) & changed

    def body(state):
        i, accepted, _, _ = state
        new_accepted, new_nis = gate_once(accepted)
        return (
            i + 1,
            new_accepted,
            new_nis,
            jnp.any(new_accepted != accepted),
        )

    _, accepted, nis, changed = jax.lax.while_loop(
        cond, body, (0, avail, jnp.zeros(avail.shape, dtype), jnp.asarray(True))
    )
    gate_converged = ~changed

    use_parallel = scan == "parallel" or (
        scan == "auto"
        and rts_cfg.default_ekf_transition_steps_on_sharp_turn == 0
        and platform != "cpu"
    )
    kw = {"platform": platform} if use_parallel else {}
    fuse_fn = (
        kalman_parallel.fuse_ekf_rts_parallel if use_parallel else kalman.fuse_ekf_rts
    )
    pos, q = fuse_fn(
        slam_times, slam_pos, slam_quat, sim3_pos, sim3_quat,
        jnp.where(accepted[:, None], aligned_gps, jnp.nan),
        accepted, ekf_cfg, rts_cfg,
        **kw,
    )
    return RobustFusionResult(
        positions=pos,
        quaternions=q,
        accepted=accepted,
        nis=nis,
        gate_converged=gate_converged,
    )


# ---------------------------------------------------------------------------
# Out-of-core (chunked) robust fusion — the >HBM form of fuse_robust.
#
# The gate iteration streams fixed-size chunks through the device exactly
# like ops.kalman_chunked's forward pass (re-entrant composite-element
# carries), computing each candidate measurement's one-step-ahead NIS
# against the filtered state IN PARALLEL within the chunk (_parallel_nis
# semantics — gate decisions fold in on the next iteration). The final
# fused trajectory then runs through kalman_chunked.fuse_ekf_rts_chunked
# with the gated availability.
# ---------------------------------------------------------------------------


@_lru_cache(maxsize=8)
def _gate_chunk_kernel(
    ekf_cfg: EKFConfig, dtype_name: str, scan_fn=None, platform: str = "cpu"
):
    """Jitted one-chunk gate pass: (L+1 poses, L candidate steps) →
    (accept (L,), nis (L,), new q_carry, new elem_carry)."""
    from gps_optimize_slam_tpu.ops.kalman_chunked import (
        _filter_step_elements,
        _pack_fwd,
        _unpack_fwd,
    )
    from gps_optimize_slam_tpu.ops.kalman_parallel import (
        _FILTER_IDENTITY,
        _combine_filter,
        _maybe_pallas_scan,
    )

    dtype = jnp.dtype(dtype_name)
    scan = scan_fn or jax.lax.associative_scan
    filter_scan = _maybe_pallas_scan(scan, _FILTER_IDENTITY, platform)

    @jax.jit
    def kernel(times, pos, quats, z, av_e, av_u, gate, q_carry, elem_carry):
        params = kalman.ekf_params(ekf_cfg, dtype=dtype)
        Q_pos_diag = jnp.diag(params.Q_per_sec)[:3].astype(dtype)
        R_diag = jnp.diag(params.R).astype(dtype)

        dp, dq = se3.relative_poses_along(pos, quats)
        qf = kalman_parallel.parallel_quat_chain(
            q_carry, dq, scan_fn=scan, platform=platform
        )
        d = quat.rotate(qf[:-1], dp)
        dt = jnp.maximum(1e-6, times[1:] - times[:-1])
        Qd_diag = Q_pos_diag[None, :] * dt[:, None]
        zs = jnp.nan_to_num(z, nan=0.0)

        steps = _filter_step_elements(av_u, d, Qd_diag, zs, R_diag, dtype)
        carry = _unpack_fwd(elem_carry)
        cat = lambda c, rest: jnp.concatenate([c[None], rest])  # noqa: E731
        elems = {
            k: tuple(cat(c, r) for c, r in zip(carry[k], steps[k]))
            for k in ("A", "b", "C", "eta", "J")
        }
        out = filter_scan(_combine_filter, elems)
        # Row 0 is the carried filtered state at the chunk's first pose, so
        # m_f[:-1]/Pf[:-1] are the one-step-back states for steps 0..L-1.
        m_f = jnp.stack([out["b"][i] for i in range(3)], axis=-1)  # (L+1,3)
        Pf_diag = jnp.stack(
            [out["C"][0], out["C"][3], out["C"][5]], axis=-1
        )  # (L+1,3) — diagonal P (diagonal Q/R/P₀, H = I)
        m_pred = m_f[:-1] + d
        S_nis = Pf_diag[:-1] + Qd_diag + R_diag[None, :]
        nu = zs - m_pred
        nis = jnp.sum(nu * nu / S_nis, axis=-1)
        accept = av_e & (nis <= gate)
        last = jax.tree.map(lambda x: x[-1], out)
        return accept, jnp.where(av_e, nis, 0.0), qf[-1], _pack_fwd(last)

    return kernel


def gated_availability_chunked(
    slam_times,
    slam_pos,
    slam_quat,
    init_pos,
    init_quat,
    aligned_gps,
    avail_eval,
    avail_update,
    ekf_cfg: EKFConfig = EKFConfig(),
    gate_chi2: float = CHI2_3DOF_95,
    chunk_size: int = 262144,
    dtype=None,
    scan_fn=None,
    platform: str = "auto",
):
    """One χ² gate pass over a host-resident trajectory of any length.

    NumPy/memmap inputs, O(chunk_size) device residency; software-pipelined
    like kalman_chunked. Semantics = ``_parallel_nis`` (decisions fold in on
    the next iteration); at the gate fixed point this equals the sequential
    in-core gate. Returns host arrays (accepted (N,), nis (N,))."""
    import numpy as np

    from gps_optimize_slam_tpu.ops.kalman_chunked import _identity_fwd
    from gps_optimize_slam_tpu.utils import streaming
    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    platform = resolve_platform(platform, mesh=getattr(scan_fn, "mesh", None))
    n = len(slam_times)
    dtype = np.dtype(dtype or np.asarray(slam_pos).dtype)
    jdt = dtype.name
    accepted = np.empty(n, bool)
    nis_all = np.zeros(n, dtype)
    accepted[0] = bool(avail_eval[0])

    # Host-NumPy prior build (see kalman_chunked._identity_fwd): the eager
    # on-device form compiled ~10 per-op programs per fusion.
    P0_diag = np.asarray(ekf_cfg.initial_cov_diag, dtype)[:3]
    kern = _gate_chunk_kernel(ekf_cfg, jdt, scan_fn, platform)
    q_carry = jax.device_put(np.asarray(init_quat, dtype))
    elem_carry = _identity_fwd(np.asarray(init_pos, dtype), P0_diag, jdt)
    gate = jax.device_put(np.asarray(gate_chi2, dtype))
    L = int(chunk_size)

    def _stage(ab):
        a, b = ab
        lb = b - a
        sl_t = np.asarray(slam_times[a : b + 1], dtype)
        sl_p = np.asarray(slam_pos[a : b + 1], dtype)
        sl_q = np.asarray(slam_quat[a : b + 1], dtype)
        z = np.asarray(aligned_gps[a + 1 : b + 1], dtype)
        ave = np.asarray(avail_eval[a + 1 : b + 1], bool)
        avu = np.asarray(avail_update[a + 1 : b + 1], bool)
        if lb < L:
            padp = L - lb
            sl_t = np.concatenate([sl_t, sl_t[-1] + 1e-3 * np.arange(1, padp + 1)])
            sl_p = np.concatenate([sl_p, np.repeat(sl_p[-1:], padp, 0)])
            sl_q = np.concatenate([sl_q, np.repeat(sl_q[-1:], padp, 0)])
            z = np.concatenate([z, np.zeros((padp, 3), dtype)])
            ave = np.concatenate([ave, np.zeros(padp, bool)])
            avu = np.concatenate([avu, np.zeros(padp, bool)])
        return tuple(jax.device_put(x) for x in (sl_t, sl_p, sl_q, z, ave, avu))

    def _launch(ab, staged):
        nonlocal q_carry, elem_carry
        acc, nis, q_carry, elem_carry = kern(*staged, gate, q_carry, elem_carry)
        return acc, nis

    def _drain(ab, launched):
        a, b = ab
        lb = b - a
        acc, nis = launched
        accepted[a + 1 : b + 1] = np.asarray(acc)[:lb]
        nis_all[a + 1 : b + 1] = np.asarray(nis)[:lb]

    streaming.stream_chunks(
        ((a, min(a + L, n - 1)) for a in range(0, n - 1, L)),
        _stage,
        _launch,
        _drain,
    )
    return accepted, nis_all


def fuse_robust_chunked(
    slam_times,
    slam_pos,
    slam_quat,
    sim3_pos0,
    sim3_quat0,
    aligned_gps,
    valid_mask,
    ekf_cfg: EKFConfig = EKFConfig(),
    rts_cfg: RTSDecisionConfig = RTSDecisionConfig(),
    rts_mode: str = "outage",
    gate_chi2: float = CHI2_3DOF_95,
    n_iterations: int = 2,
    chunk_size: int = 262144,
    dtype=None,
    out_pos=None,
    out_quat=None,
    scan_fn=None,
    platform: str = "auto",
):
    """χ²-gated EKF + RTS over a host-resident trajectory of any length —
    ``fuse_robust(gate_mode="parallel")`` at >HBM scale.

    Returns (pos (N,3), quat (N,4), accepted (N,), nis (N,)) host arrays;
    ``out_pos``/``out_quat`` may be preallocated memmaps (see
    kalman_chunked.fuse_ekf_rts_chunked for the aliasing rule)."""
    import numpy as np

    from gps_optimize_slam_tpu.ops import kalman_chunked

    n = len(slam_times)
    dtype = np.dtype(dtype or np.asarray(slam_pos).dtype)
    avail = np.asarray(valid_mask, bool) & ~np.isnan(
        np.asarray(aligned_gps)
    ).any(-1)
    accepted = avail.copy()
    nis = np.zeros(n, dtype)
    # Fixed-point iteration with early exit + truncation warning — the
    # host-streamed mirror of _fuse_robust's while_loop (decisions fold in
    # one iteration late, so unconverged masks can hide clustered outliers).
    converged = True
    for _ in range(n_iterations):
        prev = accepted
        accepted, nis = gated_availability_chunked(
            slam_times, slam_pos, slam_quat, sim3_pos0, sim3_quat0,
            aligned_gps, avail, accepted,
            ekf_cfg=ekf_cfg, gate_chi2=gate_chi2, chunk_size=chunk_size,
            dtype=dtype, scan_fn=scan_fn, platform=platform,
        )
        converged = bool(np.array_equal(accepted, prev))
        if converged:
            break
    if not converged:
        from gps_optimize_slam_tpu.utils.logging import get_logger

        get_logger().warning(
            "chunked robust gate accept mask did not reach a fixed point "
            "within n_iterations=%d; rerun with a larger n_iterations.",
            n_iterations,
        )
    gated_gps = np.where(accepted[:, None], np.asarray(aligned_gps), np.nan).astype(
        dtype
    )
    pos, quatn = kalman_chunked.fuse_ekf_rts_chunked(
        slam_times, slam_pos, slam_quat, sim3_pos0, sim3_quat0,
        gated_gps, accepted,
        ekf_cfg=ekf_cfg, rts_cfg=rts_cfg, rts_mode=rts_mode,
        chunk_size=chunk_size, dtype=dtype, out_pos=out_pos, out_quat=out_quat,
        scan_fn=scan_fn, platform=platform,
    )
    return pos, quatn, accepted, nis
