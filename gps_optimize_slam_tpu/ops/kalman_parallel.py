"""Temporally-parallel EKF fusion via `lax.associative_scan` (log-depth).

The sequential `ops.kalman` scans cost O(N) depth — thousands of dependent
steps of tiny matrix math dominate device time on TPU. This module computes
the SAME filter in O(log N) depth (Särkkä & García-Fernández, "Temporal
Parallelization of Bayesian Smoothers", IEEE TAC 2021), exploiting structure
specific to this problem:

* The 7×7 covariance stays block-diagonal forever: P₀ and Q are diagonal
  (config), H = [I₃ 0] observes positions only, so the Kalman gain's
  quaternion rows are identically zero — updates NEVER touch the quaternion
  state, and the quaternion covariance stays diagonal with a closed-form
  cumsum trajectory.
* Hence the fused quaternion chain is pure dead-reckoning:
  q_k = normalize(q₀ ⊗ δq₁ ⊗ … ⊗ δq_k) — an associative product scan
  (normalize∘⊗ is associative in exact arithmetic).
* Given the quaternions, the world-frame motion deltas d_k = R(q_{k-1})·δp_k
  are a vmap, and the position filter becomes an AFFINE Kalman filter
  (F = I, H = I₃) — exactly the associative-filtering setting, with
  five-tuple elements (A, b, C, η, J) combined in parallel.
* The RTS backward pass is an exact associative SUFFIX scan: the quaternion
  block is provably a no-op (q_f ≡ q_p, so the smoothing innovation is
  zero), and the position recursion x_s[k] = E_k x_s[k+1] + c_k is affine
  with E=0 resets at segment boundaries.

LAYOUT: all scan elements are STRUCTURE-OF-ARRAYS — a 3×3 matrix is nine
separate (N,) arrays, a vector three. Batched (N,3,3) arrays put the tiny
matrix in the minor dimensions where TPU tiling pads 3 lanes to 128
(measured 4× slower end-to-end and ~4× longer compiles); as (N,) leaves
every elementwise multiply-add is fully lane-packed on the VPU.

Valid whenever transition blending is off (effective transition steps ≡ 0 —
the reference's own default everywhere, SURVEY Q5); `fuse_core` selects this
path statically from the config. Matches the sequential scans to float
round-off (tested ≤1e-8 in f64 across outage/RTS scenarios, and the golden
seq-04 trajectory to ≤1e-6).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import EKFConfig, RTSDecisionConfig
from gps_optimize_slam_tpu.ops import quaternion as quat
from gps_optimize_slam_tpu.ops import se3
from gps_optimize_slam_tpu.ops.kalman import ekf_params, precompute_controls
from gps_optimize_slam_tpu.utils.precision import highp

# ---------------------------------------------------------------------------
# Scalar-component 3×3 algebra (structure-of-arrays; row-major 9-tuples)
# ---------------------------------------------------------------------------


def _v_from_batched(v):
    return tuple(v[..., i] for i in range(3))


def _v_to_batched(v):
    return jnp.stack(list(v), axis=-1)


def _mmul(a, b):
    return tuple(
        sum(a[3 * i + k] * b[3 * k + j] for k in range(3))
        for i in range(3)
        for j in range(3)
    )


def _mvec(a, v):
    return tuple(sum(a[3 * i + k] * v[k] for k in range(3)) for i in range(3))


def _mT(a):
    return tuple(a[3 * j + i] for i in range(3) for j in range(3))


def _madd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def _minv(m):
    """Adjugate inverse on scalar components."""
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = m
    c00 = m11 * m22 - m12 * m21
    c01 = m02 * m21 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c10 = m12 * m20 - m10 * m22
    c11 = m00 * m22 - m02 * m20
    c12 = m02 * m10 - m00 * m12
    c20 = m10 * m21 - m11 * m20
    c21 = m01 * m20 - m00 * m21
    c22 = m00 * m11 - m01 * m10
    inv_det = 1.0 / (m00 * c00 + m01 * c10 + m02 * c20)
    return tuple(c * inv_det for c in (c00, c01, c02, c10, c11, c12, c20, c21, c22))


def _meye_plus(m):
    """I + m on components."""
    out = list(m)
    out[0] = out[0] + 1.0
    out[4] = out[4] + 1.0
    out[8] = out[8] + 1.0
    return tuple(out)


def _maybe_pallas_scan(scan_fn, identity, platform: str):
    """Swap the DEFAULT scan for a platform-appropriate implementation.

    ``lax.associative_scan`` lowers to ~2·log₂N separate fusion rounds; at
    these trajectory sizes the scans are round-bound, not FLOP-bound (the
    three Kalman scans measure ~3.7 ms of the all-KITTI fused program while
    moving ~5 MB). Off-CPU, ``ops.pallas_scan`` runs the whole ladder as
    ONE kernel with the leaves VMEM-resident (the tiled HBM kernel beyond
    budget, lax for f64/non-1-D trees). On CPU the same unroll is a
    COMPILE-time disaster instead — XLA:CPU takes minutes on ~28 inlined
    copies of the 27-leaf combine — so the swap target is
    ``associative_scan_fori`` (the ladder as one fori_loop body, compiled
    once). Both need the combine's identity element, so the swap happens
    here where each scan's identity is known.

    A caller-provided scan_fn (e.g. parallel.seqpar's cross-device block
    scan) is respected — if it advertises ``bind_identity`` (seqpar does),
    it is handed the identity so its per-device LOCAL scans get the same
    treatment; the binder guards Pallas against its OWN mesh's platform
    (the only oracle that sees the shard_map target).

    ``platform`` is the RESOLVED compile platform (never "auto") — the
    caller resolves it against the devices the program will actually
    compile for (utils.backend.resolve_platform). Consulting the
    process-default oracle here broke MULTICHIP_r03: a CPU-mesh program
    traced under a TPU-default process bound non-interpret Mosaic kernels
    that XLA:CPU cannot lower.
    """
    if scan_fn is not jax.lax.associative_scan:
        bind = getattr(scan_fn, "bind_identity", None)
        if bind is None:
            return scan_fn
        return bind(identity)
    if platform == "cpu":
        from gps_optimize_slam_tpu.ops.pallas_scan import make_fori_scan

        return make_fori_scan(identity)
    from gps_optimize_slam_tpu.ops.pallas_scan import make_scan_fn

    return make_scan_fn(identity)


_FILTER_IDENTITY = dict(
    A=(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
    b=(0.0, 0.0, 0.0),
    C=(0.0,) * 6,
    eta=(0.0, 0.0, 0.0),
    J=(0.0,) * 6,
)
_RTS_IDENTITY = dict(
    M=(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
    c=(0.0, 0.0, 0.0),
)
_QUAT_IDENTITY = (0.0, 0.0, 0.0, 1.0)


def _sym_expand(s):
    """(xx,xy,xz,yy,yz,zz) → row-major 9-tuple, aliasing the same arrays.

    Zero-cost: the expanded tuple references the SAME traced values, so any
    product computed twice is CSE'd by XLA — only the scan element SHRINKS
    (the associative scan materialises every leaf at every log-level, so
    33→27 leaves is a direct HBM-traffic cut; VERDICT r1 weak #3)."""
    xx, xy, xz, yy, yz, zz = s
    return (xx, xy, xz, xy, yy, yz, xz, yz, zz)


def _sym_from9(m):
    """Upper triangle of a (numerically) symmetric 9-tuple."""
    return (m[0], m[1], m[2], m[4], m[5], m[8])


def _combine_filter(e1, e2):
    """Associative combination of filtering elements (Särkkä eq. 10),
    entirely on (N,) scalar components. C and J are SYMMETRIC and carried
    as 6 upper-triangle components."""
    A1, b1, eta1 = e1["A"], e1["b"], e1["eta"]
    A2, b2, eta2 = e2["A"], e2["b"], e2["eta"]
    C1, J1 = _sym_expand(e1["C"]), _sym_expand(e1["J"])
    C2, J2 = _sym_expand(e2["C"]), _sym_expand(e2["J"])
    M = _minv(_meye_plus(_mmul(C1, J2)))  # (I + C1 J2)⁻¹
    A2M = _mmul(A2, M)
    A = _mmul(A2M, A1)
    b = _vadd(_mvec(A2M, _vadd(b1, _mvec(C1, eta2))), b2)
    C = _madd(_mmul(_mmul(A2M, C1), _mT(A2)), C2)
    # (I + J2 C1)⁻¹ = Mᵀ for symmetric C1, J2.
    A1tMt = _mT(_mmul(M, A1))
    eta = _vadd(_mvec(A1tMt, _vsub(eta2, _mvec(J2, b1))), eta1)
    J = _madd(_mmul(_mmul(A1tMt, J2), A1), J1)
    return dict(A=A, b=b, C=_sym_from9(C), eta=eta, J=_sym_from9(J))


@highp
def parallel_quat_chain(
    init_quat: jnp.ndarray,
    dq: jnp.ndarray,
    scan_fn=jax.lax.associative_scan,
    platform: str = "auto",
) -> jnp.ndarray:
    """q_k = normalize(q₀ ⊗ δq₁ ⊗ … ⊗ δq_k) for all k, in log depth.

    SoA layout: four (N,) component arrays. ``scan_fn`` must implement the
    ``lax.associative_scan(combine, elems, reverse=...)`` contract — the
    default runs on one device; ``parallel.seqpar`` passes a cross-device
    scan to shard the pose axis over a mesh. ``platform`` gates the Pallas
    ladder swap and must be the resolved COMPILE platform when traced for
    non-default devices (utils.backend.resolve_platform)."""
    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    platform = resolve_platform(platform)

    def combine(a, b):
        x1, y1, z1, w1 = a
        x2, y2, z2, w2 = b
        x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
        y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
        z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
        w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
        n = jnp.sqrt(x * x + y * y + z * z + w * w)
        inv = jnp.where(n > 1e-9, 1.0 / jnp.where(n > 1e-9, n, 1.0), 1.0)
        return (x * inv, y * inv, z * inv, w * inv)

    qs = jnp.concatenate([quat.normalize(init_quat)[None], dq], axis=0)
    comps = tuple(qs[:, i] for i in range(4))
    out = _maybe_pallas_scan(scan_fn, _QUAT_IDENTITY, platform)(combine, comps)
    return jnp.stack(out, axis=-1)


@highp
def parallel_position_filter(
    m0: jnp.ndarray,  # (3,)
    P0: jnp.ndarray,  # (3,3)
    d: jnp.ndarray,  # (N-1,3) world-frame motion deltas
    Qd_diag: jnp.ndarray,  # (N-1,3) per-step process noise diag (Q_pos·dt)
    R_diag: jnp.ndarray,  # (3,) measurement noise diag
    z: jnp.ndarray,  # (N-1,3) measurements (arbitrary where invalid)
    avail: jnp.ndarray,  # (N-1,) bool
    scan_fn=jax.lax.associative_scan,
    platform: str = "auto",
):
    """Filtered means (N,3) and covariances of the affine KF x←x+d, H=I.

    Covariances are returned as the SYMMETRIC structure-of-arrays 6-tuple
    ``(xx, xy, xz, yy, yz, zz)`` of (N,) components — the caller's RTS pass
    consumes them directly, no (N,3,3) materialisation.

    Exploits DIAGONAL Q and R (the config's form): the per-step element
    matrices are diagonal, so element construction is elementwise; only the
    combine mixes components. ``platform``: see ``parallel_quat_chain``.
    """
    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    platform = resolve_platform(platform)
    n1 = d.shape[0]
    dtype = d.dtype
    zeros = jnp.zeros((n1,), dtype)

    # Diagonal S = Qd + R; K = Qd/S; IK = 1 − K (all (N-1,3)).
    S = Qd_diag + R_diag[None, :]
    K = Qd_diag / S
    IK = 1.0 - K

    def diag_m(v0, v1, v2):
        return (v0, zeros, zeros, zeros, v1, zeros, zeros, zeros, v2)

    def diag_s(v0, v1, v2):
        # Symmetric 6-tuple (xx,xy,xz,yy,yz,zz).
        return (v0, zeros, zeros, v1, zeros, v2)

    ikd = jnp.where(avail[:, None], IK, 1.0)
    A = diag_m(ikd[:, 0], ikd[:, 1], ikd[:, 2])
    b_arr = jnp.where(avail[:, None], IK * d + K * z, d)
    b = _v_from_batched(b_arr)
    Cd = jnp.where(avail[:, None], IK * Qd_diag, Qd_diag)
    C = diag_s(Cd[:, 0], Cd[:, 1], Cd[:, 2])
    eta_arr = jnp.where(avail[:, None], (z - d) / S, 0.0)
    eta = _v_from_batched(eta_arr)
    Jd = jnp.where(avail[:, None], 1.0 / S, 0.0)
    J = diag_s(Jd[:, 0], Jd[:, 1], Jd[:, 2])

    # Prior element 0: (A=0, b=m₀, C=P₀, η=0, J=0). The data-dependent prior
    # entries are CONCATENATED in directly rather than written with
    # ``.at[0].set`` — under GSPMD with the pose axis sharded, XLA:CPU
    # mispartitions that scatter and applies it at the local index 0 of
    # EVERY shard (first row of each block corrupted; found by
    # parallel.seqpar's parity test, rows 32/64/96/… on an 8-way mesh).
    def cat(prior_val, rest):
        prior = jnp.broadcast_to(jnp.asarray(prior_val, dtype), (1,))
        return jnp.concatenate([prior, rest])

    P0_d = jnp.diag(P0)
    C_prior = {0: P0_d[0], 3: P0_d[1], 5: P0_d[2]}  # diagonal 6-tuple slots
    elems = dict(
        A=tuple(cat(0.0, a) for a in A),
        b=tuple(cat(m0[i], r) for i, r in enumerate(b)),
        C=tuple(cat(C_prior.get(k, 0.0), c) for k, c in enumerate(C)),
        eta=tuple(cat(0.0, e) for e in eta),
        J=tuple(cat(0.0, j) for j in J),
    )

    out = _maybe_pallas_scan(scan_fn, _FILTER_IDENTITY, platform)(
        _combine_filter, elems
    )
    m_f = _v_to_batched(out["b"])
    return m_f, out["C"]


@highp
def fuse_ekf_rts_parallel(
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
    scan_fn=jax.lax.associative_scan,
    platform: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Log-depth equivalent of ``kalman.fuse_ekf_rts`` for hard-update
    configs (effective transition steps ≡ 0; guaranteed statically when
    rts_cfg.default_ekf_transition_steps_on_sharp_turn == 0).

    ``rts_mode``: "outage" (reference behaviour) or "full" (classic
    fixed-interval smoothing over the whole trajectory).

    ``scan_fn`` replaces ``lax.associative_scan`` in all three scans (quat
    chain, forward filter, RTS suffix) — ``parallel.seqpar`` passes the
    cross-device block scan so ONE trajectory shards its pose axis over a
    mesh; everything else here is elementwise/local and partitions cleanly
    under SPMD.

    ``platform`` gates the single-kernel Pallas ladder swap in all three
    scans and must be the resolved COMPILE platform when this is traced
    into a program targeting non-default devices (fuse_core passes its
    resolved config.platform; seqpar resolves against its mesh)."""
    if rts_cfg.default_ekf_transition_steps_on_sharp_turn != 0:
        raise ValueError(
            "parallel scan requires hard updates (transition steps == 0); "
            "use kalman.fuse_ekf_rts for blending configs"
        )
    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    platform = resolve_platform(platform)
    dtype = slam_pos.dtype

    controls = precompute_controls(
        slam_times, slam_quat, aligned_gps, valid_mask, rts_cfg
    )
    if rts_mode == "full":
        from gps_optimize_slam_tpu.ops.kalman import full_smoother_controls

        controls = full_smoother_controls(controls)
    params = ekf_params(ekf_cfg, dtype=dtype)
    Q_pos_diag = jnp.diag(params.Q_per_sec)[:3]
    P0_pos = params.P0[:3, :3]
    R_diag = jnp.diag(params.R)

    # --- quaternion chain + world-frame deltas (all parallel) ---
    dp, dq = se3.relative_poses_along(slam_pos, slam_quat)
    q_f = parallel_quat_chain(
        sim3_quat[0], dq, scan_fn=scan_fn, platform=platform
    )  # (N,4)
    d = quat.rotate(q_f[:-1], dp)  # (N-1,3)

    dt = jnp.maximum(1e-6, slam_times[1:] - slam_times[:-1])
    Qd_diag = Q_pos_diag[None, :] * dt[:, None]
    z = jnp.nan_to_num(aligned_gps[1:], nan=0.0)
    avail = controls.avail[1:]

    m_f, P_f6 = parallel_position_filter(
        sim3_pos[0], P0_pos, d, Qd_diag, R_diag, z, avail,
        scan_fn=scan_fn, platform=platform,
    )

    # --- RTS backward (exact associative suffix scan, positions only) ---
    # Predicted stats: m_p[k+1] = m_f[k] + d_k, P_p[k+1] = P_f[k] + Qd_k.
    # The QUATERNION block is provably a no-op: updates never touch it, so
    # q_f[k+1] = q_p[k+1] and the smoothing innovation is identically zero —
    # by backward induction q_s ≡ q_f.
    member = controls.rts_member
    end = controls.rts_end
    interior = member[:-1] & ~end[:-1]

    m_p_next = m_f[:-1] + d
    zero_n1 = jnp.zeros((d.shape[0],), dtype)
    Qd_m = (
        Qd_diag[:, 0], zero_n1, zero_n1,
        zero_n1, Qd_diag[:, 1], zero_n1,
        zero_n1, zero_n1, Qd_diag[:, 2],
    )
    Pf_m = tuple(c[:-1] for c in _sym_expand(P_f6))
    E = _mmul(Pf_m, _minv(_madd(Pf_m, Qd_m)))  # P_f[k] (P_f[k]+Qd)⁻¹
    czero = jnp.zeros_like(interior, dtype=dtype)
    E = tuple(jnp.where(interior, e, czero) for e in E)
    c_full = _vsub(_v_from_batched(m_f[:-1]), _mvec(E, _v_from_batched(m_p_next)))
    c = tuple(
        jnp.where(interior, cf, mf)
        for cf, mf in zip(c_full, _v_from_batched(m_f[:-1]))
    )

    # Anchor element at N-1 (M = 0, c = m_f[N-1]).
    Mc = dict(
        M=tuple(jnp.concatenate([e, jnp.zeros((1,), dtype)]) for e in E),
        c=tuple(
            jnp.concatenate([ci, m_f[-1:, i]]) for i, ci in enumerate(c)
        ),
    )

    def combine(earlier, later):
        # Suffix composition: with reverse=True the larger-k element arrives
        # as `earlier`; composite y_k = M_later (y_...) — verified against
        # the sequential backward pass in tests.
        M2, c2 = earlier["M"], earlier["c"]
        M1, c1 = later["M"], later["c"]
        return dict(M=_mmul(M1, M2), c=_vadd(_mvec(M1, c2), c1))

    out = _maybe_pallas_scan(scan_fn, _RTS_IDENTITY, platform)(
        combine, Mc, reverse=True
    )
    m_s = _v_to_batched(out["c"])

    use = member[:, None]
    return jnp.where(use, m_s, m_f), q_f
