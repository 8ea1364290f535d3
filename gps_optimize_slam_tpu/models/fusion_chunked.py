"""Out-of-core fusion driver: RAW GNSS + SLAM streams of any length.

The chunked counterpart of ``models.fusion.fuse_core`` (the reference's
whole 7-step recipe, EKFGPSSLAM.py:940-1123): temporal alignment
(``ops.alignment_chunked``), Sim3 window selection + streaming
RANSAC/Umeyama, trajectory transform, and the re-entrant associative
EKF+RTS (``ops.kalman_chunked``) — every stage O(chunk) device-resident,
host arrays may be memmaps. Use this when a trajectory exceeds device
memory; for anything that fits, ``fuse_core`` is one fused program and
strictly faster.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import FusionConfig
from gps_optimize_slam_tpu.ops import alignment_chunked, kalman_chunked, metrics, se3
from gps_optimize_slam_tpu.ops.umeyama import Sim3
from gps_optimize_slam_tpu.utils import streaming


class ChunkedFusionResult(NamedTuple):
    corrected_pos: np.ndarray  # (N,3)
    corrected_quat: np.ndarray  # (N,4)
    sim3: Sim3
    aligned_gps: np.ndarray  # (N,3)
    gps_valid: np.ndarray  # (N,)
    num_inliers: int
    ok: bool
    # χ²-gated robust fusion (models.robust.fuse_robust_chunked), when
    # requested: the measurements that survived the gate (None otherwise;
    # corrected_pos/quat then hold the robust trajectory).
    robust_accepted: Optional[np.ndarray] = None


@lru_cache(maxsize=8)
def _transform_kernel(dtype_name: str):
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def kernel(pos, quat, R, t, s):
        return se3.transform_trajectory(
            pos.astype(dtype), quat.astype(dtype), R, t, s
        )

    return kernel


def transform_trajectory_chunked(
    slam_pos,
    slam_quat,
    sim3: Sim3,
    chunk_size: int = 262144,
    dtype=np.float64,
    out_pos: Optional[np.ndarray] = None,
    out_quat: Optional[np.ndarray] = None,
):
    """``se3.transform_trajectory`` streamed over host chunks (software-
    pipelined; ``out_*`` must not alias the inputs)."""
    n = len(slam_pos)
    dtype = np.dtype(dtype)
    if out_pos is None:
        out_pos = np.empty((n, 3), dtype)
    if out_quat is None:
        out_quat = np.empty((n, 4), dtype)
    kernel = _transform_kernel(dtype.name)
    # device_put of host-converted params (no eager per-op convert compiles)
    R = jax.device_put(np.asarray(np.asarray(sim3.R), dtype))
    t = jax.device_put(np.asarray(np.asarray(sim3.t), dtype))
    s = jax.device_put(np.asarray(np.asarray(sim3.scale), dtype))

    def _stage(ab):
        a, b = ab
        return (
            jax.device_put(np.asarray(slam_pos[a:b], dtype)),
            jax.device_put(np.asarray(slam_quat[a:b], dtype)),
        )

    def _drain(ab, pq):
        a, b = ab
        out_pos[a:b] = np.asarray(pq[0])
        out_quat[a:b] = np.asarray(pq[1])

    streaming.stream_chunks(
        ((a, min(a + chunk_size, n)) for a in range(0, n, chunk_size)),
        _stage,
        lambda ab, staged: kernel(*staged, R, t, s),
        _drain,
    )
    return out_pos, out_quat


@lru_cache(maxsize=8)
def _nn_block_kernel(dtype_name: str, platform: str):
    """Jitted block step of the streamed NN metric: fold one candidate block
    into the running per-point minimum distance. On TPU the block itself runs
    the tiled Pallas kernel (metrics.nn_errors_auto dispatch; ``platform`` is
    the caller-resolved compile platform)."""
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def kernel(running, traj, cands, tmask, cmask):
        e = metrics.nn_errors_auto(
            traj.astype(dtype), cands.astype(dtype), tmask, cmask,
            platform=platform,
        )
        return jnp.minimum(running, e)

    return kernel


@lru_cache(maxsize=8)
def _ate_block_kernel(dtype_name: str):
    dtype = jnp.dtype(dtype_name)

    @jax.jit
    def kernel(traj, ref, mask):
        return metrics.paired_errors(
            traj.astype(dtype), ref.astype(dtype), mask
        )

    return kernel


def _pad_rows(arr: np.ndarray, size: int) -> np.ndarray:
    if arr.shape[0] == size:
        return arr
    pad = np.zeros((size - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def nn_errors_streamed(
    traj_chunk_fn,
    n: int,
    candidates: np.ndarray,
    cand_mask: np.ndarray,
    traj_mask: np.ndarray,
    chunk_size: int = 65536,
    dtype=np.float64,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Reference NN metric (EKFGPSSLAM.py:1030-1031, quirk Q6) streamed over
    host chunks: per-point min distance to any valid candidate, with device
    residency O(chunk²) work / O(chunk) memory — no (N, M) matrix, no full
    trajectory on device. ``traj_chunk_fn(a, b)`` yields trajectory rows
    [a, b) so the Sim3 trajectory can be produced on the fly; ``candidates``
    / masks are host (memmappable) arrays. Invalid points get +inf, matching
    ``metrics.nn_errors``. All chunks are padded to ``chunk_size`` so exactly
    one program is compiled per dtype."""
    dtype = np.dtype(dtype)
    if out is None:
        out = np.full(n, np.inf, dtype)
    # Resolution boundary: the block kernels dispatch on the default device
    # (host-driven streaming, no mesh) — resolve once, thread through.
    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    platform = resolve_platform()
    kernel = _nn_block_kernel(dtype.name, platform)
    m = candidates.shape[0]
    # Block size for the NN reduction itself: the Pallas path (accelerators)
    # streams VMEM tiles and never materialises the block matrix, so the
    # full chunk is fine; the jnp fallback (CPU) materialises
    # (blk, blk) distances — cap it (4096² f64 = 134 MB). Also shrink to
    # the problem so a 271-pose trajectory doesn't pad to 262144.
    blk = chunk_size if platform != "cpu" else min(chunk_size, 4096)
    blk = min(blk, max(_round_up8(n), _round_up8(m)))
    cands_np = np.nan_to_num(np.asarray(candidates, dtype), nan=0.0)
    for a in range(0, n, blk):
        b = min(a + blk, n)
        traj_blk = _pad_rows(np.asarray(traj_chunk_fn(a, b), dtype), blk)
        tmask_blk = np.zeros(blk, bool)
        tmask_blk[: b - a] = np.asarray(traj_mask[a:b], bool)
        running = jnp.full((blk,), np.inf, jnp.dtype(dtype.name))
        tdev = jax.device_put(traj_blk)
        tmdev = jax.device_put(tmask_blk)

        def _cstage(cd):
            c, d = cd
            cmask_blk = np.zeros(blk, bool)
            cmask_blk[: d - c] = np.asarray(cand_mask[c:d], bool)
            if not cmask_blk.any():
                return None
            return (
                jax.device_put(_pad_rows(cands_np[c:d], blk)),
                jax.device_put(cmask_blk),
            )

        def _claunch(cd, staged):
            nonlocal running
            if staged is not None:
                running = kernel(running, tdev, staged[0], tmdev, staged[1])

        # Pipelined candidate streaming: block c+1's host pad + transfer
        # overlaps block c's kernel (utils.streaming).
        streaming.stream_chunks(
            ((c, min(c + blk, m)) for c in range(0, m, blk)),
            _cstage,
            _claunch,
            None,
        )
        out[a:b] = np.asarray(running)[: b - a]
    return out


def _round_up8(x: int) -> int:
    return max(8, ((x + 7) // 8) * 8)


def _stats_host(errors: np.ndarray, mask: np.ndarray) -> metrics.ErrorStats:
    """Host-side mirror of ``metrics.error_stats`` (same zero-count and
    even/odd-median conventions) over a full-length error array."""
    e = errors[np.asarray(mask, bool)]
    n = int(e.size)
    if n == 0:
        z = np.float64(0.0)
        return metrics.ErrorStats(mean=z, median=np.float64(np.inf), rmse=z,
                                  max=np.float64(-np.inf), count=0)
    return metrics.ErrorStats(
        mean=np.float64(e.mean()),
        median=np.float64(np.median(e)),
        rmse=np.float64(np.sqrt(np.mean(e**2))),
        max=np.float64(e.max()),
        count=n,
    )


def evaluate_chunked(
    slam_times,
    slam_pos,
    slam_quat,
    result: ChunkedFusionResult,
    chunk_size: int = 65536,
    skip_seconds: float = 5.0,
    dtype=np.float64,
):
    """Out-of-core counterpart of ``models.fusion.evaluate`` (reference
    evaluation block, EKFGPSSLAM.py:1013-1083): NN + paired-ATE stats for the
    raw SLAM / Sim3-aligned / EKF-fused trajectories vs the aligned GPS, with
    the post-5 s gate — computed from host (memmappable) arrays with O(chunk)
    device residency. The Sim3 trajectory is generated chunk-by-chunk from
    the stored transform; per-point error arrays live on host (N floats
    each). Returns the same ``fusion.Evaluation`` tuple shape with host
    scalars."""
    return _evaluate_streamed(
        slam_times,
        slam_pos,
        slam_quat,
        result,
        np.asarray(result.aligned_gps),
        np.asarray(result.gps_valid, bool),
        chunk_size=chunk_size,
        skip_seconds=skip_seconds,
        dtype=dtype,
    )


def evaluate_vs_track_chunked(
    slam_times,
    slam_pos,
    slam_quat,
    result: ChunkedFusionResult,
    track_times,
    track_positions,
    track_valid=None,
    cfg: FusionConfig = FusionConfig(),
    chunk_size: int = 65536,
    skip_seconds: float = 5.0,
    dtype=np.float64,
):
    """Out-of-core counterpart of ``models.fusion.evaluate_vs_track``
    (reference GT evaluation, EKFGPSSLAM.py:1044-1082): the INDEPENDENT
    reference track (e.g. ground-truth GNSS) is temporally aligned onto the
    SLAM timestamps with the chunk+halo cubic aligner, then the same NN/ATE
    statistics stream over host chunks. Returns ``(Evaluation,
    AlignedGPS(host aligned (N,3), host valid (N,)))`` — mirroring the
    in-core return so the GT surface is identical at >HBM scale (VERDICT r3
    task 8: the reference offers GT comparison unconditionally)."""
    from gps_optimize_slam_tpu.ops.alignment import AlignedGPS

    dtype = np.dtype(dtype)
    aligned, valid = alignment_chunked.align_gps_to_slam_chunked(
        slam_times,
        track_times,
        track_positions,
        gps_valid=track_valid,
        cfg=cfg.time_alignment,
        chunk_size=chunk_size,
        dtype=dtype,
        platform=cfg.platform,
    )
    ev = _evaluate_streamed(
        slam_times,
        slam_pos,
        slam_quat,
        result,
        aligned,
        valid,
        chunk_size=chunk_size,
        skip_seconds=skip_seconds,
        dtype=dtype,
    )
    return ev, AlignedGPS(aligned=aligned, valid=valid)


def _evaluate_streamed(
    slam_times,
    slam_pos,
    slam_quat,
    result: ChunkedFusionResult,
    aligned: np.ndarray,
    valid: np.ndarray,
    chunk_size: int = 65536,
    skip_seconds: float = 5.0,
    dtype=np.float64,
):
    """Shared streamed NN/ATE machinery: statistics of the three
    trajectories against the candidate track ``(aligned, valid)`` with the
    post-skip gate, O(chunk) device residency."""
    from gps_optimize_slam_tpu.models.fusion import Evaluation

    dtype = np.dtype(dtype)
    n = len(slam_times)
    st = np.asarray(slam_times)
    gate = np.asarray(valid, bool) & (st > st[0] + skip_seconds)
    aligned = np.asarray(aligned)

    tkernel = _transform_kernel(dtype.name)
    R = jax.device_put(np.asarray(np.asarray(result.sim3.R), dtype))
    t = jax.device_put(np.asarray(np.asarray(result.sim3.t), dtype))
    s = jax.device_put(np.asarray(np.asarray(result.sim3.scale), dtype))

    def slam_chunk(a, b):
        return slam_pos[a:b]

    def sim3_chunk(a, b):
        p, _ = tkernel(
            jax.device_put(np.asarray(slam_pos[a:b], dtype)),
            jax.device_put(np.asarray(slam_quat[a:b], dtype)),
            R, t, s,
        )
        return np.asarray(p)

    def ekf_chunk(a, b):
        return result.corrected_pos[a:b]

    def nn(fn):
        e = nn_errors_streamed(
            fn, n, aligned, gate, gate, chunk_size=chunk_size, dtype=dtype
        )
        return _stats_host(e, gate)

    akernel = _ate_block_kernel(dtype.name)
    ref_np = np.nan_to_num(aligned.astype(dtype), nan=0.0)

    def ate(fn):
        e = np.full(n, np.inf, dtype)

        def _stage(ab):
            a, b = ab
            return (
                jax.device_put(np.asarray(fn(a, b), dtype)),
                jax.device_put(ref_np[a:b]),
                jax.device_put(gate[a:b]),
            )

        def _drain(ab, out_blk):
            e[ab[0] : ab[1]] = np.asarray(out_blk)

        streaming.stream_chunks(
            ((a, min(a + chunk_size, n)) for a in range(0, n, chunk_size)),
            _stage,
            lambda ab, staged: akernel(*staged),
            _drain,
        )
        return _stats_host(e, gate)

    return Evaluation(
        nn_slam=nn(slam_chunk),
        nn_sim3=nn(sim3_chunk),
        nn_ekf=nn(ekf_chunk),
        ate_sim3=ate(sim3_chunk),
        ate_ekf=ate(ekf_chunk),
    )


def fuse_core_chunked(
    slam_times,
    slam_pos,
    slam_quat,
    gps_times,
    gps_positions,
    gps_valid=None,
    key: Optional[jax.Array] = None,
    config: FusionConfig = FusionConfig(),
    time_offset: float = 0.0,
    chunk_size: int = 262144,
    halo: int = 64,
    dtype=np.float64,
    max_ransac_points: int = 32768,
    out_pos: Optional[np.ndarray] = None,
    out_quat: Optional[np.ndarray] = None,
    return_sim3_trajectory: bool = False,
    scan_fn=None,
    robust: bool = False,
    robust_gate_chi2: Optional[float] = None,
    robust_iterations: int = 2,
):
    """Full fusion of one arbitrarily long sequence from RAW GNSS.

    Host-resident (memmappable) inputs; device residency O(chunk). Stages:

    1. ``alignment_chunked.align_gps_to_slam_chunked`` — gap-aware cubic
       interpolation onto SLAM timestamps (chunk + halo windows).
    2. ``alignment_chunked.sim3_window_mask_host`` — the reference's calc
       window (first gap-free run, ≤ max_initial_duration).
    3. ``alignment_chunked.sim3_ransac_streaming`` — robust Sim(3); trials
       on ≤ ``max_ransac_points`` in-core, refit streamed over all inliers.
    4. ``kalman_chunked.fuse_ekf_rts_chunked`` — re-entrant EKF + RTS (the
       EKF's motion model is the RAW SLAM relative pose, faithful to
       reference EKFGPSSLAM.py:866; Sim3 enters through the initial state).

    Returns ``ChunkedFusionResult`` (host arrays; ``out_*`` may be
    memmapped). With ``return_sim3_trajectory=True`` the result tuple also
    carries the Sim3-transformed trajectory (extra 2 chunked passes).

    ``scan_fn`` (``parallel.seqpar.sequence_parallel_scan(mesh)``) shards
    each chunk's filter scans over a device mesh — host chunks × device
    blocks; pick ``chunk_size = k·D − 1`` (see kalman_chunked).

    ``robust=True`` replaces stage 4 with the χ²-NIS-gated filter
    (models.robust.fuse_robust_chunked — the >HBM form of BASELINE
    config 4); the result's ``robust_accepted`` records the surviving
    measurements.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    dtype = np.dtype(dtype)
    n = len(slam_times)

    # Resolution boundary for the chunk kernels' dispatch: the default
    # device (host-driven streaming), or scan_fn's mesh when the filter
    # scans shard over one.
    from gps_optimize_slam_tpu.utils.backend import resolve_platform

    if config.platform == "auto":
        config = config.replace(
            platform=resolve_platform(mesh=getattr(scan_fn, "mesh", None))
        )

    aligned, valid = alignment_chunked.align_gps_to_slam_chunked(
        slam_times,
        gps_times,
        gps_positions,
        gps_valid=gps_valid,
        time_offset=time_offset,
        cfg=config.time_alignment,
        chunk_size=chunk_size,
        halo=halo,
        dtype=dtype,
        platform=config.platform,
    )

    window = alignment_chunked.sim3_window_mask_host(
        slam_times,
        valid,
        gap_threshold=config.time_alignment.max_gps_gap_threshold,
        max_duration=config.sim3_ransac.max_initial_duration,
        min_samples=config.sim3_ransac.min_samples,
    )

    sres = alignment_chunked.sim3_ransac_streaming(
        key,
        slam_pos,
        np.nan_to_num(aligned, nan=0.0) if isinstance(aligned, np.ndarray) else aligned,
        window,
        cfg=config.sim3_ransac,
        max_ransac_points=max_ransac_points,
        chunk_size=chunk_size,
        dtype=dtype,
        platform=config.platform,
    )

    # Initial state: the Sim3-transformed first pose (the only place the
    # transform enters the filter — reference EKFGPSSLAM.py:842-845, 866).
    p0, q0 = transform_trajectory_chunked(
        np.asarray(slam_pos[:1], dtype),
        np.asarray(slam_quat[:1], dtype),
        sres.sim3,
        dtype=dtype,
    )

    robust_accepted = None
    if robust:
        from gps_optimize_slam_tpu.models import robust as robust_mod

        gate = (
            robust_mod.CHI2_3DOF_95
            if robust_gate_chi2 is None
            else robust_gate_chi2
        )
        out_pos, out_quat, robust_accepted, _ = robust_mod.fuse_robust_chunked(
            slam_times,
            slam_pos,
            slam_quat,
            p0[0],
            q0[0],
            aligned,
            valid,
            ekf_cfg=config.ekf,
            rts_cfg=config.rts_decision,
            rts_mode=config.rts_mode,
            gate_chi2=gate,
            n_iterations=robust_iterations,
            chunk_size=chunk_size,
            dtype=dtype,
            out_pos=out_pos,
            out_quat=out_quat,
            scan_fn=scan_fn,
            platform=config.platform,
        )
    else:
        out_pos, out_quat = kalman_chunked.fuse_ekf_rts_chunked(
            slam_times,
            slam_pos,
            slam_quat,
            p0[0],
            q0[0],
            aligned,
            valid,
            ekf_cfg=config.ekf,
            rts_cfg=config.rts_decision,
            rts_mode=config.rts_mode,
            chunk_size=chunk_size,
            dtype=dtype,
            out_pos=out_pos,
            out_quat=out_quat,
            scan_fn=scan_fn,
            platform=config.platform,
        )

    result = ChunkedFusionResult(
        corrected_pos=out_pos,
        corrected_quat=out_quat,
        sim3=sres.sim3,
        aligned_gps=aligned,
        gps_valid=valid,
        num_inliers=sres.num_inliers,
        ok=bool(np.asarray(sres.sim3.ok)),
        robust_accepted=robust_accepted,
    )
    if return_sim3_trajectory:
        sim3_pos, sim3_quat = transform_trajectory_chunked(
            slam_pos, slam_quat, sres.sim3, chunk_size=chunk_size, dtype=dtype
        )
        return result, (sim3_pos, sim3_quat)
    return result
