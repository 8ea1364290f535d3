"""The flagship fusion model: Sim(3) global alignment + EKF/RTS local fusion
as ONE jittable device program.

This is the TPU-native equivalent of the reference's 7-step recipe
(main_process_gui, EKFGPSSLAM.py:940-1123) minus host I/O: given SLAM and
GPS arrays already on device, a single `fuse_core` call performs temporal
alignment, Sim3 window selection, RANSAC+Umeyama global alignment,
trajectory transformation, EKF forward filtering, and outage-gated RTS
smoothing — everything fused by XLA, vmappable across sequences and
shardable across a device mesh (gps_optimize_slam_tpu.parallel).

Note the reference recomputes the temporal alignment 3-4× per run
(quirk Q9); here it is computed once and reused.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import FusionConfig
from gps_optimize_slam_tpu.utils.precision import highp
from gps_optimize_slam_tpu.ops import (
    alignment,
    kalman,
    kalman_parallel,
    metrics,
    ransac,
    se3,
)
from gps_optimize_slam_tpu.ops.umeyama import Sim3


class FusionOutputs(NamedTuple):
    """Everything the evaluation/export layers need, static shapes."""

    corrected_pos: jnp.ndarray  # (N,3) EKF+RTS fused trajectory
    corrected_quat: jnp.ndarray  # (N,4)
    sim3_pos: jnp.ndarray  # (N,3) Sim3-aligned trajectory (EKF input)
    sim3_quat: jnp.ndarray  # (N,4)
    sim3: Sim3  # global transform (R, t, scale, ok)
    sim3_inliers: jnp.ndarray  # (N,) bool RANSAC inliers within calc window
    aligned_gps: jnp.ndarray  # (N,3) GPS interpolated to SLAM timestamps
    gps_valid: jnp.ndarray  # (N,) bool
    ok: jnp.ndarray  # () bool — pipeline succeeded


def _warn_if_sequential_scan_cliff(config: FusionConfig, use_parallel: bool) -> None:
    """Performance-cliff warning: soft blending
    (rts_decision.default_ekf_transition_steps_on_sharp_turn > 0) is a
    data-dependent recursion no associative form covers, so ekf_scan='auto'
    silently falls back to the O(N) sequential scan — on an accelerator
    that is orders slower than the O(log N) path. Emitted at trace time,
    naming the knob."""
    if (
        not use_parallel
        and config.ekf_scan == "auto"
        and config.platform != "cpu"
        and config.rts_decision.default_ekf_transition_steps_on_sharp_turn != 0
    ):
        from gps_optimize_slam_tpu.utils.logging import get_logger

        get_logger().warning(
            "rts_decision.default_ekf_transition_steps_on_sharp_turn=%d "
            "forces the SEQUENTIAL EKF scan on platform %r (the O(log N) "
            "associative scan requires hard updates, i.e. 0). Expect an "
            "O(N)-latency filter on this accelerator; set the knob to 0 "
            "(the reference's effective value) or ekf_scan='sequential' "
            "to silence this warning.",
            config.rts_decision.default_ekf_transition_steps_on_sharp_turn,
            config.platform,
        )


def fuse_core(
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    slam_quat: jnp.ndarray,
    gps_times: jnp.ndarray,
    gps_positions: jnp.ndarray,
    gps_valid: jnp.ndarray,
    key: jax.Array,
    config: FusionConfig = FusionConfig(),
    slam_mask: Optional[jnp.ndarray] = None,
    time_offset=0.0,
) -> FusionOutputs:
    """Full fusion of one sequence. All inputs fixed-shape; invalid GPS
    samples are masked via ``gps_valid`` (output of the outlier gate).

    ``slam_mask`` marks real (unpadded) SLAM poses when sequences are padded
    for batching: padded timestamps can land inside the GPS span and would
    otherwise be treated as measured — they are forced GPS-invalid so they
    never enter the Sim3 window or the filter update (the padded tail
    dead-reckons as a trailing outage, leaving real outputs untouched).

    PLATFORM RESOLUTION BOUNDARY: ``config.platform == "auto"`` is resolved
    here, against the process-default platform, BEFORE the jit boundary —
    so every kernel-dispatch decision inside the traced program
    (Pallas RANSAC counting, single-kernel scans, matmul gathers) is keyed
    on a concrete platform. Callers that compile for NON-default devices
    (a mesh — parallel.mesh._fused_fn, parallel.seqpar) must pass a config
    whose platform is already resolved against those devices; calling this
    wrapper inside another trace with platform="auto" falls back to the
    process-default oracle (the pre-round-4 behaviour)."""
    if config.platform == "auto":
        from gps_optimize_slam_tpu.utils.backend import resolve_platform

        config = config.replace(platform=resolve_platform())
    return _fuse_core(
        slam_times,
        slam_pos,
        slam_quat,
        gps_times,
        gps_positions,
        gps_valid,
        key,
        config=config,
        slam_mask=slam_mask,
        time_offset=time_offset,
    )


@partial(jax.jit, static_argnames=("config",))
@highp
def _fuse_core(
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    slam_quat: jnp.ndarray,
    gps_times: jnp.ndarray,
    gps_positions: jnp.ndarray,
    gps_valid: jnp.ndarray,
    key: jax.Array,
    config: FusionConfig = FusionConfig(),
    slam_mask: Optional[jnp.ndarray] = None,
    time_offset=0.0,
) -> FusionOutputs:
    """Jitted fusion body — ``config.platform`` must be RESOLVED (not
    "auto"); use :func:`fuse_core` unless you resolved it yourself."""
    aligned = alignment.align_gps_to_slam(
        slam_times,
        gps_times,
        gps_positions,
        gps_valid=gps_valid,
        time_offset=time_offset,
        cfg=config.time_alignment,
        assume_sorted=config.gps_sorted,
        platform=config.platform,
    )
    if slam_mask is not None:
        aligned = alignment.AlignedGPS(
            aligned=jnp.where(slam_mask[:, None], aligned.aligned, jnp.nan),
            valid=aligned.valid & slam_mask,
        )

    window = alignment.sim3_window_mask(
        slam_times,
        aligned.valid,
        gap_threshold=config.time_alignment.max_gps_gap_threshold,
        max_duration=config.sim3_ransac.max_initial_duration,
        min_samples=config.sim3_ransac.min_samples,
    )

    sim3_res = ransac.sim3_ransac(
        key,
        slam_pos,
        jnp.nan_to_num(aligned.aligned, nan=0.0),
        valid=window,
        cfg=config.sim3_ransac,
        platform=config.platform,
    )

    sim3_pos, sim3_quat = se3.transform_trajectory(
        slam_pos, slam_quat, sim3_res.sim3.R, sim3_res.sim3.t, sim3_res.sim3.scale
    )

    # "auto": the O(log N) associative path on accelerators (where scan
    # latency dominates), the O(N) sequential path on CPU (where it is
    # faster to compile and fast enough to run — and bit-faithful to the
    # reference). Keyed on the RESOLVED config.platform; both paths
    # require/force hard updates.
    use_parallel = config.ekf_scan == "parallel" or (
        config.ekf_scan == "auto"
        and config.rts_decision.default_ekf_transition_steps_on_sharp_turn == 0
        and config.platform != "cpu"
    )
    _warn_if_sequential_scan_cliff(config, use_parallel)
    kw = {"platform": config.platform} if use_parallel else {}
    fuse_fn = kalman_parallel.fuse_ekf_rts_parallel if use_parallel else kalman.fuse_ekf_rts
    corrected_pos, corrected_quat = fuse_fn(
        slam_times,
        slam_pos,
        slam_quat,
        sim3_pos,
        sim3_quat,
        aligned.aligned,
        aligned.valid,
        config.ekf,
        config.rts_decision,
        rts_mode=config.rts_mode,
        **kw,
    )

    return FusionOutputs(
        corrected_pos=corrected_pos,
        corrected_quat=corrected_quat,
        sim3_pos=sim3_pos,
        sim3_quat=sim3_quat,
        sim3=sim3_res.sim3,
        sim3_inliers=sim3_res.inlier_mask,
        aligned_gps=aligned.aligned,
        gps_valid=aligned.valid,
        ok=sim3_res.ok,
    )


class Evaluation(NamedTuple):
    nn_slam: metrics.ErrorStats
    nn_sim3: metrics.ErrorStats
    nn_ekf: metrics.ErrorStats
    ate_sim3: metrics.ErrorStats
    ate_ekf: metrics.ErrorStats


def evaluate(
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    outputs: FusionOutputs,
    skip_seconds: float = 5.0,
    platform: str = "auto",
) -> Evaluation:
    """Reference-metric (NN, post-5 s — quirk Q6) and paired-ATE stats for
    raw SLAM / Sim3-aligned / EKF-fused trajectories vs the aligned GPS.

    ``platform`` gates the tiled Pallas NN kernel; "auto" resolves against
    the process default HERE (outside the jit). Callers compiling for
    non-default devices pass a resolved value (parallel.mesh.evaluate_batch
    resolves against the outputs' own sharding)."""
    if platform == "auto":
        from gps_optimize_slam_tpu.utils.backend import resolve_platform

        platform = resolve_platform()
    return _evaluate(slam_times, slam_pos, outputs, skip_seconds, platform)


@partial(jax.jit, static_argnames=("platform",))
@highp
def _evaluate(
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    outputs: FusionOutputs,
    skip_seconds: float = 5.0,
    platform: str = "cpu",
) -> Evaluation:
    gate = metrics.eval_mask(slam_times, outputs.gps_valid, skip_seconds)
    cands = jnp.nan_to_num(outputs.aligned_gps, nan=0.0)
    cand_mask = gate  # the reference's candidate set is the same gated rows

    def nn(traj):
        e = metrics.nn_errors_auto(traj, cands, gate, cand_mask, platform=platform)
        return metrics.error_stats(e, gate)

    def ate(traj):
        e = metrics.paired_errors(traj, outputs.aligned_gps, gate)
        return metrics.error_stats(e, gate)

    return Evaluation(
        nn_slam=nn(slam_pos),
        nn_sim3=nn(outputs.sim3_pos),
        nn_ekf=nn(outputs.corrected_pos),
        ate_sim3=ate(outputs.sim3_pos),
        ate_ekf=ate(outputs.corrected_pos),
    )


def evaluate_vs_track(
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    outputs: FusionOutputs,
    track_times: jnp.ndarray,
    track_positions: jnp.ndarray,
    track_valid: jnp.ndarray,
    cfg: FusionConfig = FusionConfig(),
    skip_seconds: float = 5.0,
):
    """Evaluation against an INDEPENDENT reference track (e.g. ground-truth
    GNSS), reference EKFGPSSLAM.py:1044-1067: the track is temporally
    aligned onto the SLAM timestamps and the same NN/ATE statistics are
    computed for raw SLAM / Sim3 / EKF. Returns ``(Evaluation, AlignedGPS)``
    — the aligned track is what the plot layer overlays
    (EKFGPSSLAM.py:1069-1082 picks GT-based errors for plotting).

    ``cfg.platform == "auto"`` resolves against the process default here
    (outside the jit) — same boundary contract as :func:`fuse_core`."""
    if cfg.platform == "auto":
        from gps_optimize_slam_tpu.utils.backend import resolve_platform

        cfg = cfg.replace(platform=resolve_platform())
    return _evaluate_vs_track(
        slam_times, slam_pos, outputs, track_times, track_positions,
        track_valid, cfg=cfg, skip_seconds=skip_seconds,
    )


@partial(jax.jit, static_argnames=("cfg",))
@highp
def _evaluate_vs_track(
    slam_times: jnp.ndarray,
    slam_pos: jnp.ndarray,
    outputs: FusionOutputs,
    track_times: jnp.ndarray,
    track_positions: jnp.ndarray,
    track_valid: jnp.ndarray,
    cfg: FusionConfig = FusionConfig(),
    skip_seconds: float = 5.0,
):
    al = alignment.align_gps_to_slam(
        slam_times,
        track_times,
        track_positions,
        gps_valid=track_valid,
        cfg=cfg.time_alignment,
        platform=cfg.platform,
    )
    gate = metrics.eval_mask(slam_times, al.valid, skip_seconds)
    cands = jnp.nan_to_num(al.aligned, nan=0.0)

    def nn(traj):
        e = metrics.nn_errors_auto(traj, cands, gate, gate, platform=cfg.platform)
        return metrics.error_stats(e, gate)

    def ate(traj):
        e = metrics.paired_errors(traj, al.aligned, gate)
        return metrics.error_stats(e, gate)

    ev = Evaluation(
        nn_slam=nn(slam_pos),
        nn_sim3=nn(outputs.sim3_pos),
        nn_ekf=nn(outputs.corrected_pos),
        ate_sim3=ate(outputs.sim3_pos),
        ate_ekf=ate(outputs.corrected_pos),
    )
    return ev, al
