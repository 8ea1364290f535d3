"""Trajectory evaluation metrics — masked, jittable.

Replaces the reference's inline evaluation block (EKFGPSSLAM.py:1013-1083):
* ``nn_errors`` — nearest-neighbour distance from each evaluated trajectory
  point to the set of interpolated GPS candidates (the reference's metric,
  quirk Q6 — NOT timestamp-paired ATE), with its post-5 s time gate.
* ``paired_errors`` — proper timestamp-paired ATE (the standard metric, kept
  alongside for honest evaluation).
* ``error_stats`` — masked mean / median / RMSE / max.

All functions take validity masks and keep static shapes; invalid entries
carry +inf/0 sentinels and are excluded from the statistics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from gps_optimize_slam_tpu.utils.precision import highp


class ErrorStats(NamedTuple):
    mean: jnp.ndarray
    median: jnp.ndarray
    rmse: jnp.ndarray
    max: jnp.ndarray
    count: jnp.ndarray


def eval_mask(slam_times: jnp.ndarray, valid: jnp.ndarray, skip_seconds: float = 5.0):
    """Evaluation gate: GPS-valid AND strictly later than t₀ + skip
    (reference EKFGPSSLAM.py:1021-1023)."""
    return valid & (slam_times > slam_times[0] + skip_seconds)


@highp
def nn_errors(
    traj: jnp.ndarray,
    candidates: jnp.ndarray,
    traj_mask: jnp.ndarray,
    cand_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Per-point min distance to any valid candidate (reference's cdist→min,
    EKFGPSSLAM.py:1030-1031). Invalid trajectory points get +inf.

    O(N·M) fused distance computation; for very long trajectories the tiled
    Pallas path (ops.pallas_kernels) avoids materialising the matrix.
    """
    d2 = jnp.sum(
        (traj[:, None, :] - candidates[None, :, :]) ** 2, axis=-1
    )
    d2 = jnp.where(cand_mask[None, :], d2, jnp.inf)
    err = jnp.sqrt(jnp.min(d2, axis=1))
    return jnp.where(traj_mask, err, jnp.inf)


def paired_errors(
    traj: jnp.ndarray, aligned_ref: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Timestamp-paired position error ‖traj[i] − ref[i]‖ (standard ATE)."""
    ref = jnp.nan_to_num(aligned_ref, nan=0.0)
    err = jnp.linalg.norm(traj - ref, axis=-1)
    return jnp.where(mask, err, jnp.inf)


def error_stats(errors: jnp.ndarray, mask: jnp.ndarray) -> ErrorStats:
    """Masked mean/median/RMSE/max over the valid entries."""
    n = jnp.sum(mask)
    safe_n = jnp.maximum(n, 1)
    e = jnp.where(mask, errors, 0.0)
    mean = jnp.sum(e) / safe_n
    rmse = jnp.sqrt(jnp.sum(e**2) / safe_n)
    mx = jnp.max(jnp.where(mask, errors, -jnp.inf))
    # Masked median: sort with +inf padding, average the two middle ranks.
    s = jnp.sort(jnp.where(mask, errors, jnp.inf))
    lo = s[jnp.clip((n - 1) // 2, 0, s.shape[0] - 1)]
    hi = s[jnp.clip(n // 2, 0, s.shape[0] - 1)]
    median = (lo + hi) / 2.0
    return ErrorStats(mean=mean, median=median, rmse=rmse, max=mx, count=n)
