"""gps_optimize_slam_tpu — a TPU-native JAX trajectory-fusion framework.

Rebuilds the capabilities of the reference pipeline A2ureeE/GPS-optimize-SLAM
(GNSS + monocular-SLAM trajectory fusion: geodesy, robust outlier gating,
gap-aware temporal alignment, RANSAC+Umeyama Sim(3) global alignment, per-pose
EKF fusion, outage-gated RTS smoothing, evaluation and export) as pure,
jittable jax.numpy programs designed for TPU: static shapes, masking instead
of dynamic filtering, `lax.scan` filters/smoothers, vmapped RANSAC, and
mesh-sharded multi-sequence batching.

Reference layer map: SURVEY.md §1; component inventory: SURVEY.md §2.
"""

from gps_optimize_slam_tpu import config, ops, models, parallel, io, utils
from gps_optimize_slam_tpu.config import (
    EKFConfig,
    Sim3RansacConfig,
    GPSFilterConfig,
    TimeAlignConfig,
    RTSDecisionConfig,
    FusionConfig,
)

__version__ = "0.1.0"

__all__ = [
    "config",
    "ops",
    "models",
    "parallel",
    "io",
    "utils",
    "EKFConfig",
    "Sim3RansacConfig",
    "GPSFilterConfig",
    "TimeAlignConfig",
    "RTSDecisionConfig",
    "FusionConfig",
]
