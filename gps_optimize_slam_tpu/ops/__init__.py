"""TPU-native compute ops: quaternion/SE3 geometry, geodesy, alignment
(in-core + out-of-core), robust estimation, and scan-based
filtering/smoothing."""

from gps_optimize_slam_tpu.ops import quaternion, se3, geodesy

__all__ = ["quaternion", "se3", "geodesy"]
