"""Example scripts for gps_optimize_slam_tpu."""
