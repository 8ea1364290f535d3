"""Offline matplotlib visualisation (headless Agg — no GUI event loops).

Replaces plot_results (reference: EKFGPSSLAM.py:469-666): the same four
panels — XY overlay, 3D overlay, error histogram with mean/median/RMSE
lines, error-over-time — rendered to a file instead of an interactive
window with CheckButtons (the GUI was incidental to the capability)."""

from __future__ import annotations

import numpy as np


def plot_fusion_result(result, out_path: str, dpi: int = 110) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gps_optimize_slam_tpu.ops import metrics

    slam_pos = np.asarray(result.slam["positions"])
    sim3_pos = np.asarray(result.outputs.sim3_pos)
    ekf_pos = result.corrected_pos
    gps_pos = result.gps.positions[result.gps.valid]
    slam_t = np.asarray(result.slam["timestamps"])
    gate = np.asarray(result.outputs.gps_valid) & (slam_t > slam_t[0] + 5.0)

    import jax.numpy as jnp

    cands = jnp.nan_to_num(result.outputs.aligned_gps, nan=0.0)
    g = jnp.asarray(gate)
    ekf_err = np.asarray(metrics.nn_errors(jnp.asarray(ekf_pos), cands, g, g))[gate]
    sim3_err = np.asarray(metrics.nn_errors(jnp.asarray(sim3_pos), cands, g, g))[gate]
    t_rel = slam_t[gate] - slam_t[gate][0] if gate.any() else np.zeros(0)

    fig = plt.figure(figsize=(16, 10))
    fig.suptitle("SLAM-GPS Trajectory Alignment and Fusion Results", fontsize=15)

    ax1 = fig.add_subplot(2, 2, 1)
    # The raw SLAM track lives in its own local frame; overlaying it only
    # makes sense when it is commensurate with the fused frame (the
    # reference shows it behind a visibility toggle instead).
    extent = np.linalg.norm(ekf_pos.max(0) - ekf_pos.min(0)) + 1.0
    if np.linalg.norm(slam_pos.mean(0) - ekf_pos.mean(0)) < 10 * extent:
        ax1.plot(slam_pos[:, 0], slam_pos[:, 1], "b--", lw=1, alpha=0.6, label="Original SLAM")
    ax1.plot(sim3_pos[:, 0], sim3_pos[:, 1], "m:", lw=1, alpha=0.7, label="Sim3 Aligned")
    ax1.plot(ekf_pos[:, 0], ekf_pos[:, 1], "g-", lw=1.5, label="EKF Fused")
    ax1.scatter(gps_pos[:, 0], gps_pos[:, 1], c="r", marker=".", s=12, label="GPS (kept)")
    ax1.set_title("Trajectory (X-Y)")
    ax1.axis("equal")
    ax1.grid(True)
    ax1.legend(loc="best", fontsize=8)

    ax2 = fig.add_subplot(2, 2, 2, projection="3d")
    ax2.plot(sim3_pos[:, 0], sim3_pos[:, 1], sim3_pos[:, 2], "m:", lw=1, label="Sim3")
    ax2.plot(ekf_pos[:, 0], ekf_pos[:, 1], ekf_pos[:, 2], "g-", lw=1.5, label="EKF")
    ax2.scatter(gps_pos[:, 0], gps_pos[:, 1], gps_pos[:, 2], c="r", marker="x", s=10)
    ax2.set_title("Trajectory (3D)")
    ax2.legend(fontsize=8)

    ax3 = fig.add_subplot(2, 2, 3)
    if len(ekf_err):
        ax3.hist(ekf_err, bins=30, alpha=0.75, color="purple", label="Fused error")
        for val, color, name in [
            (ekf_err.mean(), "red", "mean"),
            (np.median(ekf_err), "orange", "median"),
            (np.sqrt((ekf_err**2).mean()), "cyan", "rmse"),
        ]:
            ax3.axvline(val, color=color, ls="--", lw=1, label=f"{name}: {val:.3f} m")
        ax3.legend(fontsize=8)
    ax3.set_title("Position error distribution")
    ax3.set_xlabel("error (m)")
    ax3.grid(axis="y", ls=":")

    ax4 = fig.add_subplot(2, 2, 4)
    if len(ekf_err):
        ax4.plot(t_rel, ekf_err, "g-", lw=1.2, label="Fused")
        ax4.plot(t_rel, sim3_err, "m--", lw=1, alpha=0.7, label="Sim3")
        ax4.legend(fontsize=8)
    ax4.set_title("Error over time")
    ax4.set_xlabel("relative time (s)")
    ax4.set_ylabel("error (m)")
    ax4.grid(True)

    fig.tight_layout(rect=[0, 0, 1, 0.95])
    fig.savefig(out_path, dpi=dpi)
    plt.close(fig)
