"""Offline matplotlib visualisation (headless Agg — no GUI event loops).

Replaces plot_results (reference: EKFGPSSLAM.py:469-666): the same panels —
XY overlay of up to 5 trajectories (raw SLAM, Sim3, EKF, kept GPS, GT GNSS;
reference :501-522), 3D overlay with median-centered equal-range axes
(:524-558), error histograms with mean/median/RMSE lines (:599-612), and
error-over-time (:614-663) — rendered to a file instead of an interactive
window with CheckButtons (the GUI was incidental to the capability).

Like the reference (:1069-1082), when a ground-truth GNSS track is present
the error panels use GT-based errors; otherwise primary-GPS-based.
"""

from __future__ import annotations

import numpy as np


def _nn_errors_np(result, traj_pos, aligned, valid):
    """NN errors of a trajectory vs an aligned candidate set (post-5 s gate)."""
    import jax.numpy as jnp

    from gps_optimize_slam_tpu.ops import metrics

    slam_t = np.asarray(result.slam["timestamps"])
    gate = np.asarray(valid) & (slam_t > slam_t[0] + 5.0)
    g = jnp.asarray(gate)
    cands = jnp.nan_to_num(jnp.asarray(aligned), nan=0.0)
    err = np.asarray(metrics.nn_errors(jnp.asarray(traj_pos), cands, g, g))
    return err[gate], slam_t[gate]


def _equal_range_3d(ax, pts):
    """Median-centered equal-range 3D axes (reference EKFGPSSLAM.py:544-556)."""
    med = np.median(pts, axis=0)
    half = max(float(np.max(np.ptp(pts, axis=0))) / 2.0, 1.0)
    ax.set_xlim(med[0] - half, med[0] + half)
    ax.set_ylim(med[1] - half, med[1] + half)
    ax.set_zlim(med[2] - half, med[2] + half)


def plot_fusion_result(result, out_path: str, dpi: int = 110, close: bool = True):
    """Render the 4-panel overview to ``out_path``. Returns the figure
    (closed unless ``close=False`` — tests inspect the open figure)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    slam_pos = np.asarray(result.slam["positions"])
    sim3_pos = np.asarray(result.outputs.sim3_pos)
    ekf_pos = result.corrected_pos
    gps_pos = result.gps.positions[result.gps.valid]
    has_gt = result.gt is not None
    gt_pos = result.gt.positions[result.gt.valid] if has_gt else None

    # Error source: GT-based when available (reference :1069-1082).
    if has_gt and result.gt_aligned is not None:
        err_aligned, err_valid = result.gt_aligned.aligned, result.gt_aligned.valid
        err_label = "vs GT GNSS"
    else:
        err_aligned, err_valid = result.outputs.aligned_gps, result.outputs.gps_valid
        err_label = "vs primary GPS"
    ekf_err, t_err = _nn_errors_np(result, ekf_pos, err_aligned, err_valid)
    sim3_err, _ = _nn_errors_np(result, sim3_pos, err_aligned, err_valid)
    t_rel = t_err - t_err[0] if len(t_err) else np.zeros(0)

    fig = plt.figure(figsize=(16, 10))
    fig.suptitle("SLAM-GPS Trajectory Alignment and Fusion Results", fontsize=15)

    ax1 = fig.add_subplot(2, 2, 1)
    # The raw SLAM track lives in its own local frame; overlaying it only
    # makes sense when it is commensurate with the fused frame (the
    # reference shows it behind a visibility toggle instead,
    # EKFGPSSLAM.py:501-522). When it IS commensurate it is always drawn;
    # when not, the omission is annotated rather than silent.
    extent = np.linalg.norm(ekf_pos.max(0) - ekf_pos.min(0)) + 1.0
    if np.linalg.norm(slam_pos.mean(0) - ekf_pos.mean(0)) < 10 * extent:
        ax1.plot(slam_pos[:, 0], slam_pos[:, 1], "b--", lw=1, alpha=0.6, label="Original SLAM")
    else:
        ax1.text(
            0.02,
            0.02,
            "raw SLAM layer omitted:\nlocal frame incommensurate with fused frame",
            transform=ax1.transAxes,
            fontsize=7,
            color="0.35",
        )
    ax1.plot(sim3_pos[:, 0], sim3_pos[:, 1], "m:", lw=1, alpha=0.7, label="Sim3 Aligned")
    ax1.plot(ekf_pos[:, 0], ekf_pos[:, 1], "g-", lw=1.5, label="EKF Fused")
    ax1.scatter(gps_pos[:, 0], gps_pos[:, 1], c="r", marker=".", s=12, label="GPS (kept)")
    if has_gt and len(gt_pos):
        ax1.plot(gt_pos[:, 0], gt_pos[:, 1], "k-", lw=1, alpha=0.8, label="GT GNSS")
    ax1.set_title("Trajectory (X-Y)")
    ax1.axis("equal")
    ax1.grid(True)
    ax1.legend(loc="best", fontsize=8)

    ax2 = fig.add_subplot(2, 2, 2, projection="3d")
    ax2.plot(sim3_pos[:, 0], sim3_pos[:, 1], sim3_pos[:, 2], "m:", lw=1, label="Sim3")
    ax2.plot(ekf_pos[:, 0], ekf_pos[:, 1], ekf_pos[:, 2], "g-", lw=1.5, label="EKF")
    ax2.scatter(gps_pos[:, 0], gps_pos[:, 1], gps_pos[:, 2], c="r", marker="x", s=10)
    if has_gt and len(gt_pos):
        ax2.plot(gt_pos[:, 0], gt_pos[:, 1], gt_pos[:, 2], "k-", lw=1, alpha=0.8, label="GT")
    _equal_range_3d(ax2, ekf_pos)
    ax2.set_title("Trajectory (3D)")
    ax2.legend(fontsize=8)

    ax3 = fig.add_subplot(2, 2, 3)
    if len(ekf_err):
        # Per-trajectory histograms (reference draws one per visible layer).
        ax3.hist(sim3_err, bins=30, alpha=0.45, color="magenta", label="Sim3 error")
        ax3.hist(ekf_err, bins=30, alpha=0.65, color="purple", label="Fused error")
        for val, color, name in [
            (ekf_err.mean(), "red", "mean"),
            (np.median(ekf_err), "orange", "median"),
            (np.sqrt((ekf_err**2).mean()), "cyan", "rmse"),
        ]:
            ax3.axvline(val, color=color, ls="--", lw=1, label=f"fused {name}: {val:.3f} m")
        ax3.legend(fontsize=8)
    ax3.set_title(f"Position error distribution ({err_label})")
    ax3.set_xlabel("error (m)")
    ax3.grid(axis="y", ls=":")

    ax4 = fig.add_subplot(2, 2, 4)
    if len(ekf_err):
        ax4.plot(t_rel, ekf_err, "g-", lw=1.2, label="Fused")
        ax4.plot(t_rel, sim3_err, "m--", lw=1, alpha=0.7, label="Sim3")
        ax4.legend(fontsize=8)
    ax4.set_title(f"Error over time ({err_label})")
    ax4.set_xlabel("relative time (s)")
    ax4.set_ylabel("error (m)")
    ax4.grid(True)

    fig.tight_layout(rect=[0, 0, 1, 0.95])
    fig.savefig(out_path, dpi=dpi)
    if close:
        plt.close(fig)
    return fig
