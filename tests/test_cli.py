"""CLI end-to-end tests (the tkinter-GUI replacement surface)."""

import json
import os

import numpy as np
import pytest

from gps_optimize_slam_tpu.cli import build_parser, main
from tests.conftest import reference_fixture


@pytest.fixture(autouse=True)
def _keep_suite_cache(monkeypatch):
    """cli.main() repoints the persistent compile cache at the user cache
    (1 s threshold) — in-suite that would orphan every later eager-op
    compile. Keep the suite cache active; the cache plumbing itself is
    incidental to the CLI behavior under test."""
    from gps_optimize_slam_tpu.utils import cache as cache_mod

    monkeypatch.setattr(cache_mod, "enable_persistent_cache", lambda *a, **k: "")


def test_fuse_json_with_gt_and_outputs(tmp_path, capsys):
    out = tmp_path / "fused_utm.txt"
    rc = main(
        [
            "fuse",
            reference_fixture("yolotum04.txt"),
            reference_fixture("combined_output.txt"),
            "--gt",
            reference_fixture("5.1Kitti04gps"),
            "-o",
            str(out),
            "--json",
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    payload = json.loads(captured[: captured.rindex("}") + 1])
    assert payload["poses"] == 271
    assert abs(payload["sim3_scale"] - 0.986986) < 1e-5
    assert abs(payload["nn_vs_primary"]["ekf"]["rmse_m"] - 0.0839) < 1e-3
    assert abs(payload["nn_vs_ground_truth"]["ekf"]["rmse_m"] - 0.173) < 2e-3
    assert out.exists()
    wgs = tmp_path / "fused_wgs84.txt"
    assert wgs.exists()
    w = np.loadtxt(wgs)
    assert w.shape == (271, 8)


def test_fuse_human_readable(capsys):
    rc = main(
        [
            "fuse",
            reference_fixture("yolotum04.txt"),
            reference_fixture("combined_output.txt"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "sim3: scale=0.986986" in out
    assert "EKF fused (NN)" in out


def test_fuse_enu_frame(capsys):
    rc = main(
        [
            "fuse",
            reference_fixture("yolotum04.txt"),
            reference_fixture("combined_output.txt"),
            "--frame",
            "enu",
            "--json",
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    payload = json.loads(captured[: captured.rindex("}") + 1])
    # ENU frame: same quality, different projection.
    assert abs(payload["nn_vs_primary"]["ekf"]["rmse_m"] - 0.084) < 5e-3


def test_kitti2tum_subcommand(tmp_path):
    out = tmp_path / "converted.txt"
    rc = main(
        [
            "kitti2tum",
            reference_fixture("yolokitti04.txt"),
            reference_fixture("times04.txt"),
            str(out),
        ]
    )
    assert rc == 0
    shipped = np.loadtxt(reference_fixture("yolotum04.txt"))
    ours = np.loadtxt(out)
    np.testing.assert_allclose(ours[:, :4], shipped[:, :4], atol=1e-6)


def test_parser_rejects_unknown_command():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["frobnicate"])


def test_fuse_plot_renders(tmp_path):
    png = tmp_path / "overview.png"
    rc = main(
        [
            "fuse",
            reference_fixture("yolotum04.txt"),
            reference_fixture("combined_output.txt"),
            "--plot",
            str(png),
        ]
    )
    assert rc == 0
    assert png.exists() and png.stat().st_size > 50_000  # a real figure


def _write_shifted_gps(tmp_path, shift_s):
    """Reference GPS fixture with all timestamps shifted by +shift_s."""
    raw = np.loadtxt(reference_fixture("combined_output.txt"))
    raw[:, 0] += shift_s
    p = tmp_path / f"gps_shift_{shift_s}.txt"
    np.savetxt(p, raw)
    return str(p)


def test_fuse_config_overrides_end_to_end(tmp_path, capsys):
    # VERDICT r1 #6: config file + flags must reach the device program.
    # A +1.5 s clock shift breaks the faithful (no-op) offset estimator but
    # must be recovered by --estimate-offset xcorr; EKF noise + rts_mode come
    # from a JSON config file.
    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(
        json.dumps(
            {
                "ekf": {"meas_noise_diag": [0.5, 0.5, 0.5]},
                "rts_mode": "full",
            }
        )
    )
    def run(gps_path):
        rc = main(
            [
                "fuse",
                reference_fixture("yolotum04.txt"),
                gps_path,
                "--config",
                str(cfg_file),
                "--estimate-offset",
                "xcorr",
                "--gt",
                reference_fixture("5.1Kitti04gps"),
                "--json",
            ]
        )
        assert rc == 0
        captured = capsys.readouterr().out
        return json.loads(captured[: captured.rindex("}") + 1])

    base = run(reference_fixture("combined_output.txt"))
    shifted = run(_write_shifted_gps(tmp_path, 1.5))
    # The xcorr estimator must recover (the negative of) the injected shift
    # RELATIVE to the unshifted fixture (which carries its own real ~1 s of
    # Q3 cumulative clock drift that xcorr legitimately detects).
    assert abs((shifted["time_offset_s"] - base["time_offset_s"]) + 1.5) < 0.2
    # Paired ATE vs the independent (unshifted-clock) GT must beat the
    # faithful-estimator control below by a wide margin.
    assert shifted["ate_vs_ground_truth"]["ekf"]["rmse_m"] < 17.0


def test_fuse_faithful_offset_fails_on_shift(tmp_path, capsys):
    # Control for the test above: with the reference's no-op estimator the
    # shifted clock stays misaligned. NN error vs the (equally shifted)
    # primary GPS cannot see a time shift on a non-self-intersecting track —
    # the honest detector is paired ATE vs the independent GT clock.
    shifted = _write_shifted_gps(tmp_path, 1.5)
    rc = main(
        [
            "fuse",
            reference_fixture("yolotum04.txt"),
            shifted,
            "--gt",
            reference_fixture("5.1Kitti04gps"),
            "--json",
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    payload = json.loads(captured[: captured.rindex("}") + 1])
    assert payload["time_offset_s"] == 0.0
    assert payload["ate_vs_ground_truth"]["ekf"]["rmse_m"] > 18.0


def test_fuse_plot_with_gt_overlay(tmp_path):
    png = tmp_path / "overview_gt.png"
    rc = main(
        [
            "fuse",
            reference_fixture("yolotum04.txt"),
            reference_fixture("combined_output.txt"),
            "--gt",
            reference_fixture("5.1Kitti04gps"),
            "--plot",
            str(png),
        ]
    )
    assert rc == 0
    assert png.exists() and png.stat().st_size > 50_000


def test_fuse_batch_cli(tmp_path, capsys):
    """fuse-batch: two pairs (real seq-04 + a synthetic sequence) bucketed,
    fused in vmapped programs, reported and exported per sequence."""
    # Synthetic second pair at a very different length -> two buckets.
    rng = np.random.default_rng(0)
    n = 100
    t = np.arange(n) * 0.1
    yaw = np.cumsum(np.full(n, 0.02))
    pos = np.cumsum(0.4 * np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n)], -1), 0)
    quat = np.stack([np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1)
    slam2 = tmp_path / "synth.tum"
    np.savetxt(slam2, np.column_stack([t, pos, quat]))
    # GNSS for it: lat/lon/alt near the KITTI area, walking east.
    m = 90
    gt = np.linspace(t[0], t[-1], m)
    ge = np.stack([np.interp(gt, t, pos[:, k]) for k in range(3)], -1)
    lat0, lon0 = 49.03, 8.39
    lats = lat0 + (ge[:, 1] + rng.normal(size=m) * 0.02) / 111_320.0
    lons = lon0 + (ge[:, 0] + rng.normal(size=m) * 0.02) / (
        111_320.0 * np.cos(np.deg2rad(lat0))
    )
    alts = 112.0 + ge[:, 2]
    gps2 = tmp_path / "synth_gps.txt"
    np.savetxt(gps2, np.column_stack([gt + 1e9, lats, lons, alts]))
    # SLAM times must overlap GPS times: rewrite synth.tum with the epoch.
    np.savetxt(slam2, np.column_stack([t + 1e9, pos, quat]))

    out_dir = tmp_path / "fused"
    rc = main(
        [
            "fuse-batch",
            f"{reference_fixture('yolotum04.txt')}:{reference_fixture('combined_output.txt')}",
            f"{slam2}:{gps2}",
            "--json",
            "-o",
            str(out_dir),
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    payload = json.loads(captured[: captured.rindex("}") + 1])
    assert payload["buckets"] == 2
    rows = payload["sequences"]
    assert len(rows) == 2
    assert all(r["ok"] for r in rows)
    assert abs(rows[0]["sim3_scale"] - 0.986986) < 1e-4  # seq-04 golden scale
    assert rows[0]["poses"] == 271 and rows[1]["poses"] == 100
    assert rows[1]["ate_rmse_m"] < 0.2
    assert os.path.exists(rows[0]["output"]) and os.path.exists(rows[1]["output"])
    assert np.loadtxt(rows[1]["output"]).shape == (100, 8)


def test_fuse_robust_cli(capsys):
    """`fuse --robust` runs the χ²-gated filter and reports the gate stats
    (VERDICT r2 task 5: extensions user-reachable)."""
    rc = main(
        [
            "fuse",
            reference_fixture("yolotum04.txt"),
            reference_fixture("combined_output.txt"),
            "--robust",
            "--json",
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    payload = json.loads(captured[: captured.rindex("}") + 1])
    assert "robust_accepted" in payload
    # Clean seq-04: the gate keeps (essentially) everything, and the result
    # stays within the reference error envelope.
    assert payload["robust_accepted"] >= 260
    assert payload["nn_vs_primary"]["ekf"]["rmse_m"] < 0.15


def test_refine_graph_cli(tmp_path, capsys):
    """`refine-graph` runs GN+CG seeded from fusion and exports a refined
    trajectory whose ATE stays in the fused envelope."""
    out = tmp_path / "refined.txt"
    rc = main(
        [
            "refine-graph",
            reference_fixture("yolotum04.txt"),
            reference_fixture("combined_output.txt"),
            "-o",
            str(out),
            "--iterations",
            "4",
            "--cg-iters",
            "25",
            "--json",
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    payload = json.loads(captured[: captured.rindex("}") + 1])
    assert payload["poses"] == 271
    assert payload["final_cost"] <= payload["initial_cost"]
    assert payload["ate_rmse_m"] < 0.5
    # seq-04 does not revisit itself: the proposer must stay silent.
    assert payload["loops_proposed"] == 0
    assert out.exists()
    assert np.loadtxt(str(out)).shape == (271, 8)


def test_viz_slam_layer_drawn_or_annotated(tmp_path):
    """The raw-SLAM overlay is drawn whenever frames are commensurate (ENU)
    and its omission is ANNOTATED when they are not (UTM working frame, where
    SLAM's local origin sits ~5e6 m from the UTM coordinates) — no silent
    dropping (VERDICT r2 task 8)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gps_optimize_slam_tpu import pipeline
    from gps_optimize_slam_tpu.viz import plot_fusion_result

    def layer_labels(fig):
        ax = fig.axes[0]
        labels = [ln.get_label() for ln in ax.get_lines()]
        texts = [t.get_text() for t in ax.texts]
        return labels, texts

    res_enu = pipeline.fuse_files(
        reference_fixture("yolotum04.txt"),
        reference_fixture("combined_output.txt"),
        frame="enu",
    )
    fig = plot_fusion_result(res_enu, str(tmp_path / "enu.png"), close=False)
    labels, texts = layer_labels(fig)
    assert "Original SLAM" in labels, labels
    plt.close(fig)

    res_utm = pipeline.fuse_files(
        reference_fixture("yolotum04.txt"),
        reference_fixture("combined_output.txt"),
        frame="utm",
    )
    fig = plot_fusion_result(res_utm, str(tmp_path / "utm.png"), close=False)
    labels, texts = layer_labels(fig)
    assert "Original SLAM" not in labels
    assert any("omitted" in t for t in texts), texts
    plt.close(fig)


def test_viz_layer_toggles_reference_checkbuttons(tmp_path):
    """The reference's show/hide-layer CheckButtons (EKFGPSSLAM.py:561-597)
    are rebuilt: each trajectory layer registers its 2D+3D artists on the
    figure, `toggle_layer` flips them and refreshes legends, and the
    interactive CheckButtons drive the same path (exercised here
    programmatically via set_active — works on any backend)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gps_optimize_slam_tpu import pipeline
    from gps_optimize_slam_tpu.viz import plot_fusion_result, toggle_layer

    res = pipeline.fuse_files(
        reference_fixture("yolotum04.txt"),
        reference_fixture("combined_output.txt"),
        frame="enu",
    )
    fig = plot_fusion_result(res, str(tmp_path / "i.png"), interactive=True)
    layers = fig._layer_artists
    for want in ("Original SLAM", "Sim3 Aligned", "EKF Fused", "GPS (kept)"):
        assert want in layers, list(layers)
    # Sim3/EKF/GPS layers span both the 2D and the 3D overlay.
    assert len(layers["EKF Fused"]) == 2

    assert all(a.get_visible() for a in layers["EKF Fused"])
    assert toggle_layer(fig, "EKF Fused") is False
    assert not any(a.get_visible() for a in layers["EKF Fused"])
    # Hidden layers leave the legend.
    leg = fig._layer_axes[0].get_legend()
    assert all(t.get_text() != "EKF Fused" for t in leg.get_texts())
    assert toggle_layer(fig, "EKF Fused") is True
    assert all(a.get_visible() for a in layers["EKF Fused"])

    # The mounted CheckButtons drive the same toggling.
    (check,) = fig._widgets_store
    idx = list(layers).index("Sim3 Aligned")
    check.set_active(idx)
    assert not any(a.get_visible() for a in layers["Sim3 Aligned"])
    check.set_active(idx)
    assert all(a.get_visible() for a in layers["Sim3 Aligned"])
    plt.close(fig)


def test_fuse_chunked_cli(tmp_path, capsys):
    """`fuse --chunked` (out-of-core path) reproduces the golden seq-04
    numbers and exports a TUM file. chunk-size 159 shares the chunked-kernel
    shape test_fusion_chunked/test_kalman_chunked already compile."""
    out = tmp_path / "fused_chunked.txt"
    rc = main(
        [
            "fuse",
            reference_fixture("yolotum04.txt"),
            reference_fixture("combined_output.txt"),
            "--chunked",
            "--chunk-size",
            "159",
            "-o",
            str(out),
            "--json",
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    payload = json.loads(captured[: captured.rindex("}") + 1])
    assert payload["poses"] == 271
    assert payload["chunked"] is True
    assert abs(payload["sim3_scale"] - 0.986986) < 1e-5
    assert abs(payload["nn_vs_primary"]["ekf"]["rmse_m"] - 0.0839) < 1e-3
    assert np.loadtxt(str(out)).shape == (271, 8)


def test_fuse_chunked_with_gt(tmp_path, capsys):
    """`fuse --chunked --gt` (VERDICT r3 task 8): the streamed GT evaluator
    reproduces the in-core GT numbers on seq-04 (reference unconditional GT
    comparison, EKFGPSSLAM.py:1044-1067)."""
    rc = main(
        [
            "fuse",
            reference_fixture("yolotum04.txt"),
            reference_fixture("combined_output.txt"),
            "--gt",
            reference_fixture("5.1Kitti04gps"),
            "--chunked",
            "--chunk-size",
            "159",
            "--json",
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    payload = json.loads(captured[: captured.rindex("}") + 1])
    assert payload["chunked"] is True
    assert abs(payload["sim3_scale"] - 0.986986) < 1e-5
    # Same bars as the in-core GT test (test_fuse_json_with_gt_and_outputs).
    assert abs(payload["nn_vs_primary"]["ekf"]["rmse_m"] - 0.0839) < 1e-3
    assert abs(payload["nn_vs_ground_truth"]["ekf"]["rmse_m"] - 0.173) < 2e-3


def test_fuse_chunked_plot_decimated_overview(tmp_path, capsys):
    """`fuse --chunked --plot`: the 4-panel overview renders from the
    decimated view (ChunkedPipelineResult.decimated_view) so >HBM fusions
    keep the reference's plotting surface."""
    out = tmp_path / "chunked_overview.png"
    rc = main(
        [
            "fuse",
            reference_fixture("yolotum04.txt"),
            reference_fixture("combined_output.txt"),
            "--chunked",
            "--chunk-size",
            "159",
            "--plot",
            str(out),
        ]
    )
    assert rc == 0
    assert out.exists() and out.stat().st_size > 10_000
    assert "decimated overview" in capsys.readouterr().out


def test_chunked_decimated_view_strides_all_pose_arrays():
    from gps_optimize_slam_tpu import pipeline
    from gps_optimize_slam_tpu.viz import plot_fusion_result
    import matplotlib

    matplotlib.use("Agg")
    res = pipeline.fuse_files_chunked(
        reference_fixture("yolotum04.txt"),
        reference_fixture("combined_output.txt"),
        chunk_size=159,
        evaluate=False,
    )
    view = res.decimated_view(max_points=100)
    n = len(view.slam["timestamps"])
    assert n <= 100
    assert view.corrected_pos.shape == (n, 3)
    assert view.outputs.sim3_pos.shape == (n, 3)
    assert view.outputs.aligned_gps.shape == (n, 3)
    assert view.outputs.gps_valid.shape == (n,)
    # The decimated view renders through the same plotting path.
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "v.png")
        plot_fusion_result(view, p)
        assert os.path.getsize(p) > 10_000


def test_fuse_chunked_robust_cli(capsys):
    """`fuse --chunked --robust`: the χ² gate streams at >HBM scale
    (models.robust.fuse_robust_chunked). Clean seq-04 keeps ~everything and
    the gated trajectory stays at the golden accuracy."""
    rc = main(
        [
            "fuse",
            reference_fixture("yolotum04.txt"),
            reference_fixture("combined_output.txt"),
            "--chunked",
            "--chunk-size",
            "159",
            "--robust",
            "--json",
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    payload = json.loads(captured[: captured.rindex("}") + 1])
    assert payload["chunked"] is True
    assert payload["robust_accepted"] >= 260
    assert abs(payload["nn_vs_primary"]["ekf"]["rmse_m"] - 0.0839) < 2e-3
