"""CLI end-to-end tests (the tkinter-GUI replacement surface)."""

import json
import os

import numpy as np
import pytest

from gps_optimize_slam_tpu.cli import build_parser, main
from tests.conftest import reference_fixture


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
