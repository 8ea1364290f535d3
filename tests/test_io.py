"""I/O layer tests: native parser parity, TUM/KITTI/oxts readers."""

import os

import numpy as np
import pytest

from gps_optimize_slam_tpu.io import gps as gps_io
from gps_optimize_slam_tpu.io import kitti, oxts
from gps_optimize_slam_tpu.io import tum as tum_io
from gps_optimize_slam_tpu.io.native import loadtxt, native_available
from tests.conftest import reference_fixture


def test_native_parser_matches_numpy_on_fixtures():
    for f in ["yolotum04.txt", "combined_output.txt", "04.txt", "5.1Kitti04gps"]:
        a = loadtxt(reference_fixture(f))
        b = np.loadtxt(reference_fixture(f))
        np.testing.assert_array_equal(a, b.reshape(a.shape))


def test_native_parser_comma_and_comments(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("# header comment\n1.0,2.0,3e-2\n-4.5,\t6.0, .5\n")
    a = loadtxt(str(p))
    np.testing.assert_allclose(a, [[1.0, 2.0, 0.03], [-4.5, 6.0, 0.5]])


def test_native_parser_errors(tmp_path):
    if not native_available():
        pytest.skip("native parser not built")
    ragged = tmp_path / "r.txt"
    ragged.write_text("1 2 3\n4 5\n")
    with pytest.raises(ValueError):
        loadtxt(str(ragged))
    bad = tmp_path / "b.txt"
    bad.write_text("1 2\nx y\n")
    with pytest.raises(ValueError):
        loadtxt(str(bad))


def test_read_tum_validates_columns(tmp_path):
    p = tmp_path / "bad.txt"
    np.savetxt(p, np.zeros((3, 5)))
    with pytest.raises(ValueError, match="8 columns"):
        tum_io.read_tum(str(p))
    with pytest.raises(ValueError, match="not found"):
        tum_io.read_tum(str(tmp_path / "missing.txt"))


def test_gps_reader_validity_gates(tmp_path):
    p = tmp_path / "g.txt"
    rows = np.array(
        [
            [0.0, 49.0, 8.4, 100.0],
            [1.0, 95.0, 8.4, 100.0],   # |lat|>90
            [2.0, 49.0, 185.0, 100.0], # |lon|>180
            [3.0, 0.0, 8.4, 100.0],    # lat==0
            [4.0, 49.0, 0.0, 100.0],   # lon==0
            [5.0, 49.1, 8.5, 101.0],
        ]
    )
    np.savetxt(p, rows)
    d = gps_io.read_gps_fixes(str(p))
    np.testing.assert_array_equal(d["valid"], [1, 0, 0, 0, 0, 1])


def test_kitti_to_tum_matches_shipped_conversion(tmp_path):
    # yolotum04.txt is exactly kitti2tum(yolokitti04.txt, times04.txt)
    # (verified by the survey, SURVEY §2.3) — our converter must reproduce it.
    traj = kitti.kitti_to_trajectory(
        reference_fixture("yolokitti04.txt"), reference_fixture("times04.txt")
    )
    shipped = tum_io.read_tum(reference_fixture("yolotum04.txt"))
    np.testing.assert_allclose(traj["timestamps"], shipped["timestamps"], atol=1e-9)
    np.testing.assert_allclose(traj["positions"], shipped["positions"], atol=1e-9)
    dots = np.abs(np.sum(traj["quaternions"] * shipped["quaternions"], axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-9)
    # Round-trip through the file writer.
    out = tmp_path / "out.txt"
    kitti.kitti_to_tum_file(
        reference_fixture("yolokitti04.txt"), reference_fixture("times04.txt"), str(out)
    )
    back = tum_io.read_tum(str(out))
    np.testing.assert_allclose(back["positions"], shipped["positions"], atol=1e-6)


def test_oxts_extract_roundtrip(tmp_path):
    # Synthesize a tiny oxts folder and check both offset modes.
    d = tmp_path / "oxts"
    (d / "data").mkdir(parents=True)
    ts = ["2011-09-30 11:50:40.354663000", "2011-09-30 11:50:40.457765000",
          "2011-09-30 11:50:40.561034000"]
    (d / "timestamps.txt").write_text("\n".join(ts) + "\n")
    row = np.zeros(30)
    row[0], row[1], row[2], row[25], row[27] = 49.03, 8.39, 112.0, 4, 5
    for i in range(3):
        r = row.copy()
        r[0] += i * 1e-5
        np.savetxt(d / "data" / f"{i:010d}.txt", r[None])

    out = oxts.extract_oxts(str(d), time_offset=0.5, cumulative_offset=True)
    # Reference semantics (Q3): ts[0]=offset, each step re-adds the offset.
    diffs = np.diff(out["timestamps"])
    assert out["timestamps"][0] == 0.5
    assert np.all(diffs > 0.5)  # raw dt (~0.103 s) + 0.5 re-added
    assert np.all(out["numsats"] == 4) and np.all(out["velmode"] == 5)

    out2 = oxts.extract_oxts(str(d), time_offset=0.5, cumulative_offset=False)
    diffs2 = np.diff(out2["timestamps"])
    assert np.all(np.abs(diffs2 - 0.103) < 5e-3)  # offset applied once

    f = tmp_path / "combined.txt"
    oxts.extract_oxts(str(d), time_offset=0.0, output_file=str(f))
    reread = gps_io.read_gps_fixes(str(f))
    assert reread["valid"].all() and len(reread["timestamps"]) == 3


def test_checkpoint_roundtrip(tmp_path):
    from gps_optimize_slam_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    state = {"pos": np.arange(12.0).reshape(4, 3), "q": np.ones((4, 4))}
    p = str(tmp_path / "ck")
    save_checkpoint(p, state, {"note": "round1"})
    restored, meta = restore_checkpoint(
        p, {"pos": np.zeros((4, 3)), "q": np.zeros((4, 4))}
    )
    np.testing.assert_array_equal(restored["pos"], state["pos"])
    assert meta == {"note": "round1"}


def test_native_parser_rejects_file_growth(tmp_path):
    # Regression for ADVICE r1 (low): the fill pass must treat the sizing
    # call's row count as buffer capacity — a file that gained rows between
    # the two calls returns an error instead of overflowing the buffer.
    import ctypes

    from gps_optimize_slam_tpu.io import native as native_mod

    if not native_available():
        pytest.skip("native parser not built")
    lib = native_mod._get_lib()
    p = tmp_path / "grow.txt"
    p.write_text("1 2 3\n4 5 6\n")
    rows = ctypes.c_int64(0)
    cols = ctypes.c_int64(0)
    rc = lib.fastparse_table(str(p).encode(), None, ctypes.byref(rows), ctypes.byref(cols))
    assert rc == 0 and rows.value == 2 and cols.value == 3
    # File grows after the sizing call.
    with p.open("a") as f:
        f.write("7 8 9\n10 11 12\n")
    buf = (ctypes.c_double * (rows.value * cols.value))()
    rc = lib.fastparse_table(
        str(p).encode(),
        ctypes.cast(buf, ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(rows),
        ctypes.byref(cols),
    )
    assert rc == -6


def test_native_oxts_scan_parity(tmp_path):
    """The C directory scanner returns exactly what the Python loop reads,
    including skipped (missing) frame files and multi-row frames."""
    from gps_optimize_slam_tpu.io import native

    if not native.native_available():
        import pytest

        pytest.skip("native library unavailable")

    d = tmp_path / "oxts"
    (d / "data").mkdir(parents=True)
    rng = np.random.default_rng(0)
    n_frames = 7
    expect = []
    for i in range(n_frames):
        if i == 3:
            continue  # hole: frame file missing
        rows = 2 if i == 5 else 1
        block = rng.normal(size=(rows, 30))
        np.savetxt(d / "data" / f"{i:010d}.txt", block)
        reread = np.loadtxt(d / "data" / f"{i:010d}.txt")
        if reread.ndim == 1:
            reread = reread[None]
        for r in reread:
            expect.append([i, r[0], r[1], r[2], r[25], r[27]])

    got = native.oxts_scan(str(d / "data"), n_frames)
    assert got is not None
    np.testing.assert_allclose(got, np.asarray(expect), rtol=0, atol=0)
