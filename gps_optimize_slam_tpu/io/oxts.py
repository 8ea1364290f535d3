"""KITTI oxts GNSS extraction (GPSmerge equivalent).

Replaces GPSmerge.py (reference, whole file): parses the oxts
``timestamps.txt`` datetime strings, rebases them with a user time offset,
joins the per-frame ``data/%010d.txt`` rows keeping lat/lon/alt plus the
numsats/velmode quality columns (oxts columns 25 and 27), and returns (or
writes) ``ts lat lon alt numsats velmode`` rows.

Offset semantics: the reference ADDS the offset at every step, not once
(GPSmerge.py:29-34) — cumulative drift of +offset per frame (quirk Q3;
measured +0.93 ms/frame on the shipped fixture from a sub-ms offset entry).
``cumulative_offset=True`` reproduces that behaviour for byte-level parity;
False applies the offset once (the presumably intended semantics).
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Dict, Optional

import numpy as np


def parse_oxts_timestamps(
    timestamp_path: str, time_offset: float, cumulative_offset: bool = True
) -> np.ndarray:
    """Parse oxts timestamps.txt and rebase to the user offset."""
    raw = []
    with open(timestamp_path) as f:
        for line in f:
            s = line.strip()
            if not s:
                continue
            s = s[:26]  # truncate to microseconds
            t = datetime.strptime(s, "%Y-%m-%d %H:%M:%S.%f")
            raw.append((t - datetime(1970, 1, 1)).total_seconds())
    raw = np.asarray(raw)
    if len(raw) == 0:
        return raw
    diffs = np.diff(raw)
    if cumulative_offset:
        # Reference semantics: ts[i] = ts[i-1] + diff + offset.
        out = time_offset + np.concatenate(
            [[0.0], np.cumsum(diffs + time_offset)]
        )
    else:
        out = time_offset + np.concatenate([[0.0], np.cumsum(diffs)])
    return out


def extract_oxts(
    oxts_folder: str,
    time_offset: float = 0.0,
    cumulative_offset: bool = True,
    output_file: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Extract GNSS fixes from a KITTI oxts folder.

    Returns {'timestamps','lats','lons','alts','numsats','velmode'}; writes
    the reference-format combined file if ``output_file`` is given."""
    ts_path = os.path.join(oxts_folder, "timestamps.txt")
    data_dir = os.path.join(oxts_folder, "data")
    if not os.path.exists(ts_path):
        raise ValueError(f"timestamps file not found: {ts_path}")
    if not os.path.isdir(data_dir):
        raise ValueError(f"oxts data folder not found: {data_dir}")

    times = parse_oxts_timestamps(ts_path, time_offset, cumulative_offset)

    native_rows = None
    try:
        from gps_optimize_slam_tpu.io import native

        native_rows = native.oxts_scan(data_dir, len(times))
    except ValueError:
        native_rows = None  # malformed file: fall back to the Python loop

    if native_rows is not None and len(native_rows):
        arr = native_rows[:, 1:]
        kept_times = times[native_rows[:, 0].astype(int)]
    else:
        rows = []
        kept_times = []
        for idx, t in enumerate(times):
            f = os.path.join(data_dir, f"{idx:010d}.txt")
            if not os.path.exists(f):
                continue
            d = np.loadtxt(f)
            if d.ndim == 1:
                d = d[None, :]
            for r in d:
                rows.append((r[0], r[1], r[2], int(r[25]), int(r[27])))
                kept_times.append(t)
        if not rows:
            raise ValueError(f"no oxts data rows found under {data_dir}")
        arr = np.asarray(rows, dtype=float)
        kept_times = np.asarray(kept_times)
    out = {
        "timestamps": np.asarray(kept_times),
        "lats": arr[:, 0],
        "lons": arr[:, 1],
        "alts": arr[:, 2],
        "numsats": arr[:, 3].astype(int),
        "velmode": arr[:, 4].astype(int),
    }
    if output_file:
        with open(output_file, "w") as f:
            for t, la, lo, al, ns, vm in zip(
                out["timestamps"], out["lats"], out["lons"], out["alts"],
                out["numsats"], out["velmode"],
            ):
                f.write(f"{t:.18e} {la} {lo} {al} {ns} {vm}\n")
    return out
