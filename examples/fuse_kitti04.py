#!/usr/bin/env python
"""End-to-end single-sequence fusion on the shipped KITTI seq-04 fixture.

Mirrors the reference's interactive run (EKFGPSSLAM.py main_process_gui)
as three library calls: fuse, evaluate vs ground-truth GNSS, export + plot.

    python examples/fuse_kitti04.py [--out-dir /tmp/fusion_out]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/fusion_out")
    ap.add_argument("--slam", default="/root/reference/yolotum04.txt")
    ap.add_argument("--gps", default="/root/reference/combined_output.txt")
    ap.add_argument("--gt", default="/root/reference/5.1Kitti04gps")
    args = ap.parse_args()

    from gps_optimize_slam_tpu import pipeline, viz

    import jax

    # ENU is the TPU-native frame: small local coordinates are f32-safe
    # (UTM's ~5e6 m northings are not); on CPU f64 either frame is exact.
    frame = "enu" if jax.devices()[0].platform != "cpu" else "utm"
    res = pipeline.fuse_files(
        slam_path=args.slam,
        gps_path=args.gps,
        frame=frame,
        gt_path=args.gt if os.path.exists(args.gt) else None,
        gt_lon_first=True,  # the shipped GT file is lon-first (SURVEY Q4)
    )
    print(res.summary())

    os.makedirs(args.out_dir, exist_ok=True)
    utm_path = os.path.join(args.out_dir, "fused_traj.txt")
    # WGS84 export needs the UTM working frame (ENU has no stored zone).
    wgs_path = os.path.join(args.out_dir, "fused_wgs84.txt") if frame == "utm" else None
    pipeline.export_result(res, utm_path=utm_path, wgs84_path=wgs_path)
    fig_path = os.path.join(args.out_dir, "overview.png")
    viz.plot_fusion_result(res, out_path=fig_path)
    print(f"wrote {utm_path}, {wgs_path or '(no wgs84 in enu frame)'}, {fig_path}")


if __name__ == "__main__":
    main()
