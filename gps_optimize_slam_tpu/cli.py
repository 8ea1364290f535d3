"""Command-line front-end.

Replaces the reference's tkinter dialog flow (EKFGPSSLAM.py:669-674,
940-956) and the GPSmerge/kitti2tum script entry points with one CLI:

    python -m gps_optimize_slam_tpu fuse SLAM.tum GPS.txt [-o OUT] [--gt GT]
        [--frame utm|enu] [--plot out.png] [--json]
    python -m gps_optimize_slam_tpu kitti2tum POSES TIMES OUT
    python -m gps_optimize_slam_tpu oxts-extract OXTS_DIR [-o OUT]
        [--offset SECONDS] [--single-offset]
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_fuse(args) -> int:
    import numpy as np
    import jax.numpy as jnp

    from gps_optimize_slam_tpu import pipeline
    from gps_optimize_slam_tpu.config import FusionConfig
    from gps_optimize_slam_tpu.utils.logging import enable as enable_logging

    if args.verbose:
        enable_logging()

    config = FusionConfig()
    result = pipeline.fuse_files(
        args.slam, args.gps, config=config, frame=args.frame, seed=args.seed
    )
    if args.gt:
        gt_stats = _evaluate_against_gt(result, args.gt, config)
    else:
        gt_stats = None

    if args.json:
        ev = result.evaluation

        def stats(s):
            return {
                "mean_m": float(s.mean),
                "median_m": float(s.median),
                "rmse_m": float(s.rmse),
                "max_m": float(s.max),
                "count": int(s.count),
            }

        out = {
            "poses": len(result.slam["timestamps"]),
            "gps_kept": int(result.gps.valid.sum()),
            "sim3_scale": result.sim3_scale,
            "nn_vs_primary": {
                "slam": stats(ev.nn_slam),
                "sim3": stats(ev.nn_sim3),
                "ekf": stats(ev.nn_ekf),
            },
            "ate_vs_primary": {"sim3": stats(ev.ate_sim3), "ekf": stats(ev.ate_ekf)},
        }
        if gt_stats is not None:
            out["nn_vs_ground_truth"] = gt_stats
        print(json.dumps(out, indent=2))
    else:
        print(result.summary())
        if gt_stats is not None:
            print(
                "vs ground-truth GNSS: "
                + ", ".join(f"{k} rmse={v['rmse_m']:.3f}m" for k, v in gt_stats.items())
            )

    if args.output:
        wgs = None
        if args.frame == "utm":
            wgs = (
                args.output.replace("_utm.txt", "_wgs84.txt")
                if "_utm.txt" in args.output
                else args.output.rsplit(".", 1)[0] + "_wgs84.txt"
            )
        pipeline.export_result(result, args.output, wgs)
        print(f"saved: {args.output}" + (f" and {wgs}" if wgs else ""))
    if args.plot:
        from gps_optimize_slam_tpu.viz import plot_fusion_result

        plot_fusion_result(result, args.plot)
        print(f"plot saved: {args.plot}")
    return 0


def _evaluate_against_gt(result, gt_path: str, config):
    """Optional ground-truth GNSS comparison (reference: the GT flow in
    main_process_gui, EKFGPSSLAM.py:1044-1067)."""
    import jax.numpy as jnp

    from gps_optimize_slam_tpu import pipeline
    from gps_optimize_slam_tpu.ops import alignment, metrics

    gt = pipeline.load_and_project_gps(
        gt_path,
        config.ground_truth_gps_filtering,
        frame=result.gps.frame,
        lon_first=True,
    )
    slam_t = jnp.asarray(result.slam["timestamps"])
    al = alignment.align_gps_to_slam(
        slam_t,
        jnp.asarray(gt.timestamps),
        jnp.asarray(gt.positions),
        gps_valid=jnp.asarray(gt.valid),
        cfg=config.time_alignment,
    )
    gate = metrics.eval_mask(slam_t, al.valid, 5.0)
    cands = jnp.nan_to_num(al.aligned, nan=0.0)
    out = {}
    for name, traj in [
        ("slam", jnp.asarray(result.slam["positions"])),
        ("sim3", result.outputs.sim3_pos),
        ("ekf", result.outputs.corrected_pos),
    ]:
        st = metrics.error_stats(metrics.nn_errors(traj, cands, gate, gate), gate)
        out[name] = {
            "mean_m": float(st.mean),
            "median_m": float(st.median),
            "rmse_m": float(st.rmse),
            "max_m": float(st.max),
            "count": int(st.count),
        }
    return out


def _cmd_kitti2tum(args) -> int:
    from gps_optimize_slam_tpu.io.kitti import kitti_to_tum_file

    kitti_to_tum_file(args.poses, args.times, args.out)
    print(f"wrote {args.out}")
    return 0


def _cmd_oxts(args) -> int:
    from gps_optimize_slam_tpu.io.oxts import extract_oxts

    out = extract_oxts(
        args.oxts_dir,
        time_offset=args.offset,
        cumulative_offset=not args.single_offset,
        output_file=args.output,
    )
    print(f"extracted {len(out['timestamps'])} fixes" + (f" -> {args.output}" if args.output else ""))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gps_optimize_slam_tpu",
        description="TPU-native GNSS+SLAM trajectory fusion",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("fuse", help="fuse a SLAM trajectory with GNSS fixes")
    f.add_argument("slam", help="TUM-format SLAM trajectory")
    f.add_argument("gps", help="GNSS fixes: ts lat lon alt ...")
    f.add_argument("-o", "--output", help="output TUM path (working frame)")
    f.add_argument("--gt", help="ground-truth GNSS file (ts lon lat alt ...)")
    f.add_argument("--frame", choices=["utm", "enu"], default="utm")
    f.add_argument("--seed", type=int, default=0)
    f.add_argument("--json", action="store_true", help="machine-readable output")
    f.add_argument("--plot", help="save a matplotlib overview figure (png)")
    f.add_argument("-v", "--verbose", action="store_true", help="step logging")
    f.set_defaults(fn=_cmd_fuse)

    k = sub.add_parser("kitti2tum", help="KITTI poses+times -> TUM file")
    k.add_argument("poses")
    k.add_argument("times")
    k.add_argument("out")
    k.set_defaults(fn=_cmd_kitti2tum)

    o = sub.add_parser("oxts-extract", help="extract GNSS fixes from KITTI oxts/")
    o.add_argument("oxts_dir")
    o.add_argument("-o", "--output")
    o.add_argument("--offset", type=float, default=0.0)
    o.add_argument(
        "--single-offset",
        action="store_true",
        help="apply the time offset once (the reference re-adds it every "
        "frame — quirk Q3; default reproduces that)",
    )
    o.set_defaults(fn=_cmd_oxts)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
