"""Host-side orchestration: files → device fusion → evaluation → export.

Replaces the reference's GUI-driven main_process_gui (EKFGPSSLAM.py:940-1123)
with a config/argument-driven API (and CLI in gps_optimize_slam_tpu.cli):
no tkinter, no blocking dialogs — the GUI was incidental to the capability
(SURVEY §2.2). The numeric path is identical: load → UTM project → RANSAC
outlier gate → one jitted `fuse_core` call → evaluation → TUM export in UTM
and WGS84.

Frame choice: ``frame="utm"`` reproduces the reference's UTM working frame
(needed for golden parity); ``frame="enu"`` uses a local East/North/Up
tangent frame — the TPU-native option whose small coordinates keep float32
viable on-chip (BASELINE.json north star).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.config import FusionConfig, GPSFilterConfig
from gps_optimize_slam_tpu.io import gps as gps_io
from gps_optimize_slam_tpu.io import tum as tum_io
from gps_optimize_slam_tpu.models import fusion
from gps_optimize_slam_tpu.ops import alignment, geodesy, ransac
from gps_optimize_slam_tpu.utils.logging import get_logger, step


@dataclasses.dataclass
class GPSData:
    """Projected + outlier-gated GNSS track.

    ``valid`` may be constructed from the DEVICE array the outlier gate
    produced (load_and_project_gps does this): it materializes to NumPy
    lazily on first host access, so the fuse path — which consumes the
    mask device-to-device — never blocks on a device→host round trip
    (~25 ms apiece over a tunneled TPU). The async copy is started at
    load, so by the time summary()/viz/CLI read it the transfer has long
    overlapped with the fusion itself."""

    timestamps: np.ndarray  # (M,) all loaded fixes
    positions: np.ndarray  # (M,3) projected (UTM or ENU)
    valid: np.ndarray  # (M,) bool — range-valid AND RANSAC inlier
    frame: str
    utm_zone: int
    utm_south: bool
    enu_origin: Optional[np.ndarray] = None  # (lon, lat, alt) when frame=enu

    def __getattribute__(self, name):
        v = object.__getattribute__(self, name)
        if name == "valid" and not isinstance(v, np.ndarray):
            v = np.asarray(v)
            object.__setattr__(self, "valid", v)
        return v

    def raw_valid(self):
        """The validity mask exactly as stored — a jax.Array when the gate
        result has not been materialized to host, else np.ndarray. Device
        consumers (fuse_arrays) use this to stay on-device."""
        return object.__getattribute__(self, "valid")


@dataclasses.dataclass
class FusionResult:
    slam: Dict[str, np.ndarray]
    gps: GPSData
    outputs: fusion.FusionOutputs
    evaluation: fusion.Evaluation
    config: FusionConfig
    # Estimated clock offset (s) added to GPS timestamps before alignment.
    time_offset: float = 0.0
    # Optional ground-truth GNSS comparison (reference EKFGPSSLAM.py:1044-1082).
    gt: Optional[GPSData] = None
    gt_evaluation: Optional[fusion.Evaluation] = None
    gt_aligned: Optional[alignment.AlignedGPS] = None
    # χ²-gated robust fusion (models.robust), when requested: the mask of
    # GNSS measurements that survived the NIS gate. corrected_pos/quat then
    # hold the robust trajectory.
    robust_accepted: Optional[np.ndarray] = None

    @property
    def corrected_pos(self) -> np.ndarray:
        return np.asarray(self.outputs.corrected_pos)

    @property
    def corrected_quat(self) -> np.ndarray:
        return np.asarray(self.outputs.corrected_quat)

    @property
    def sim3_scale(self) -> float:
        return float(self.outputs.sim3.scale)

    def summary(self) -> str:
        ev = self.evaluation
        # Start ALL device→host copies asynchronously before any is read:
        # the naive per-scalar float()/int() fetch is one full round trip
        # apiece — ~30 scalars × ~23 ms tunnel RTT was 0.63 s of the warm
        # end-to-end wall (BENCH r5 e2e profiling), dwarfing the fusion
        # itself. copy_to_host_async overlaps them into ~one RTT.
        for leaf in jax.tree.leaves(
            (
                ev,
                self.gt_evaluation,
                self.outputs.sim3,
                self.outputs.sim3_inliers,
                self.outputs.ok,
            )
        ):
            if isinstance(leaf, jax.Array):
                leaf.copy_to_host_async()
        lines = [
            f"poses: {len(self.slam['timestamps'])}, "
            f"gps fixes kept: {int(self.gps.valid.sum())}/{len(self.gps.valid)}, "
            f"frame: {self.gps.frame} (zone {self.gps.utm_zone}"
            f"{'S' if self.gps.utm_south else 'N'})",
            f"sim3: scale={self.sim3_scale:.6f} ok={bool(self.outputs.ok)} "
            f"inliers={int(np.asarray(self.outputs.sim3_inliers).sum())}",
        ]
        for name, st in [
            ("raw SLAM  (NN)", ev.nn_slam),
            ("Sim3      (NN)", ev.nn_sim3),
            ("EKF fused (NN)", ev.nn_ekf),
            ("Sim3     (ATE)", ev.ate_sim3),
            ("EKF      (ATE)", ev.ate_ekf),
        ]:
            lines.append(
                f"{name}: mean={float(st.mean):.3f}m median={float(st.median):.3f}m "
                f"rmse={float(st.rmse):.3f}m max={float(st.max):.3f}m "
                f"n={int(st.count)}"
            )
        if self.gt_evaluation is not None:
            gv = self.gt_evaluation
            for name, st in [
                ("vs GT: Sim3 (NN)", gv.nn_sim3),
                ("vs GT: EKF  (NN)", gv.nn_ekf),
            ]:
                lines.append(
                    f"{name}: mean={float(st.mean):.3f}m rmse={float(st.rmse):.3f}m "
                    f"max={float(st.max):.3f}m n={int(st.count)}"
                )
        return "\n".join(lines)


from functools import lru_cache


@lru_cache(maxsize=16)
def _projection_kernel(frame: str, zone: int, south: bool):
    """Geodetic projection as ONE jitted program per (frame, zone): called
    eagerly at load time, the Krüger-series/ENU math otherwise compiles
    ~35 per-op XLA programs on the first trajectory. Traced under the
    caller's enable_x64 + CPU default_device scope (both are jit cache-key
    context, so the cached program stays f64-on-CPU)."""
    if frame == "utm":

        @jax.jit
        def kernel(lons, lats, alts):
            x, y = geodesy.utm_forward(lons, lats, zone, south)
            return jnp.stack([x, y, alts], axis=-1)

    else:

        @jax.jit
        def kernel(lons, lats, alts, origin):
            return geodesy.wgs84_to_enu(
                lons, lats, alts, origin[0], origin[1], origin[2]
            )

    return kernel


@lru_cache(maxsize=16)
def _gps_gate_kernel(cfg: GPSFilterConfig, has_windows: bool):
    """``ransac.gps_poly_ransac_mask`` as ONE jitted program (cached per
    config): called eagerly at load time, its ~90 constituent ops — the
    vmapped per-window polynomial-lstsq trials among them — otherwise
    compile per-op on the process-default backend. Over a tunneled TPU
    that was ~8 min of cold end-to-end wall and ~0.9 s of per-call
    dispatch RTT (BENCH r5 e2e_wall first measurement)."""
    if has_windows:

        @jax.jit
        def kernel(key, times, positions, valid, window_starts):
            return ransac.gps_poly_ransac_mask(
                key, times, positions, valid=valid,
                window_starts=window_starts, cfg=cfg,
            )

    else:

        @jax.jit
        def kernel(key, times, positions, valid):
            return ransac.gps_poly_ransac_mask(
                key, times, positions, valid=valid, cfg=cfg
            )

    return kernel


def load_and_project_gps(
    path: str,
    filter_cfg: GPSFilterConfig,
    frame: str = "utm",
    lon_first: bool = False,
    seed: int = 0,
    dtype=None,
    like: Optional[GPSData] = None,
) -> GPSData:
    """Load GNSS fixes, project to the working frame, gate outliers.

    Equivalent of load_gps_data (reference: EKFGPSSLAM.py:249-289) with the
    filter returning a mask instead of dropping rows.

    ``like``: project into the SAME frame as an already-loaded track (same
    UTM zone / same ENU origin) — required when comparing two tracks, e.g.
    primary GPS vs ground-truth GNSS."""
    raw = gps_io.read_gps_fixes(path, lon_first=lon_first)
    valid = raw["valid"]
    if valid.sum() == 0:
        raise ValueError(f"no valid GPS fixes in {path}")
    if like is not None:
        frame = like.frame
        zone, south = like.utm_zone, like.utm_south
    else:
        zone, south = geodesy.utm_zone_from_lonlat(
            raw["lons"][valid], raw["lats"][valid]
        )
    # Default working dtype: f64 where enabled; otherwise f32 explicitly,
    # rather than letting jnp.asarray warn-and-truncate per array. The f64
    # PROJECTION below is unaffected — it runs under enable_x64.
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    # The geodetic projection ALWAYS runs in float64 on CPU, whatever the
    # fusion dtype/backend: ECEF/UTM intermediates are ~6.4e6 m, so a
    # float32 projection loses ~0.5 m before fusion even starts (measured
    # on the TPU ENU path). Load-time work — latency is irrelevant; only
    # the projected (small, local) coordinates are cast to the working
    # dtype afterwards.
    enu_origin = None
    if frame not in ("utm", "enu"):
        raise ValueError(f"unknown frame {frame!r} (use 'utm' or 'enu')")
    with jax.enable_x64(True), jax.default_device(jax.devices("cpu")[0]):
        lons = jnp.asarray(raw["lons"], jnp.float64)
        lats = jnp.asarray(raw["lats"], jnp.float64)
        alts = jnp.asarray(raw["alts"], jnp.float64)
        proj = _projection_kernel(frame, zone, south)
        if frame == "utm":
            positions64 = np.asarray(proj(lons, lats, alts))
        else:
            if like is not None and like.enu_origin is not None:
                enu_origin = np.asarray(like.enu_origin)
            else:
                first = int(np.argmax(valid))
                enu_origin = np.array(
                    [raw["lons"][first], raw["lats"][first], raw["alts"][first]]
                )
            positions64 = np.asarray(
                proj(lons, lats, alts, jnp.asarray(enu_origin, jnp.float64))
            )
    # device_put of host-converted arrays: each jnp.asarray convert here is
    # an eager per-op dispatch on the default backend (a tunnel RTT apiece
    # on the bench TPU; a per-op compile when cold).
    npdt = np.dtype(jnp.dtype(dtype).name)
    positions = jax.device_put(positions64.astype(npdt))

    times = jax.device_put(np.asarray(raw["timestamps"], npdt))
    if filter_cfg.enabled and filter_cfg.use_sliding_window:
        starts = ransac.reference_window_starts(
            raw["timestamps"][valid], filter_cfg
        )
        window_starts = (
            jax.device_put(np.asarray(starts, npdt)) if len(starts) else None
        )
    else:
        window_starts = None
    gate = _gps_gate_kernel(filter_cfg, window_starts is not None)
    # PRNGKey(seed) built as raw key data (threefry2x32 layout: [0, seed])
    # + device_put — jax.random.PRNGKey is an eager dispatch per call.
    key = jax.device_put(np.asarray([0, seed], np.uint32))
    gate_args = (
        key,
        times,
        positions,
        jax.device_put(np.asarray(valid)),
    ) + ((window_starts,) if window_starts is not None else ())
    keep = gate(*gate_args)
    # Don't block on the gate: hand the DEVICE mask to GPSData (lazy host
    # materialization) and start its device→host copy in the background.
    # fuse_arrays consumes the mask device-to-device, so the warm
    # files→results path serializes ~one round trip instead of two; host
    # consumers (summary, viz, CLI) find the copy already done.
    keep.copy_to_host_async()
    return GPSData(
        timestamps=raw["timestamps"],
        positions=positions64,
        valid=keep,
        frame=frame,
        utm_zone=zone,
        utm_south=south,
        enu_origin=enu_origin,
    )


def estimate_offset(
    slam: Dict[str, np.ndarray], gps: GPSData, config: FusionConfig
) -> float:
    """Clock offset to add to GPS timestamps, per ``config.offset_mode``."""
    mode = config.offset_mode
    if mode == "off":
        return 0.0
    if mode == "faithful":
        # The reference's estimator at its call site (EKFGPSSLAM.py:337) —
        # provably 0.0 on any real input (SURVEY Q1).
        return alignment.estimate_time_offset(
            slam["timestamps"],
            gps.timestamps[gps.valid],
            config.time_alignment.max_samples_for_corr,
        )
    if mode == "xcorr":
        return alignment.estimate_time_offset_xcorr(
            slam["timestamps"],
            slam["positions"],
            gps.timestamps[gps.valid],
            gps.positions[gps.valid],
        )
    if mode == "xcorr_device":
        return float(
            np.asarray(
                alignment.estimate_time_offset_xcorr_device(
                    jnp.asarray(slam["timestamps"]),
                    jnp.asarray(slam["positions"]),
                    jnp.asarray(gps.timestamps),
                    jnp.asarray(gps.positions),
                    gps_valid=jnp.asarray(gps.valid),
                )
            )
        )
    raise ValueError(
        f"unknown offset_mode {mode!r} (off|faithful|xcorr|xcorr_device)"
    )


def fuse_arrays(
    slam: Dict[str, np.ndarray],
    gps: GPSData,
    config: FusionConfig = FusionConfig(),
    seed: int = 0,
    dtype=None,
    gt: Optional[GPSData] = None,
    robust: bool = False,
    robust_gate_chi2: Optional[float] = None,
    robust_iterations: int = 2,
) -> FusionResult:
    """Run the jitted fusion + evaluation on loaded arrays.

    ``gt``: optional independent ground-truth GNSS track (same working frame
    — load with ``load_and_project_gps(..., like=gps)``); evaluated like the
    reference's GT flow (EKFGPSSLAM.py:1044-1082).

    ``robust=True`` re-runs the filter with the χ² NIS innovation gate
    (models.robust, BASELINE config 4) on top of the standard pipeline:
    measurements locally plausible to the polynomial pre-filter but
    inconsistent with the filter state are rejected; the corrected
    trajectory and its evaluation then reflect the gated filter."""
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    # device_put of host-converted arrays (no eager convert dispatches —
    # each is a tunnel RTT on the bench TPU).
    _npdt = np.dtype(jnp.dtype(dtype).name)
    slam_times = jax.device_put(np.asarray(slam["timestamps"], _npdt))
    slam_pos = jax.device_put(np.asarray(slam["positions"], _npdt))
    slam_quat = jax.device_put(np.asarray(slam["quaternions"], _npdt))
    # Host sortedness check → the device program may skip the compaction
    # argsort (identical outputs; see alignment._compact_sort). A sorted
    # FULL time axis is sufficient for any gated subset, and checking it
    # needs no gate mask — the fuse path must not block fetching the
    # device mask (one tunnel RTT). An unsorted full axis whose gated
    # subset happens to be sorted just keeps the (correct) compaction on.
    if not config.gps_sorted:
        ts_all = np.asarray(gps.timestamps)
        if ts_all.size == 0 or np.all(np.diff(ts_all) >= 0):
            config = config.replace(gps_sorted=True)
    if config.offset_mode == "faithful":
        # The reference's estimator is input-independent — provably 0.0 for
        # any ≥2-sample inputs (SURVEY Q1; it correlates two z-scored
        # uniform ramps, strictly maximal at lag 0) — so evaluating it on
        # the UNGATED timestamps is value-identical and keeps the fuse path
        # off the device gate mask.
        offset = alignment.estimate_time_offset(
            slam["timestamps"],
            gps.timestamps,
            config.time_alignment.max_samples_for_corr,
        )
    else:
        offset = estimate_offset(slam, gps, config)
    # The gate mask stays on device: its host materialization would
    # serialize a device→host round trip before the fuse dispatch.
    rawv = gps.raw_valid()
    gps_valid_dev = (
        rawv if isinstance(rawv, jax.Array) else jax.device_put(np.asarray(rawv))
    )
    outputs = fusion.fuse_core(
        slam_times,
        slam_pos,
        slam_quat,
        jax.device_put(np.asarray(gps.timestamps, _npdt)),
        jax.device_put(np.asarray(gps.positions, _npdt)),
        gps_valid_dev,
        jax.device_put(np.asarray([0, seed], np.uint32)),  # PRNGKey(seed) data
        config,
        time_offset=offset,
    )
    robust_accepted = None
    if robust:
        from gps_optimize_slam_tpu.models import robust as robust_mod

        gate = (
            robust_mod.CHI2_3DOF_95 if robust_gate_chi2 is None else robust_gate_chi2
        )
        rres = robust_mod.fuse_robust(
            slam_times,
            slam_pos,
            slam_quat,
            outputs.sim3_pos,
            outputs.sim3_quat,
            outputs.aligned_gps,
            outputs.gps_valid,
            ekf_cfg=config.ekf,
            rts_cfg=config.rts_decision,
            gate_chi2=gate,
            n_iterations=robust_iterations,
        )
        outputs = outputs._replace(
            corrected_pos=rres.positions, corrected_quat=rres.quaternions
        )
        robust_accepted = np.asarray(rres.accepted)
    # Evaluation dispatches BEFORE the ok fetch: both jitted programs
    # pipeline asynchronously, saving one full dispatch round-trip (~30 ms
    # over the tunneled TPU); the failure check below still raises before
    # any result is returned.
    ev = fusion.evaluate(slam_times, slam_pos, outputs)
    # Start device→host copies of everything downstream consumers block on
    # (the ok gate here, summary()'s scalars, export_result's trajectory) in
    # ONE flight alongside the ok fetch: each np.asarray/float() of a device
    # value is otherwise its own ~25 ms round trip on the tunneled TPU
    # (measured: this fold takes the warm files→export wall from ~4 to ~2
    # serialized round trips).
    for leaf in jax.tree.leaves(
        (ev, outputs.ok, outputs.corrected_pos, outputs.corrected_quat,
         outputs.sim3, outputs.sim3_inliers)
    ):
        if isinstance(leaf, jax.Array):
            leaf.copy_to_host_async()
    if not bool(outputs.ok):
        raise RuntimeError(
            "Sim3 global alignment failed (not enough temporally aligned "
            "points or RANSAC consensus too small)"
        )
    gt_ev = gt_al = None
    if gt is not None:
        if gt.frame != gps.frame:
            raise ValueError(
                f"ground-truth frame {gt.frame!r} != working frame {gps.frame!r}"
            )
        gt_rawv = gt.raw_valid()
        gt_ev, gt_al = fusion.evaluate_vs_track(
            slam_times,
            slam_pos,
            outputs,
            jax.device_put(np.asarray(gt.timestamps, _npdt)),
            jax.device_put(np.asarray(gt.positions, _npdt)),
            gt_rawv
            if isinstance(gt_rawv, jax.Array)
            else jax.device_put(np.asarray(gt_rawv)),
            cfg=config,
        )
    return FusionResult(
        slam=slam,
        gps=gps,
        outputs=outputs,
        evaluation=ev,
        config=config,
        time_offset=float(offset),
        gt=gt,
        gt_evaluation=gt_ev,
        gt_aligned=gt_al,
        robust_accepted=robust_accepted,
    )


def fuse_files(
    slam_path: str,
    gps_path: str,
    config: FusionConfig = FusionConfig(),
    frame: str = "utm",
    seed: int = 0,
    dtype=None,
    gt_path: Optional[str] = None,
    gt_lon_first: bool = True,
    robust: bool = False,
    robust_gate_chi2: Optional[float] = None,
    robust_iterations: int = 2,
) -> FusionResult:
    """End-to-end: TUM SLAM file + GNSS fix file → fused trajectory.

    ``gt_path``: optional ground-truth GNSS file; loaded lon-first by
    default (the shipped `5.1Kitti04gps` header convention, SURVEY Q4) and
    projected into the SAME frame as the primary GPS."""
    n_steps = 4 if gt_path else 3
    step(1, n_steps, f"loading SLAM trajectory {slam_path}")
    slam = tum_io.read_tum(slam_path)
    step(2, n_steps, f"loading + projecting + gating GNSS {gps_path} ({frame})")
    gps = load_and_project_gps(
        gps_path, config.gps_filtering_ransac, frame=frame, seed=seed, dtype=dtype
    )
    gt = None
    if gt_path:
        step(3, n_steps, f"loading ground-truth GNSS {gt_path}")
        gt = load_and_project_gps(
            gt_path,
            config.ground_truth_gps_filtering,
            lon_first=gt_lon_first,
            seed=seed,
            dtype=dtype,
            like=gps,
        )
    step(n_steps, n_steps, "device fusion (align + Sim3 RANSAC + EKF/RTS) + evaluation")
    result = fuse_arrays(
        slam,
        gps,
        config=config,
        seed=seed,
        dtype=dtype,
        gt=gt,
        robust=robust,
        robust_gate_chi2=robust_gate_chi2,
        robust_iterations=robust_iterations,
    )
    get_logger().info("fusion done: %s", result.summary().replace("\n", " | "))
    return result


@dataclasses.dataclass
class ChunkedPipelineResult:
    """Out-of-core fusion of one file pair (pipeline front of
    models.fusion_chunked): host/memmap arrays, O(chunk) device residency."""

    slam: Dict[str, np.ndarray]
    gps: GPSData
    result: "object"  # models.fusion_chunked.ChunkedFusionResult
    evaluation: Optional[fusion.Evaluation]
    config: FusionConfig
    time_offset: float = 0.0
    gt: Optional[GPSData] = None
    gt_evaluation: Optional[fusion.Evaluation] = None
    gt_aligned: Optional["object"] = None  # AlignedGPS of host arrays

    def decimated_view(self, max_points: int = 5000):
        """Duck-typed FusionResult view for ``viz.plot_fusion_result``:
        every pose-length array strided down to ≤ ``max_points`` so >HBM
        fusions still get the reference's 4-panel overview. The Sim3 layer
        is recomputed on the decimated poses (one cheap chunked transform);
        the error panels are evaluated against the DECIMATED candidate set —
        an upper-bound approximation, fine for a trend overview."""
        import types

        from gps_optimize_slam_tpu.models import fusion_chunked

        n = len(self.slam["timestamps"])
        s = max(1, -(-n // max_points))  # ceil
        slam_d = {k: np.asarray(v)[::s] for k, v in self.slam.items()}
        r = self.result
        sim3_pos, _ = fusion_chunked.transform_trajectory_chunked(
            slam_d["positions"],
            slam_d["quaternions"],
            r.sim3,
            dtype=slam_d["positions"].dtype,
        )
        outputs = types.SimpleNamespace(
            sim3_pos=sim3_pos,
            aligned_gps=np.asarray(r.aligned_gps)[::s],
            gps_valid=np.asarray(r.gps_valid)[::s],
        )
        gt_aligned = None
        if self.gt_aligned is not None:
            gt_aligned = types.SimpleNamespace(
                aligned=np.asarray(self.gt_aligned.aligned)[::s],
                valid=np.asarray(self.gt_aligned.valid)[::s],
            )
        return types.SimpleNamespace(
            slam=slam_d,
            gps=self.gps,
            outputs=outputs,
            corrected_pos=np.asarray(r.corrected_pos)[::s],
            gt=self.gt,
            gt_aligned=gt_aligned,
        )

    def summary(self) -> str:
        r = self.result
        lines = [
            f"poses: {len(self.slam['timestamps'])} (chunked/out-of-core), "
            f"gps fixes kept: {int(self.gps.valid.sum())}/{len(self.gps.valid)}, "
            f"frame: {self.gps.frame}",
            f"sim3: scale={float(np.asarray(r.sim3.scale)):.6f} ok={r.ok} "
            f"inliers={r.num_inliers}",
        ]
        if getattr(r, "robust_accepted", None) is not None:
            racc = np.asarray(r.robust_accepted)
            gv = np.asarray(r.gps_valid)
            lines.append(
                f"robust χ² gate: accepted={int(racc.sum())} "
                f"rejected={int((~racc & gv).sum())}"
            )
        if self.evaluation is not None:
            ev = self.evaluation
            for name, st in [
                ("raw SLAM  (NN)", ev.nn_slam),
                ("Sim3      (NN)", ev.nn_sim3),
                ("EKF fused (NN)", ev.nn_ekf),
                ("Sim3     (ATE)", ev.ate_sim3),
                ("EKF      (ATE)", ev.ate_ekf),
            ]:
                lines.append(
                    f"{name}: mean={float(st.mean):.3f}m "
                    f"median={float(st.median):.3f}m rmse={float(st.rmse):.3f}m "
                    f"max={float(st.max):.3f}m n={int(st.count)}"
                )
        if self.gt_evaluation is not None:
            ev = self.gt_evaluation
            lines.append("vs ground-truth GNSS:")
            for name, st in [
                ("raw SLAM  (NN)", ev.nn_slam),
                ("Sim3      (NN)", ev.nn_sim3),
                ("EKF fused (NN)", ev.nn_ekf),
                ("Sim3     (ATE)", ev.ate_sim3),
                ("EKF      (ATE)", ev.ate_ekf),
            ]:
                lines.append(
                    f"{name}: mean={float(st.mean):.3f}m "
                    f"median={float(st.median):.3f}m rmse={float(st.rmse):.3f}m "
                    f"max={float(st.max):.3f}m n={int(st.count)}"
                )
        return "\n".join(lines)


def fuse_files_chunked(
    slam_path: str,
    gps_path: str,
    config: FusionConfig = FusionConfig(),
    frame: str = "utm",
    seed: int = 0,
    chunk_size: int = 262144,
    halo: int = 64,
    dtype=None,
    evaluate: bool = True,
    gt_path: Optional[str] = None,
    gt_lon_first: bool = True,
    robust: bool = False,
    robust_gate_chi2: Optional[float] = None,
    robust_iterations: int = 2,
) -> ChunkedPipelineResult:
    """End-to-end OUT-OF-CORE fusion: trajectories larger than device memory.

    Same recipe as ``fuse_files`` but every stage streams host chunks
    (models.fusion_chunked) — alignment, Sim3 window/RANSAC, EKF+RTS, and
    (with ``evaluate``) the NN/ATE evaluation all keep device residency
    O(chunk_size). GNSS fixes (~10× sparser than poses) are projected and
    outlier-gated in core at load time; the pose-length arrays are the ones
    that stream. For anything that fits on device, ``fuse_files`` is one
    fused program and strictly faster.

    ``gt_path``: optional ground-truth GNSS track (loaded lon-first by
    default — SURVEY Q4), evaluated with the STREAMED GT evaluator
    (fusion_chunked.evaluate_vs_track_chunked) so the reference's
    unconditional GT comparison (EKFGPSSLAM.py:1044-1067) also exists at
    >HBM scale.

    ``robust=True``: χ²-NIS-gated filter at >HBM scale
    (models.robust.fuse_robust_chunked) — same semantics as
    ``fuse_files(robust=True)``'s parallel gate; the result's
    ``result.robust_accepted`` records surviving measurements."""
    from gps_optimize_slam_tpu.models import fusion_chunked

    step(1, 3, f"loading SLAM trajectory {slam_path}")
    slam = tum_io.read_tum(slam_path)
    step(2, 3, f"loading + projecting + gating GNSS {gps_path} ({frame})")
    gps = load_and_project_gps(
        gps_path, config.gps_filtering_ransac, frame=frame, seed=seed, dtype=dtype
    )
    gt = None
    if gt_path:
        gt = load_and_project_gps(
            gt_path,
            config.ground_truth_gps_filtering,
            lon_first=gt_lon_first,
            seed=seed,
            dtype=dtype,
            like=gps,
        )
    offset = estimate_offset(slam, gps, config)
    np_dtype = np.dtype("float64" if jax.config.jax_enable_x64 else "float32")
    step(3, 3, f"chunked fusion ({chunk_size}-pose chunks) + streamed evaluation")
    result = fusion_chunked.fuse_core_chunked(
        np.asarray(slam["timestamps"]),
        np.asarray(slam["positions"]),
        np.asarray(slam["quaternions"]),
        np.asarray(gps.timestamps),
        np.asarray(gps.positions),
        gps_valid=np.asarray(gps.valid),
        key=jax.random.PRNGKey(seed),
        config=config,
        time_offset=float(offset),
        chunk_size=chunk_size,
        halo=halo,
        dtype=np_dtype,
        robust=robust,
        robust_gate_chi2=robust_gate_chi2,
        robust_iterations=robust_iterations,
    )
    if not result.ok:
        raise RuntimeError(
            "Sim3 global alignment failed (not enough temporally aligned "
            "points or RANSAC consensus too small)"
        )
    ev = None
    if evaluate:
        ev = fusion_chunked.evaluate_chunked(
            np.asarray(slam["timestamps"]),
            np.asarray(slam["positions"]),
            np.asarray(slam["quaternions"]),
            result,
            chunk_size=chunk_size,
            dtype=np_dtype,
        )
    gt_ev = gt_al = None
    if gt is not None:
        if gt.frame != gps.frame:
            raise ValueError(
                f"ground-truth frame {gt.frame!r} != working frame {gps.frame!r}"
            )
        gt_ev, gt_al = fusion_chunked.evaluate_vs_track_chunked(
            np.asarray(slam["timestamps"]),
            np.asarray(slam["positions"]),
            np.asarray(slam["quaternions"]),
            result,
            np.asarray(gt.timestamps),
            np.asarray(gt.positions),
            track_valid=np.asarray(gt.valid),
            cfg=config,
            chunk_size=chunk_size,
            dtype=np_dtype,
        )
    return ChunkedPipelineResult(
        slam=slam,
        gps=gps,
        result=result,
        evaluation=ev,
        config=config,
        time_offset=float(offset),
        gt=gt,
        gt_evaluation=gt_ev,
        gt_aligned=gt_al,
    )


def refine_pose_graph(
    result: FusionResult,
    iterations: int = 10,
    cg_iters: int = 50,
    damping: float = 1e-6,
    propose_loops: bool = True,
    loop_radius: float = 5.0,
    loop_min_time_gap: float = 30.0,
    max_loops: int = 32,
    checkpoint_dir: Optional[str] = None,
    **weights,
):
    """Global pose-graph refinement of a fusion result (BASELINE config 5,
    now user-reachable — VERDICT r2 task 5).

    Factors: odometry from the Sim3-transformed SLAM stream (metric scale,
    locally drift-free), GPS unary priors from the aligned track, and —
    with ``propose_loops`` — proximity-proposed loop closures
    (models.pose_graph.propose_loop_closures) whose relative measurements
    are read from the Sim3 trajectory. The solve starts from the EKF/RTS
    output and runs matrix-free Gauss-Newton + CG.

    Returns ``(GNResult, loop_info)`` where loop_info is a dict with the
    proposed pairs/validity for reporting."""
    from gps_optimize_slam_tpu.models import pose_graph

    o = result.outputs
    times = jnp.asarray(result.slam["timestamps"], o.corrected_pos.dtype)
    loop_kwargs = {}
    n_loops = 0
    if propose_loops:
        loop_ij, loop_dp, loop_dq, loop_valid = pose_graph.propose_loop_closures(
            o.corrected_pos,
            times,
            o.sim3_quat,
            radius=loop_radius,
            min_time_gap=loop_min_time_gap,
            max_loops=max_loops,
        )
        # Measurements from the Sim3 trajectory (metric SLAM geometry).
        i_sel, j_sel = loop_ij[:, 0], loop_ij[:, 1]
        from gps_optimize_slam_tpu.ops import quaternion as quat_ops

        q_i_inv = quat_ops.conj(quat_ops.normalize(o.sim3_quat[i_sel]))
        loop_dp = quat_ops.rotate(q_i_inv, o.sim3_pos[j_sel] - o.sim3_pos[i_sel])
        loop_dq = quat_ops.mul(q_i_inv, quat_ops.normalize(o.sim3_quat[j_sel]))
        loop_kwargs = dict(
            loop_ij=loop_ij, loop_dp=loop_dp, loop_dq=loop_dq, loop_valid=loop_valid
        )
        n_loops = int(np.asarray(loop_valid).sum())

    data = pose_graph.build_data_from_fusion(
        o.sim3_pos,
        o.sim3_quat,
        o.aligned_gps,
        o.gps_valid,
        **loop_kwargs,
        **weights,
    )
    init = pose_graph.PoseGraphState(
        positions=o.corrected_pos, quaternions=o.corrected_quat
    )
    gn = pose_graph.solve_pose_graph_checkpointed(
        init,
        data,
        iterations=iterations,
        cg_iters=cg_iters,
        damping=damping,
        checkpoint_dir=checkpoint_dir,
    )
    loop_info = {
        "n_loops": n_loops,
        "loop_ij": np.asarray(loop_kwargs["loop_ij"])[
            np.asarray(loop_kwargs["loop_valid"])
        ].tolist()
        if loop_kwargs
        else [],
    }
    return gn, loop_info


def export_result(
    result: FusionResult,
    utm_path: str,
    wgs84_path: Optional[str] = None,
) -> None:
    """Write the corrected trajectory in the working frame (TUM format) and
    optionally WGS84 (reference exporter: EKFGPSSLAM.py:1086-1105)."""
    ts = result.slam["timestamps"]
    tum_io.write_tum(
        utm_path,
        ts,
        result.corrected_pos,
        result.corrected_quat,
        header="timestamp x y z qx qy qz qw (UTM)",
    )
    if wgs84_path:
        if result.gps.frame != "utm":
            raise ValueError("WGS84 export requires the UTM working frame")
        pos = result.corrected_pos
        lon, lat = geodesy.utm_inverse(
            jnp.asarray(pos[:, 0]),
            jnp.asarray(pos[:, 1]),
            result.gps.utm_zone,
            result.gps.utm_south,
        )
        lonlatalt = np.column_stack([np.asarray(lon), np.asarray(lat), pos[:, 2]])
        tum_io.write_wgs84(wgs84_path, ts, lonlatalt, result.corrected_quat)
