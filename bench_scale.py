#!/usr/bin/env python
"""North-star scale benchmark: ~23k poses (all-KITTI-odometry scale) fused
in one batched device call (BASELINE.json: target <50 ms on one v5e chip).

KITTI 00-10 isn't shipped (only the seq-04 slice), so eleven sequences with
KITTI-like statistics (10 Hz, ~2 m/frame, gentle+sharp turns, 0.9 Hz GPS
with outages) are synthesised at the real sequence lengths. Prints one JSON
line (bench.py remains the driver-recorded headline benchmark).

Timing methodology (VERDICT r1 #3): inputs are staged onto the device ONCE;
the headline `value` is the sustained per-batch device time from K fusions
chained in a single dispatch (PRNG keys folded per iteration so XLA cannot
CSE the body) — on the tunneled bench TPU a single dispatch carries ~35 ms
of network RTT that production pipelining amortises away. The JSON also
reports the un-amortised single-dispatch wall, the host→device transfer
time, and the derived dispatch overhead, so the split is explicit.
"""

import json
import time

import numpy as np

# KITTI odometry sequence lengths (00-10).
KITTI_LENGTHS = [4541, 1101, 4661, 801, 271, 2761, 1101, 1101, 4071, 1591, 1201]


def synth_sequence(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) * 0.104
    yaw_rate = rng.normal(0.0, 3.0, n)
    yaw_rate[n // 3 : n // 3 + 40] += 60.0  # a sharp turn
    yaw = np.cumsum(np.deg2rad(yaw_rate) * 0.104)
    heading = np.stack([np.cos(yaw), np.sin(yaw), np.zeros(n)], -1)
    pos = np.cumsum(1.9 * 0.104 * heading, axis=0)
    pos[:, 2] = np.cumsum(rng.normal(0, 0.01, n))
    quat = np.stack([np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1)
    slam = {"timestamps": t, "positions": pos * 0.99, "quaternions": quat}

    m = int(n * 1.03)
    gt = np.linspace(t[0], t[-1], m)
    gp = np.stack([np.interp(gt, t, pos[:, k]) for k in range(3)], -1)
    gp += rng.normal(size=(m, 3)) * 0.15
    valid = np.ones(m, bool)
    o = rng.integers(m // 4, m // 2)
    valid[o : o + 60] = False  # GNSS outage
    return slam, gt, gp, valid


def main():
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache

    _enable_compile_cache()

    from gps_optimize_slam_tpu.parallel import batch as pbatch
    from gps_optimize_slam_tpu.parallel import mesh as pmesh
    from gps_optimize_slam_tpu.config import FusionConfig
    from gps_optimize_slam_tpu.models import fusion

    platform = jax.devices()[0].platform
    dtype = jnp.float32 if platform != "cpu" else jnp.float64
    slams, gts, gps_list, valids = [], [], [], []
    for i, n in enumerate(KITTI_LENGTHS):
        s, gt, gp, v = synth_sequence(n, i)
        slams.append(s)
        gts.append(gt)
        gps_list.append(gp)
        valids.append(v)
    total_poses = sum(KITTI_LENGTHS)

    b = pbatch.pad_batch(slams, gts, gps_list, valids, pad_multiple=128)
    keys_host = np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(len(slams))])
    cfg = FusionConfig()

    host_args = (
        np.asarray(b.slam_times, dtype),
        np.asarray(b.slam_pos, dtype),
        np.asarray(b.slam_quat, dtype),
        np.asarray(b.gps_times, dtype),
        np.asarray(b.gps_pos, dtype),
        np.asarray(b.gps_valid),
        keys_host,
        np.asarray(b.slam_mask),
        np.zeros(len(slams), dtype),
    )

    # Host→device transfer time for the full staged batch.
    def put():
        out = tuple(jax.device_put(a) for a in host_args)
        jax.block_until_ready(out)
        return out

    args = put()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        put()
        ts.append((time.perf_counter() - t0) * 1e3)
    transfer_ms = float(np.median(ts))
    bytes_in = sum(a.nbytes for a in host_args)

    def one(st, sp, sq, gt_, gp_, gv, k, sm, toff):
        return fusion.fuse_core(
            st, sp, sq, gt_, gp_, gv, k, config=cfg, slam_mask=sm, time_offset=toff
        )

    fused = jax.jit(jax.vmap(one))

    def run():
        out = fused(*args)
        jax.block_until_ready(out.corrected_pos)
        return out

    t0 = time.perf_counter()
    out = run()
    compile_s = time.perf_counter() - t0
    assert bool(jnp.all(out.ok)), "batched fusion did not converge"

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        run()
        times.append((time.perf_counter() - t0) * 1e3)
    single_dispatch_ms = float(np.median(times))

    # Sustained device time: K chained fusions in one dispatch, keys folded
    # per iteration (the honest program-time number, RTT amortised).
    K = 10

    @jax.jit
    def chained(keys):
        def body(i, acc):
            ki = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            o = jax.vmap(one)(*args[:6], ki, *args[7:])
            return acc + jnp.sum(o.corrected_pos) + jnp.sum(o.sim3.scale)

        return jax.lax.fori_loop(0, K, body, jnp.zeros((), dtype))

    kdev = args[6]
    r = chained(kdev)
    np.asarray(r)  # force completion
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(chained(kdev))
        ts.append((time.perf_counter() - t0) * 1e3)
    device_ms = float(np.median(ts)) / K

    # Extra: adaptive early-stopping RANSAC (opt-in config; the reference
    # always runs max_trials, so the HEADLINE stays the faithful config).
    from gps_optimize_slam_tpu.config import Sim3RansacConfig

    cfg_ad = cfg.replace(sim3_ransac=Sim3RansacConfig(stop_probability=0.9999))

    def one_ad(st, sp, sq, gt_, gp_, gv, k, sm, toff):
        return fusion.fuse_core(
            st, sp, sq, gt_, gp_, gv, k, config=cfg_ad, slam_mask=sm, time_offset=toff
        )

    @jax.jit
    def chained_ad(keys):
        def body(i, acc):
            ki = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            o = jax.vmap(one_ad)(*args[:6], ki, *args[7:])
            return acc + jnp.sum(o.corrected_pos) + jnp.sum(o.sim3.scale)

        return jax.lax.fori_loop(0, K, body, jnp.zeros((), dtype))

    np.asarray(chained_ad(kdev))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(chained_ad(kdev))
        ts.append((time.perf_counter() - t0) * 1e3)
    adaptive_device_ms = float(np.median(ts)) / K

    # Extra: length-bucketed fusion (parallel.batch.bucket_by_length) — one
    # global pad length forces 23.2k real poses to 52k padded; two buckets
    # cut the padded work ~1.7×. Both bucket programs chained in ONE
    # dispatch per iteration.
    buckets = pbatch.bucket_by_length(
        slams, gts, gps_list, valids, max_waste=2.0, pad_multiple=128
    )
    bucket_args = []
    for idxs, bb in buckets:
        ha = (
            np.asarray(bb.slam_times, dtype),
            np.asarray(bb.slam_pos, dtype),
            np.asarray(bb.slam_quat, dtype),
            np.asarray(bb.gps_times, dtype),
            np.asarray(bb.gps_pos, dtype),
            np.asarray(bb.gps_valid),
            keys_host[idxs],
            np.asarray(bb.slam_mask),
            np.zeros(len(idxs), dtype),
        )
        bucket_args.append(tuple(jax.device_put(a) for a in ha))

    @jax.jit
    def chained_buckets(all_keys):
        def body(i, acc):
            tot = acc
            for ba, bk in zip(bucket_args, all_keys):
                ki = jax.vmap(lambda k: jax.random.fold_in(k, i))(bk)
                o = jax.vmap(one)(*ba[:6], ki, *ba[7:])
                tot = tot + jnp.sum(o.corrected_pos) + jnp.sum(o.sim3.scale)
            return tot

        return jax.lax.fori_loop(0, K, body, jnp.zeros((), dtype))

    bkeys = tuple(ba[6] for ba in bucket_args)
    np.asarray(chained_buckets(bkeys))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(chained_buckets(bkeys))
        ts.append((time.perf_counter() - t0) * 1e3)
    bucketed_device_ms = float(np.median(ts)) / K

    # Product-API wall (fuse_batch: re-stages host arrays every call).
    def api_run():
        o = pmesh.fuse_batch(b, keys_host, config=cfg, dtype=dtype)
        jax.block_until_ready(o.corrected_pos)

    api_run()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        api_run()
        ts.append((time.perf_counter() - t0) * 1e3)
    api_ms = float(np.median(ts))

    print(
        json.dumps(
            {
                "metric": "kitti_all_sequences_scale_fusion",
                "value": round(device_ms, 2),
                "unit": "ms",
                "vs_baseline": round((total_poses / 3000.0 * 1000.0) / device_ms, 1),
                "platform": platform,
                "total_poses": total_poses,
                "sequences": len(KITTI_LENGTHS),
                "poses_per_sec": round(total_poses / (device_ms / 1e3), 0),
                "north_star_ms": 50.0,
                "device_ms": round(device_ms, 2),
                "adaptive_ransac_device_ms": round(adaptive_device_ms, 2),
                "bucketed_device_ms": round(bucketed_device_ms, 2),
                "padded_poses": int(b.slam_times.shape[0] * b.slam_times.shape[1]),
                "bucketed_padded_poses": int(
                    sum(bb.slam_times.size for _, bb in buckets)
                ),
                "single_dispatch_ms": round(single_dispatch_ms, 2),
                "dispatch_overhead_ms": round(single_dispatch_ms - device_ms, 2),
                "transfer_ms": round(transfer_ms, 2),
                "transfer_mb": round(bytes_in / 1e6, 1),
                "api_e2e_ms": round(api_ms, 2),
                "compile_s": round(compile_s, 1),
                "baseline_note": "vs_baseline = speedup over the reference's ~3k poses/s",
            }
        )
    )


if __name__ == "__main__":
    main()
