"""Independent NumPy reference implementations used only for cross-checking.

The UTM implementation here deliberately uses the classic Redfearn/Snyder
truncated series (Snyder 1987, "Map Projections — A Working Manual", eqs.
8-9..8-13) — a DIFFERENT formulation from the framework's Krüger series — so
that agreement between the two (sub-mm within a zone) is a genuine
cross-validation, not a shared-coefficient tautology.
"""

import numpy as np

A = 6378137.0
F = 1 / 298.257223563
E2 = F * (2 - F)
EP2 = E2 / (1 - E2)
K0 = 0.9996


def snyder_utm_forward(lon_deg, lat_deg, zone, south=False):
    lon = np.deg2rad(np.asarray(lon_deg, dtype=float))
    lat = np.deg2rad(np.asarray(lat_deg, dtype=float))
    lon0 = np.deg2rad(zone * 6.0 - 183.0)

    N = A / np.sqrt(1 - E2 * np.sin(lat) ** 2)
    T = np.tan(lat) ** 2
    C = EP2 * np.cos(lat) ** 2
    Aa = (lon - lon0) * np.cos(lat)

    # Meridian arc (Snyder eq. 3-21).
    M = A * (
        (1 - E2 / 4 - 3 * E2**2 / 64 - 5 * E2**3 / 256) * lat
        - (3 * E2 / 8 + 3 * E2**2 / 32 + 45 * E2**3 / 1024) * np.sin(2 * lat)
        + (15 * E2**2 / 256 + 45 * E2**3 / 1024) * np.sin(4 * lat)
        - (35 * E2**3 / 3072) * np.sin(6 * lat)
    )

    x = (
        K0
        * N
        * (
            Aa
            + (1 - T + C) * Aa**3 / 6
            + (5 - 18 * T + T**2 + 72 * C - 58 * EP2) * Aa**5 / 120
        )
        + 500000.0
    )
    y = K0 * (
        M
        + N
        * np.tan(lat)
        * (
            Aa**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * Aa**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * EP2) * Aa**6 / 720
        )
    )
    if south:
        y = y + 10000000.0
    return x, y


def ecef_reference(lon_deg, lat_deg, alt):
    lon = np.deg2rad(np.asarray(lon_deg, dtype=float))
    lat = np.deg2rad(np.asarray(lat_deg, dtype=float))
    n = A / np.sqrt(1 - E2 * np.sin(lat) ** 2)
    x = (n + alt) * np.cos(lat) * np.cos(lon)
    y = (n + alt) * np.cos(lat) * np.sin(lon)
    z = (n * (1 - E2) + alt) * np.sin(lat)
    return np.stack([x, y, z], axis=-1)


# ---------------------------------------------------------------------------
# EKF + RTS oracle (NumPy, written from the reference's documented semantics:
# SURVEY.md §2.1 EKF/RTS rows, §3.2 call stack). Used to unit-test the
# scan-based implementation; end-to-end goldens come from running the actual
# reference (tests/golden/).
# ---------------------------------------------------------------------------

from scipy.spatial.transform import Rotation as _Rot


def _normalize_q(q):
    n = np.linalg.norm(q)
    return q / n if n > 1e-9 else np.array([0.0, 0.0, 0.0, 1.0])


def _nlerp(q1, q2, w):
    if np.dot(q1, q2) < 0.0:
        q2 = -q2
    w = np.clip(w, 0.0, 1.0)
    qi = (1.0 - w) * q1 + w * q2
    n = np.linalg.norm(qi)
    if n < 1e-9:
        return q1 if w < 0.5 else q2
    return qi / n


def oracle_ekf_rts(
    slam_times,
    slam_pos,
    slam_quat,
    sim3_pos,
    sim3_quat,
    aligned_gps,
    valid_mask,
    ekf_cfg,
    rts_cfg,
):
    """Sequential-loop oracle for apply_ekf_correction semantics."""
    n = len(slam_times)
    P0 = np.diag(ekf_cfg.initial_cov_diag).astype(float)
    Q = np.diag(ekf_cfg.process_noise_diag).astype(float)
    R = np.diag(ekf_cfg.meas_noise_diag).astype(float)
    H = np.zeros((3, 7))
    H[0, 0] = H[1, 1] = H[2, 2] = 1.0

    state = np.concatenate([sim3_pos[0], _normalize_q(sim3_quat[0])])
    cov = P0.copy()
    weight = 0.0
    avail_arr = valid_mask & ~np.isnan(aligned_gps).any(axis=1)
    avail_prev = bool(valid_mask[0])

    filt_s = [state.copy()]
    filt_c = [cov.copy()]
    pred_s = [state.copy()]
    pred_c = [cov.copy()]
    out_pos = np.zeros_like(sim3_pos)
    out_quat = np.zeros_like(sim3_quat)
    out_pos[0], out_quat[0] = state[:3], state[3:]

    in_outage = not avail_prev
    outage_start = 0 if in_outage else -1
    last_t = slam_times[0]

    def sharp_turn(qs, ts, thresh_rad):
        if len(qs) < 2:
            return False
        mx = 0.0
        for i in range(1, len(qs)):
            if ts[i] <= ts[i - 1]:
                continue
            if np.linalg.norm(qs[i - 1]) == 0 or np.linalg.norm(qs[i]) == 0:
                return True
            y1 = _Rot.from_quat(qs[i - 1]).as_euler("zyx")[0]
            y2 = _Rot.from_quat(qs[i]).as_euler("zyx")[0]
            dy = np.arctan2(np.sin(y2 - y1), np.cos(y2 - y1))
            mx = max(mx, abs(dy / (ts[i] - ts[i - 1])))
        return mx > thresh_rad

    for i in range(1, n):
        t = slam_times[i]
        dt = max(1e-6, t - last_t)
        # relative pose from original SLAM
        r1 = _Rot.from_quat(slam_quat[i - 1])
        dp = r1.inv().apply(slam_pos[i] - slam_pos[i - 1])
        dq = (r1.inv() * _Rot.from_quat(slam_quat[i])).as_quat()

        avail = bool(avail_arr[i])
        perform_rts = True
        ets = 0
        if not avail and not in_outage:
            in_outage = True
            outage_start = i
        elif avail and in_outage:
            seg = list(range(outage_start, i))
            if len(seg) >= 2:
                thresh = np.deg2rad(
                    rts_cfg.sharp_turn_yaw_rate_threshold_deg_per_sec
                )
                if sharp_turn(
                    [slam_quat[k] for k in seg], [slam_times[k] for k in seg], thresh
                ):
                    perform_rts = False
                    ets = rts_cfg.default_ekf_transition_steps_on_sharp_turn

        ets_eff = ets if (avail and in_outage) else 0
        weight_delta = 1.0 / ets_eff if ets_eff > 0 else 1.0

        # predict
        prev_rot = _Rot.from_quat(state[3:])
        ppos = state[:3] + prev_rot.apply(dp)
        pquat = _normalize_q((prev_rot * _Rot.from_quat(dq)).as_quat())
        pstate = np.concatenate([ppos, pquat])
        pcov = cov + Q * max(abs(dt), 1e-6)
        pcov = (pcov + pcov.T) / 2.0

        ustate, ucov, uok = None, None, False
        if avail:
            z = aligned_gps[i]
            S = H @ pcov @ H.T + R
            S = (S + S.T) / 2.0
            K = pcov @ H.T @ np.linalg.inv(S)
            ustate = pstate + K @ (z - pstate[:3])
            ustate[3:] = _normalize_q(ustate[3:])
            IKH = np.eye(7) - K @ H
            ucov = IKH @ pcov @ IKH.T + K @ R @ K.T
            ucov = (ucov + ucov.T) / 2.0
            uok = True

        just_rec = avail and (avail_prev == False)
        if avail:
            if just_rec or ets_eff == 0:
                weight = 1.0 if ets_eff == 0 else weight_delta
            elif weight < 1.0:
                weight = min(1.0, weight + weight_delta)
        else:
            weight = 0.0

        fstate, fcov = pstate, pcov
        if avail and uok:
            if weight < 1.0 and ets_eff > 0:
                sp = (1.0 - weight) * pstate[:3] + weight * ustate[:3]
                sq = _nlerp(pstate[3:], ustate[3:], weight)
                fstate = np.concatenate([sp, sq])
                fcov = ucov
            else:
                fstate, fcov = ustate, ucov

        state, cov = fstate.copy(), fcov.copy()
        avail_prev = avail
        filt_s.append(fstate.copy())
        filt_c.append(fcov.copy())
        pred_s.append(pstate.copy())
        pred_c.append(pcov.copy())
        out_pos[i], out_quat[i] = fstate[:3], fstate[3:]

        if avail and in_outage:
            if perform_rts and (i - outage_start + 1) > 1:
                s0 = outage_start
                seg_fs = filt_s[s0 : i + 1]
                seg_fc = filt_c[s0 : i + 1]
                seg_ps = pred_s[s0 : i + 1]
                seg_pc = pred_c[s0 : i + 1]
                m = len(seg_fs)
                sm_s = [None] * m
                sm_c = [None] * m
                sm_s[-1], sm_c[-1] = seg_fs[-1].copy(), seg_fc[-1].copy()
                for k in range(m - 2, -1, -1):
                    A = seg_fc[k] @ np.linalg.inv(seg_pc[k + 1])
                    sm_s[k] = seg_fs[k] + A @ (sm_s[k + 1] - seg_ps[k + 1])
                    sm_s[k][3:] = _normalize_q(sm_s[k][3:])
                    sm_c[k] = seg_fc[k] + A @ (sm_c[k + 1] - seg_pc[k + 1]) @ A.T
                    sm_c[k] = (sm_c[k] + sm_c[k].T) / 2.0
                for k in range(m):
                    oi = s0 + k
                    out_pos[oi] = sm_s[k][:3]
                    out_quat[oi] = sm_s[k][3:]
                    filt_s[oi] = sm_s[k].copy()
            in_outage = False
            outage_start = -1

        last_t = t
    return out_pos, out_quat
