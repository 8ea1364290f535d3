"""Geodetic transforms in pure jax.numpy — no PROJ/C dependency.

Replaces the reference's pyproj usage (UTM projector construction and
forward/inverse projection, EKFGPSSLAM.py:266-270, 291-296) with:

* ``utm_forward`` / ``utm_inverse`` — transverse Mercator via the 6th-order
  Krüger series (Karney 2011 "Transverse Mercator with an accuracy of a few
  nanometers"), vectorised and differentiable. Agreement with PROJ is at the
  nanometre level within a UTM zone, far below the reference's sub-mm bar.
* ``wgs84_to_ecef`` / ``ecef_to_enu`` / ``wgs84_to_enu`` — the closed-form
  local-tangent-plane pipeline, the preferred TPU-native frame (small local
  coordinates keep float32 viable on-chip; UTM is provided for byte-level
  compatibility with reference outputs).
* ``utm_zone_from_lonlat`` — zone/hemisphere pick matching
  auto_utm_projection (EKFGPSSLAM.py:127-134).

All angles in degrees at the API boundary (like pyproj), radians internally.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# WGS84 ellipsoid.
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
WGS84_E = WGS84_E2**0.5
WGS84_B = WGS84_A * (1.0 - WGS84_F)

UTM_K0 = 0.9996
UTM_FALSE_EASTING = 500000.0
UTM_FALSE_NORTHING_SOUTH = 10000000.0

# Third flattening n = f / (2 - f) and the rectifying radius
# A = a/(1+n) (1 + n²/4 + n⁴/64 + n⁶/256).
_N = WGS84_F / (2.0 - WGS84_F)
_A_RECT = (
    WGS84_A
    / (1.0 + _N)
    * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)
)

# Krüger series coefficients (Karney 2011, eqs. 35/36), 6th order in n.
_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0 + 41.0 * _N**4 / 180.0
    - 127.0 * _N**5 / 288.0 + 7891.0 * _N**6 / 37800.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0 + 557.0 * _N**4 / 1440.0
    + 281.0 * _N**5 / 630.0 - 1983433.0 * _N**6 / 1935360.0,
    61.0 * _N**3 / 240.0 - 103.0 * _N**4 / 140.0 + 15061.0 * _N**5 / 26880.0
    + 167603.0 * _N**6 / 181440.0,
    49561.0 * _N**4 / 161280.0 - 179.0 * _N**5 / 168.0
    + 6601661.0 * _N**6 / 7257600.0,
    34729.0 * _N**5 / 80640.0 - 3418889.0 * _N**6 / 1995840.0,
    212378941.0 * _N**6 / 319334400.0,
)
_BETA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0 - _N**4 / 360.0
    - 81.0 * _N**5 / 512.0 + 96199.0 * _N**6 / 604800.0,
    _N**2 / 48.0 + _N**3 / 15.0 - 437.0 * _N**4 / 1440.0 + 46.0 * _N**5 / 105.0
    - 1118711.0 * _N**6 / 3870720.0,
    17.0 * _N**3 / 480.0 - 37.0 * _N**4 / 840.0 - 209.0 * _N**5 / 4480.0
    + 5569.0 * _N**6 / 90720.0,
    4397.0 * _N**4 / 161280.0 - 11.0 * _N**5 / 504.0
    - 830251.0 * _N**6 / 7257600.0,
    4583.0 * _N**5 / 161280.0 - 108847.0 * _N**6 / 3991680.0,
    20648693.0 * _N**6 / 638668800.0,
)


def utm_zone_from_lonlat(lons, lats) -> Tuple[int, bool]:
    """UTM zone number + southern-hemisphere flag from mean lon/lat.

    Matches auto_utm_projection (reference: EKFGPSSLAM.py:127-134):
    zone = (mean_lon + 180) // 6 + 1, south iff mean lat < 0.
    Host-side helper (returns Python scalars).
    """
    import numpy as np

    lons = np.asarray(lons)
    lats = np.asarray(lats)
    if lons.size == 0 or lats.size == 0:
        raise ValueError("empty lon/lat arrays — cannot determine UTM zone")
    zone = int((float(np.mean(lons)) + 180.0) // 6.0 + 1.0)
    south = bool(np.mean(lats) < 0.0)
    return zone, south


def utm_central_meridian_deg(zone: int) -> float:
    return float(zone) * 6.0 - 183.0


def utm_forward(
    lon_deg: jnp.ndarray,
    lat_deg: jnp.ndarray,
    zone: int,
    south: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """WGS84 geodetic → UTM easting/northing (metres), Krüger series.

    Vectorised equivalent of ``pyproj.Proj("+proj=utm +zone=.. ")(lon, lat)``
    (reference call site EKFGPSSLAM.py:270).
    """
    lat = jnp.deg2rad(lat_deg)
    lon0 = jnp.deg2rad(jnp.asarray(utm_central_meridian_deg(zone), dtype=jnp.result_type(lon_deg, 1.0)))
    lam = jnp.deg2rad(lon_deg) - lon0
    # Wrap Δlon to (-pi, pi].
    lam = jnp.arctan2(jnp.sin(lam), jnp.cos(lam))

    s_lat = jnp.sin(lat)
    # Conformal latitude via tau-form: tau' = sinh(asinh(tan φ) - e atanh(e sin φ))
    tau = jnp.tan(lat)
    sigma = jnp.sinh(WGS84_E * jnp.arctanh(WGS84_E * s_lat))
    taup = tau * jnp.sqrt(1.0 + sigma**2) - sigma * jnp.sqrt(1.0 + tau**2)

    xi_p = jnp.arctan2(taup, jnp.cos(lam))
    eta_p = jnp.arcsinh(jnp.sin(lam) / jnp.sqrt(taup**2 + jnp.cos(lam) ** 2))

    xi = xi_p
    eta = eta_p
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + a * jnp.sin(2.0 * j * xi_p) * jnp.cosh(2.0 * j * eta_p)
        eta = eta + a * jnp.cos(2.0 * j * xi_p) * jnp.sinh(2.0 * j * eta_p)

    x = UTM_K0 * _A_RECT * eta + UTM_FALSE_EASTING
    y = UTM_K0 * _A_RECT * xi
    if south:
        y = y + UTM_FALSE_NORTHING_SOUTH
    return x, y


def utm_inverse(
    x: jnp.ndarray,
    y: jnp.ndarray,
    zone: int,
    south: bool = False,
    newton_iters: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """UTM easting/northing → WGS84 lon/lat (degrees), Krüger inverse series.

    Vectorised equivalent of ``projector(x, y, inverse=True)``
    (reference call site EKFGPSSLAM.py:295). The conformal→geodetic latitude
    step uses a fixed-count Newton iteration (3 iterations reach float64
    machine precision) so the whole transform stays jit-compatible.
    """
    y_adj = y - (UTM_FALSE_NORTHING_SOUTH if south else 0.0)
    xi = y_adj / (UTM_K0 * _A_RECT)
    eta = (x - UTM_FALSE_EASTING) / (UTM_K0 * _A_RECT)

    xi_p = xi
    eta_p = eta
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - b * jnp.sin(2.0 * j * xi) * jnp.cosh(2.0 * j * eta)
        eta_p = eta_p - b * jnp.cos(2.0 * j * xi) * jnp.sinh(2.0 * j * eta)

    taup = jnp.sin(xi_p) / jnp.sqrt(jnp.sinh(eta_p) ** 2 + jnp.cos(xi_p) ** 2)
    lam = jnp.arctan2(jnp.sinh(eta_p), jnp.cos(xi_p))

    # Invert tau'(tau) by Newton: tau' = tau √(1+σ²) − σ √(1+τ²).
    tau = taup / (1.0 - WGS84_E2)  # good starting guess

    def newton_step(tau, _):
        sigma = jnp.sinh(
            WGS84_E * jnp.arctanh(WGS84_E * tau / jnp.sqrt(1.0 + tau**2))
        )
        f = tau * jnp.sqrt(1.0 + sigma**2) - sigma * jnp.sqrt(1.0 + tau**2) - taup
        dtau = (
            (jnp.sqrt((1.0 + sigma**2) * (1.0 + tau**2)) - sigma * tau)
            * (1.0 - WGS84_E2)
            * jnp.sqrt(1.0 + tau**2)
            / (1.0 + (1.0 - WGS84_E2) * tau**2)
        )
        return tau - f / dtau, None

    tau, _ = jax.lax.scan(newton_step, tau, None, length=newton_iters)

    lat = jnp.arctan(tau)
    lon0 = utm_central_meridian_deg(zone)
    lon = jnp.rad2deg(lam) + lon0
    return lon, jnp.rad2deg(lat)


def wgs84_to_ecef(
    lon_deg: jnp.ndarray, lat_deg: jnp.ndarray, alt: jnp.ndarray
) -> jnp.ndarray:
    """Geodetic lon/lat/alt → ECEF xyz (metres), stacked on the last axis."""
    lon = jnp.deg2rad(lon_deg)
    lat = jnp.deg2rad(lat_deg)
    s, c = jnp.sin(lat), jnp.cos(lat)
    n_rad = WGS84_A / jnp.sqrt(1.0 - WGS84_E2 * s * s)
    x = (n_rad + alt) * c * jnp.cos(lon)
    y = (n_rad + alt) * c * jnp.sin(lon)
    z = (n_rad * (1.0 - WGS84_E2) + alt) * s
    return jnp.stack([x, y, z], axis=-1)


def ecef_to_enu(
    ecef: jnp.ndarray, ref_lon_deg, ref_lat_deg, ref_ecef: jnp.ndarray
) -> jnp.ndarray:
    """ECEF xyz → local East/North/Up about a reference point."""
    lon = jnp.deg2rad(ref_lon_deg)
    lat = jnp.deg2rad(ref_lat_deg)
    sl, cl = jnp.sin(lon), jnp.cos(lon)
    sp, cp = jnp.sin(lat), jnp.cos(lat)
    rot = jnp.asarray(
        [
            [-sl, cl, 0.0],
            [-sp * cl, -sp * sl, cp],
            [cp * cl, cp * sl, sp],
        ],
        dtype=ecef.dtype,
    )
    return (ecef - ref_ecef) @ rot.T


def wgs84_to_enu(
    lon_deg: jnp.ndarray,
    lat_deg: jnp.ndarray,
    alt: jnp.ndarray,
    ref_lon_deg,
    ref_lat_deg,
    ref_alt,
) -> jnp.ndarray:
    """Geodetic → local ENU about (ref_lon, ref_lat, ref_alt) in one call —
    the TPU-native local frame (small coordinates, float32-safe)."""
    ecef = wgs84_to_ecef(lon_deg, lat_deg, alt)
    ref_ecef = wgs84_to_ecef(
        jnp.asarray(ref_lon_deg), jnp.asarray(ref_lat_deg), jnp.asarray(ref_alt)
    )
    return ecef_to_enu(ecef, ref_lon_deg, ref_lat_deg, ref_ecef)
