"""Geodesy tests: Krüger UTM vs the independent Snyder series, round-trips,
ENU properties, and behaviour on the shipped KITTI seq-04 GNSS fixture."""

import numpy as np
import jax.numpy as jnp

from gps_optimize_slam_tpu.ops import geodesy
from tests.conftest import reference_fixture
from tests.reference_impls import snyder_utm_forward, ecef_reference


def kitti04_lonlat():
    data = np.loadtxt(reference_fixture("combined_output.txt"))
    # combined_output.txt columns: ts lat lon alt navstat posmode (SURVEY §2.3)
    return data[:, 2], data[:, 1], data[:, 3]


def test_zone_pick_matches_reference_formula():
    lons, lats, _ = kitti04_lonlat()
    zone, south = geodesy.utm_zone_from_lonlat(lons, lats)
    assert zone == 32 and south is False
    assert geodesy.utm_zone_from_lonlat([-122.4], [37.8]) == (10, False)
    assert geodesy.utm_zone_from_lonlat([151.2], [-33.9]) == (56, True)


def test_utm_forward_cross_check_snyder():
    # Two independent series formulations must agree. The Snyder/Redfearn
    # series is itself only mm-accurate near the central meridian (its error
    # grows as Δlon⁷ toward the zone edge), so the tolerance is Δlon-scaled:
    # sub-mm within ±1.5°, ~1 cm at the ±3° zone edge.
    rng = np.random.default_rng(0)
    lats = rng.uniform(-80, 80, size=200)
    zones = rng.integers(1, 61, size=200)
    lon0 = zones * 6.0 - 183.0
    dlons = rng.uniform(-2.8, 2.8, size=200)
    lons = lon0 + dlons
    for lon, dlon, lat, zone in zip(lons, dlons, lats, zones):
        south = lat < 0
        x1, y1 = geodesy.utm_forward(jnp.asarray(lon), jnp.asarray(lat), int(zone), south)
        x2, y2 = snyder_utm_forward(lon, lat, int(zone), south)
        tol = 1e-3 if abs(dlon) <= 1.5 else 2e-2
        assert abs(float(x1) - x2) < tol, (lon, lat, zone)
        assert abs(float(y1) - y2) < tol, (lon, lat, zone)


def test_utm_forward_cross_check_snyder_on_fixture():
    # At the KITTI seq-04 location (Δlon ≈ −0.6°) both series are deep in
    # their convergence region. Sub-mm agreement required; the residual
    # ~0.4 mm is the Snyder meridian-arc truncation (the Krüger result was
    # verified to 8e-8 m against a numerically integrated meridian arc).
    lons, lats, _ = kitti04_lonlat()
    x1, y1 = geodesy.utm_forward(jnp.asarray(lons), jnp.asarray(lats), 32)
    x2, y2 = snyder_utm_forward(lons, lats, 32)
    assert float(jnp.max(jnp.abs(x1 - x2))) < 1e-3
    assert float(jnp.max(jnp.abs(y1 - y2))) < 1e-3


def test_utm_roundtrip_machine_precision():
    lons, lats, _ = kitti04_lonlat()
    x, y = geodesy.utm_forward(jnp.asarray(lons), jnp.asarray(lats), 32)
    lon2, lat2 = geodesy.utm_inverse(x, y, 32)
    np.testing.assert_allclose(np.asarray(lon2), lons, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lat2), lats, atol=1e-12)
    # Metric round-trip error: reproject and compare in metres.
    x2, y2 = geodesy.utm_forward(lon2, lat2, 32)
    assert float(jnp.max(jnp.abs(x2 - x))) < 1e-8
    assert float(jnp.max(jnp.abs(y2 - y))) < 1e-8


def test_utm_roundtrip_wide_range():
    rng = np.random.default_rng(1)
    lats = rng.uniform(-84, 84, size=500)
    lons_off = rng.uniform(-3.0, 3.0, size=500)
    zone = 31
    lons = (zone * 6.0 - 183.0) + lons_off
    x, y = geodesy.utm_forward(jnp.asarray(lons), jnp.asarray(lats), zone)
    lon2, lat2 = geodesy.utm_inverse(x, y, zone)
    np.testing.assert_allclose(np.asarray(lon2), lons, atol=1e-11)
    np.testing.assert_allclose(np.asarray(lat2), lats, atol=1e-11)


def test_utm_known_anchors():
    # Central meridian at the equator maps to the false easting exactly.
    x, y = geodesy.utm_forward(jnp.asarray(9.0), jnp.asarray(0.0), 32)
    assert abs(float(x) - 500000.0) < 1e-9
    assert abs(float(y)) < 1e-9
    # Southern hemisphere false northing.
    x, y = geodesy.utm_forward(jnp.asarray(9.0), jnp.asarray(-0.001), 32, south=True)
    assert float(y) < 10000000.0 and float(y) > 9999000.0


def test_ecef_matches_reference():
    lons, lats, alts = kitti04_lonlat()
    ours = np.asarray(geodesy.wgs84_to_ecef(jnp.asarray(lons), jnp.asarray(lats), jnp.asarray(alts)))
    theirs = ecef_reference(lons, lats, alts)
    np.testing.assert_allclose(ours, theirs, atol=1e-8)


def test_enu_origin_and_axes():
    lon0, lat0, alt0 = 8.39, 49.03, 112.0
    # Origin maps to (0,0,0).
    enu = geodesy.wgs84_to_enu(
        jnp.asarray([lon0]), jnp.asarray([lat0]), jnp.asarray([alt0]), lon0, lat0, alt0
    )
    np.testing.assert_allclose(np.asarray(enu), 0.0, atol=1e-9)
    # A pure-altitude offset is pure Up.
    enu = geodesy.wgs84_to_enu(
        jnp.asarray([lon0]), jnp.asarray([lat0]), jnp.asarray([alt0 + 10.0]), lon0, lat0, alt0
    )
    np.testing.assert_allclose(np.asarray(enu)[0], [0.0, 0.0, 10.0], atol=1e-9)
    # A small east offset is mostly East, scaled by cos(lat)·(N+h).
    dlon = 1e-4
    enu = np.asarray(
        geodesy.wgs84_to_enu(
            jnp.asarray([lon0 + dlon]), jnp.asarray([lat0]), jnp.asarray([alt0]), lon0, lat0, alt0
        )
    )[0]
    assert enu[0] > 7.0 and abs(enu[1]) < 0.01 and abs(enu[2]) < 0.01


def test_enu_preserves_local_distances_vs_utm():
    # On the seq-04 track (few hundred metres), ENU and UTM inter-point
    # distances agree to ~mm — validates ENU as the TPU-native local frame.
    lons, lats, alts = kitti04_lonlat()
    x, y = geodesy.utm_forward(jnp.asarray(lons), jnp.asarray(lats), 32)
    utm = np.stack([np.asarray(x), np.asarray(y), alts], axis=-1)
    enu = np.asarray(
        geodesy.wgs84_to_enu(
            jnp.asarray(lons), jnp.asarray(lats), jnp.asarray(alts),
            lons[0], lats[0], alts[0],
        )
    )
    d_utm = np.linalg.norm(np.diff(utm, axis=0), axis=1)
    d_enu = np.linalg.norm(np.diff(enu, axis=0), axis=1)
    np.testing.assert_allclose(d_enu, d_utm, atol=2e-3)
