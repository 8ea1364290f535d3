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
