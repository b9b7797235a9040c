"""Closed-form inverse transverse Mercator (WGS84) — the UTM leg of the
reference-checkpoint loader, replacing pyproj (absent in this sandbox).

Standard Snyder series (Map Projections: A Working Manual, USGS PP 1395,
eqs. 8-17..8-25): footpoint latitude from the meridian-arc series, then the
D-polynomial expansions. Accuracy is sub-millimeter across a UTM zone —
orders of magnitude below the GPS noise the matcher is built for.
"""

from __future__ import annotations

import numpy as np

A = 6378137.0                     # WGS84 semi-major axis
F = 1.0 / 298.257223563           # flattening
E2 = F * (2.0 - F)                # first eccentricity squared
EP2 = E2 / (1.0 - E2)             # second eccentricity squared
K0 = 0.9996                       # UTM scale factor
FALSE_EASTING = 500000.0


def tmerc_inverse(x, y, lon_cm: float):
    """(easting, northing) -> (lon_deg, lat_deg) for a northern-hemisphere
    UTM zone with central meridian ``lon_cm`` (e.g. 111.0 for EPSG:32649)."""
    x = np.asarray(x, dtype=np.float64) - FALSE_EASTING
    m = np.asarray(y, dtype=np.float64) / K0
    mu = m / (A * (1 - E2 / 4 - 3 * E2**2 / 64 - 5 * E2**3 / 256))
    e1 = (1 - np.sqrt(1 - E2)) / (1 + np.sqrt(1 - E2))
    phi1 = (mu
            + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
            + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
            + (151 * e1**3 / 96) * np.sin(6 * mu)
            + (1097 * e1**4 / 512) * np.sin(8 * mu))
    sp, cp = np.sin(phi1), np.cos(phi1)
    c1 = EP2 * cp**2
    t1 = (sp / cp) ** 2
    n1 = A / np.sqrt(1 - E2 * sp**2)
    r1 = A * (1 - E2) / (1 - E2 * sp**2) ** 1.5
    d = x / (n1 * K0)
    lat = phi1 - (n1 * sp / cp / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * EP2 - 3 * c1**2) * d**6 / 720)
    lon = np.radians(lon_cm) + (
        d - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * EP2 + 24 * t1**2) * d**5 / 120) / cp
    return np.degrees(lon), np.degrees(lat)
