"""Pinned deterministic metric projection.

Replaces the reference's runtime UTM estimation
(/root/reference/mapmatching/graph/geograph.py:302-310 via
geopandas ``estimate_utm_crs``) with a closed-form equirectangular
projection about a fixed origin. The closed form is reproducible in
ANSI SQL, which lets DuckDB act as a relational oracle for every
cell/tile query.

x = (lon - lon0) * cos(lat0) * M_PER_DEG     [meters east]
y = (lat - lat0) * M_PER_DEG                 [meters north]
"""

from __future__ import annotations

import numpy as np

from ..config import M_PER_DEG


def lonlat_to_xy(lon, lat, lon0: float, lat0: float):
    """Vectorized lon/lat (deg) -> local metric x/y (m)."""
    k = np.cos(np.radians(lat0))
    x = (np.asarray(lon, dtype=np.float64) - lon0) * M_PER_DEG * k
    y = (np.asarray(lat, dtype=np.float64) - lat0) * M_PER_DEG
    return x, y


def xy_to_lonlat(x, y, lon0: float, lat0: float):
    k = np.cos(np.radians(lat0))
    lon = np.asarray(x, dtype=np.float64) / (M_PER_DEG * k) + lon0
    lat = np.asarray(y, dtype=np.float64) / M_PER_DEG + lat0
    return lon, lat


def project_coords(coords: np.ndarray, lon0: float, lat0: float) -> np.ndarray:
    """Project an (n, 2) lon/lat array to metric xy."""
    coords = np.asarray(coords, dtype=np.float64)
    x, y = lonlat_to_xy(coords[..., 0], coords[..., 1], lon0, lat0)
    return np.stack([x, y], axis=-1)
