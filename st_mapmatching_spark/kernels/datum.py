"""Chinese datum transforms: WGS-84 <-> GCJ-02 <-> BD-09.

The reference ships the widely-published closed-form approximations
(/root/reference/mapmatching/geo/coord/coordTransform_py.py:43-175,
dispatched at coordTransfrom_shp.py:65-72). Re-implemented here as
vectorized numpy over the standard public formulas; usable directly as
column math inside an Arrow batch (no per-row Python).
"""

from __future__ import annotations

import numpy as np

_A = 6378245.0            # GCJ-02 ellipsoid semi-major axis
_EE = 0.00669342162296594323
_X_PI = np.pi * 3000.0 / 180.0


def _transform_lat(x, y):
    r = (-100.0 + 2.0 * x + 3.0 * y + 0.2 * y * y + 0.1 * x * y
         + 0.2 * np.sqrt(np.abs(x)))
    r += (20.0 * np.sin(6.0 * x * np.pi) + 20.0 * np.sin(2.0 * x * np.pi)) * 2.0 / 3.0
    r += (20.0 * np.sin(y * np.pi) + 40.0 * np.sin(y / 3.0 * np.pi)) * 2.0 / 3.0
    r += (160.0 * np.sin(y / 12.0 * np.pi) + 320.0 * np.sin(y * np.pi / 30.0)) * 2.0 / 3.0
    return r


def _transform_lon(x, y):
    r = (300.0 + x + 2.0 * y + 0.1 * x * x + 0.1 * x * y
         + 0.1 * np.sqrt(np.abs(x)))
    r += (20.0 * np.sin(6.0 * x * np.pi) + 20.0 * np.sin(2.0 * x * np.pi)) * 2.0 / 3.0
    r += (20.0 * np.sin(x * np.pi) + 40.0 * np.sin(x / 3.0 * np.pi)) * 2.0 / 3.0
    r += (150.0 * np.sin(x / 12.0 * np.pi) + 300.0 * np.sin(x / 30.0 * np.pi)) * 2.0 / 3.0
    return r


def out_of_china(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    return ~((72.004 <= lon) & (lon <= 137.8347) & (0.8293 <= lat) & (lat <= 55.8271))


def _offset(lon, lat):
    dlat = _transform_lat(lon - 105.0, lat - 35.0)
    dlon = _transform_lon(lon - 105.0, lat - 35.0)
    radlat = lat / 180.0 * np.pi
    magic = np.sin(radlat)
    magic = 1 - _EE * magic * magic
    sqrtmagic = np.sqrt(magic)
    dlat = (dlat * 180.0) / ((_A * (1 - _EE)) / (magic * sqrtmagic) * np.pi)
    dlon = (dlon * 180.0) / (_A / sqrtmagic * np.cos(radlat) * np.pi)
    return dlon, dlat


def wgs84_to_gcj02(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dlon, dlat = _offset(lon, lat)
    out = out_of_china(lon, lat)
    return np.where(out, lon, lon + dlon), np.where(out, lat, lat + dlat)


def gcj02_to_wgs84(lon, lat, iterations: int = 2):
    """Inverse via fixed-point iteration (the closed form has no exact
    inverse; 2 iterations reach ~1e-6 deg)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    wlon, wlat = lon.copy(), lat.copy()
    for _ in range(iterations):
        glon, glat = wgs84_to_gcj02(wlon, wlat)
        wlon += lon - glon
        wlat += lat - glat
    return wlon, wlat


def gcj02_to_bd09(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    z = np.sqrt(lon * lon + lat * lat) + 0.00002 * np.sin(lat * _X_PI)
    theta = np.arctan2(lat, lon) + 0.000003 * np.cos(lon * _X_PI)
    return z * np.cos(theta) + 0.0065, z * np.sin(theta) + 0.006


def bd09_to_gcj02(lon, lat):
    x = np.asarray(lon, dtype=np.float64) - 0.0065
    y = np.asarray(lat, dtype=np.float64) - 0.006
    z = np.sqrt(x * x + y * y) - 0.00002 * np.sin(y * _X_PI)
    theta = np.arctan2(y, x) - 0.000003 * np.cos(x * _X_PI)
    return z * np.cos(theta), z * np.sin(theta)


def convert(lon, lat, in_sys: str, out_sys: str):
    """Datum dispatcher (the reference's coord_transfer surface)."""
    systems = ("wgs", "gcj", "bd")
    assert in_sys in systems and out_sys in systems
    if in_sys == out_sys:
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    # normalize to gcj
    if in_sys == "wgs":
        lon, lat = wgs84_to_gcj02(lon, lat)
    elif in_sys == "bd":
        lon, lat = bd09_to_gcj02(lon, lat)
    if out_sys == "gcj":
        return lon, lat
    if out_sys == "wgs":
        return gcj02_to_wgs84(lon, lat)
    return gcj02_to_bd09(lon, lat)
