import numpy as np
import pytest

from st_mapmatching_spark.kernels import datum


def test_roundtrip_wgs_gcj():
    lon = np.array([114.05, 116.39, 121.47])
    lat = np.array([22.54, 39.90, 31.23])
    glon, glat = datum.wgs84_to_gcj02(lon, lat)
    # offsets are a few hundred meters
    assert 1e-4 < np.abs(glon - lon).max() < 1e-2
    wlon, wlat = datum.gcj02_to_wgs84(glon, glat)
    np.testing.assert_allclose(wlon, lon, atol=1e-6)
    np.testing.assert_allclose(wlat, lat, atol=1e-6)


def test_roundtrip_gcj_bd():
    lon, lat = np.array([116.404]), np.array([39.915])
    blon, blat = datum.gcj02_to_bd09(lon, lat)
    glon, glat = datum.bd09_to_gcj02(blon, blat)
    np.testing.assert_allclose(glon, lon, atol=1e-6)
    np.testing.assert_allclose(glat, lat, atol=1e-6)


def test_out_of_china_passthrough():
    lon, lat = np.array([-122.4]), np.array([37.77])
    glon, glat = datum.wgs84_to_gcj02(lon, lat)
    assert glon[0] == lon[0] and glat[0] == lat[0]


def test_dispatcher():
    lon, lat = np.array([114.0]), np.array([22.5])
    for a in ("wgs", "gcj", "bd"):
        for b in ("wgs", "gcj", "bd"):
            lo, la = datum.convert(lon, lat, a, b)
            assert np.isfinite(lo).all() and np.isfinite(la).all()
