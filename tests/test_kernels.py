"""t1 unit tests: numpy kernels vs hand-computed values (SURVEY.md §5)."""

import numpy as np
import pytest

from st_mapmatching_spark.config import MatchConfig
from st_mapmatching_spark.kernels import hmm
from st_mapmatching_spark.kernels.cells import (box_cover_cells, decode_cell,
                                                encode_cell, polyline_cover_cells,
                                                xy_to_cell)
from st_mapmatching_spark.kernels.geodesy import (bearing_cos_similarity,
                                                  bearing_deg, bearing_diff_deg,
                                                  point_to_chord_dist,
                                                  polyline_bearing_cos_dist)
from st_mapmatching_spark.kernels.linear_ref import project_points_onto_polylines
from st_mapmatching_spark.kernels.polygon import points_in_ring
from st_mapmatching_spark.kernels.projection import lonlat_to_xy, xy_to_lonlat
from st_mapmatching_spark.kernels.simplify import simplify_points


def test_projection_roundtrip():
    lon = np.array([114.0, 114.01, 113.99])
    lat = np.array([22.5, 22.52, 22.48])
    x, y = lonlat_to_xy(lon, lat, 114.0, 22.5)
    lon2, lat2 = xy_to_lonlat(x, y, 114.0, 22.5)
    np.testing.assert_allclose(lon, lon2, atol=1e-12)
    np.testing.assert_allclose(lat, lat2, atol=1e-12)
    assert x[0] == 0.0 and y[0] == 0.0
    # ~2.22 km per 0.02 deg latitude
    assert 2200 < y[1] < 2250


def test_linear_ref_midline():
    res = project_points_onto_polylines(
        np.array([[3.0, 4.0]]), [np.array([[0.0, 0.0], [10.0, 0.0]])])
    np.testing.assert_allclose(res["proj"][0], [3.0, 0.0])
    assert res["dist"][0] == pytest.approx(4.0)
    assert res["len0"][0] == pytest.approx(3.0)
    assert res["len1"][0] == pytest.approx(7.0)
    np.testing.assert_allclose(res["seg0"][0], [[0, 0], [3, 0]])
    np.testing.assert_allclose(res["seg1"][0], [[3, 0], [10, 0]])


def test_linear_ref_endpoints_none_segments():
    line = [np.array([[0.0, 0.0], [10.0, 0.0]])]
    before = project_points_onto_polylines(np.array([[-2.0, 1.0]]), line)
    assert before["seg0"][0] is None
    assert before["len0"][0] == pytest.approx(0.0)
    after = project_points_onto_polylines(np.array([[12.0, 1.0]]), line)
    assert after["seg1"][0] is None
    assert after["len1"][0] == pytest.approx(0.0)


def test_linear_ref_interior_vertex_cut():
    line = [np.array([[0.0, 0.0], [5.0, 0.0], [10.0, 0.0]])]
    res = project_points_onto_polylines(np.array([[5.0, 3.0]]), line)
    np.testing.assert_allclose(res["proj"][0], [5.0, 0.0])
    np.testing.assert_allclose(res["seg0"][0], [[0, 0], [5, 0]])
    np.testing.assert_allclose(res["seg1"][0], [[5, 0], [10, 0]])


def test_linear_ref_ragged_batch():
    lines = [np.array([[0.0, 0.0], [10.0, 0.0]]),
             np.array([[0.0, 0.0], [0.0, 5.0], [5.0, 5.0], [5.0, 10.0]])]
    pts = np.array([[5.0, 1.0], [1.0, 6.0]])
    res = project_points_onto_polylines(pts, lines)
    assert res["dist"][0] == pytest.approx(1.0)
    np.testing.assert_allclose(res["proj"][1], [1.0, 5.0])
    assert res["len0"][1] == pytest.approx(6.0)
    assert res["len1"][1] == pytest.approx(4.0 + 5.0)


def test_bearing_quadrants():
    assert bearing_deg(0, 0, 0, 1) == pytest.approx(0.0)
    assert bearing_deg(0, 0, 1, 0) == pytest.approx(90.0)
    assert bearing_deg(0, 0, 0, -1) == pytest.approx(180.0)
    assert bearing_deg(0, 0, -1, 0) == pytest.approx(270.0)
    assert bearing_deg(0, 0, 1, 1) == pytest.approx(45.0)
    assert bearing_deg(0, 0, -1, -1) == pytest.approx(225.0)
    assert bearing_deg(0, 0, 0, 0) == pytest.approx(0.0)


def test_bearing_diff_and_cos():
    assert bearing_diff_deg(350, 10) == pytest.approx(20.0)
    assert bearing_cos_similarity(0, 90) == pytest.approx(0.0, abs=1e-12)
    assert bearing_cos_similarity(0, 180) == pytest.approx(-1.0)


def test_polyline_bearing_cos_dist_weighted():
    # two segments: one aligned (len 10), one perpendicular (len 5)
    coords = np.array([[0.0, 0.0], [0.0, 10.0], [5.0, 10.0]])
    v = polyline_bearing_cos_dist(coords, 0.0)
    # aligned -> 1.0 normalized; perpendicular -> 0.5; weights 10:5
    assert v == pytest.approx((1.0 * 10 + 0.5 * 5) / 15)
    assert np.isnan(polyline_bearing_cos_dist(None, 0.0))


def test_vertical_dist():
    assert point_to_chord_dist(0, 1, -1, 0, 1, 0) == pytest.approx(1.0)
    # coincident chord endpoints degenerate to point distance
    assert point_to_chord_dist(3, 4, 0, 0, 0, 0) == pytest.approx(5.0)


def test_simplify_tolerance():
    xy = np.array([[0.0, 0.0], [10.0, 0.4], [20.0, 0.0], [30.0, 9.0], [40.0, 0.0]])
    idx = simplify_points(xy, 5.0)
    assert 0 in idx and 4 in idx and 3 in idx and 1 not in idx
    # coincident 2-point trajectory collapses
    assert list(simplify_points(np.zeros((2, 2)), 5.0)) == [0]


def test_cells_roundtrip_and_cover():
    ix, iy = decode_cell(encode_cell([3, -7], [0, 12]))
    assert list(ix) == [3, -7] and list(iy) == [0, 12]
    cover = box_cover_cells(-10, -10, 70, 10, 64.0)
    assert len(cover) == 3 * 2  # ix in {-1,0,1}, iy in {-1,0}
    cover = box_cover_cells(0, 0, 63, 63, 64.0)
    assert len(cover) == 1
    cells = polyline_cover_cells(np.array([[0.0, 0.0], [200.0, 0.0]]), 64.0)
    assert xy_to_cell(100.0, 0.0, 64.0) in cells


def test_pip_square():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    inside = points_in_ring(np.array([5.0, 15.0, -1.0]), np.array([5.0, 5.0, 5.0]), ring)
    assert list(inside) == [True, False, False]


def test_emission():
    d = np.array([0.0, 20.0, 40.0])
    dens = hmm.gaussian_emission(d, sigma=20.0)
    assert dens[0] == pytest.approx(1 / (np.sqrt(2 * np.pi) * 20))
    p = hmm.observ_prob_from_density(dens, dens.max())
    assert p[0] == pytest.approx(1.0)
    assert p[1] == pytest.approx(np.sqrt(np.exp(-0.5)))


def test_dp_batch_equals_pergroup():
    """simplify_points_batch must reproduce simplify_points per trajectory
    exactly, including ties (quantized lateral noise makes equal chord
    distances common) and the 2-point coincident collapse."""
    import numpy as np
    from st_mapmatching_spark.kernels.simplify import (simplify_points,
                                                       simplify_points_batch)
    rng = np.random.RandomState(7)
    trajs = []
    for t in range(200):
        n = rng.randint(1, 60)
        xs = np.cumsum(rng.choice([10.0, 20.0], size=n))
        ys = rng.choice(np.arange(-20, 21, 5).astype(float), size=n)
        if t % 17 == 0 and n >= 2:      # coincident 2-point case
            xs, ys = np.array([5.0, 5.0]), np.array([1.0, 1.0])
        trajs.append(np.stack([xs, ys], 1))
    xy = np.concatenate(trajs)
    lens = np.array([len(t) for t in trajs])
    ends = np.cumsum(lens)
    starts = ends - lens
    got = simplify_points_batch(xy, starts, ends, tolerance=5.0)
    for t, s in zip(trajs, starts):
        exp = simplify_points(t, 5.0)
        assert np.array_equal(np.flatnonzero(got[s:s + len(t)]), exp)
