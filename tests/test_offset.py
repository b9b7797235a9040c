"""parallel_offset_edge kernel vs hand-computed offsets
(reference: /root/reference/mapmatching/osmnet/twoway_edge.py:67-123)."""

import numpy as np

from st_mapmatching_spark.kernels.offset import (
    parallel_offset_edge,
    right_offset_polyline,
)


def test_right_offset_straight():
    out = right_offset_polyline(np.array([[0.0, 0], [2, 0]]), 0.5)
    # travelling +x, right is -y
    assert np.allclose(out, [[0, -0.5], [2, -0.5]])


def test_right_offset_miter_corner():
    # east then north; the right-angle outer corner miters to (1.1, -0.1)
    out = right_offset_polyline(np.array([[0.0, 0], [1, 0], [1, 1]]), 0.1)
    assert np.allclose(out, [[0, -0.1], [1.1, -0.1], [1.1, 1]])


def test_right_offset_near_reversal_bevel_bounded():
    # ~180 degree turn: miter would explode; bevel keeps the point bounded
    c = np.array([[0.0, 0], [1, 0], [0, 1e-6]])
    out = right_offset_polyline(c, 0.1)
    assert np.all(np.isfinite(out))
    assert np.abs(out - c).max() < 1.0


def test_parallel_offset_two_point():
    out = parallel_offset_edge(np.array([[0.0, 0], [2, 0]]), 0.5)
    exp = [[0, 0], [round(2 / 15, 7), -0.5], [round(2 - 2 / 15, 7), -0.5], [2, 0]]
    assert np.allclose(out, exp)


def test_parallel_offset_corner():
    out = parallel_offset_edge(np.array([[0.0, 0], [1, 0], [1, 1]]), 0.1)
    exp = [[0, 0],
           [round(1 / 15, 7), -0.1],     # turning_s = off[0] + (c1-c0)/15
           [1.1, -0.1],                  # miter body vertex
           [1.1, round(1 - 1 / 15, 7)],  # turning_e = off[-1] - (cn-cn_1)/15
           [1, 1]]
    assert np.allclose(out, exp)
    # original endpoints always preserved (twoway_edge.py:99-111)
    assert np.allclose(out[0], [0, 0]) and np.allclose(out[-1], [1, 1])


def test_parallel_offset_degenerate_and_ring():
    one = np.array([[3.0, 4.0]])
    assert np.array_equal(parallel_offset_edge(one), one)
    ring = np.array([[0.0, 0], [1, 0], [1, 1], [0, 0]])
    assert np.array_equal(parallel_offset_edge(ring), ring)
