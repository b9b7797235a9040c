"""Bearings, angle similarity, haversine.

Semantics re-derived from /root/reference/mapmatching/geo/azimuth.py
(azimuthAngle_vector :68-99, azimuth_diff :8-26, azimuth_cos_similarity
:102-118, cal_linestring_azimuth_cos_dist :175-208) and
/root/reference/mapmatching/geo/ops/distance.py (coords_seq_distance :76-80).
Implementation is our own vectorized numpy.
"""

from __future__ import annotations

import numpy as np

from ..config import EARTH_RADIUS_M


def bearing_deg(x1, y1, x2, y2) -> np.ndarray:
    """Compass bearing (0=north/+y, clockwise, degrees) of (x1,y1)->(x2,y2).

    Piecewise-quadrant definition matching the reference's vectorized
    variant (azimuth.py:68-99): dx==0 -> 0 unless dy<0 -> 180;
    dy==0 -> 90 (dx>0) / 270 (dx<0). Zero-length deltas map to 0.
    """
    dx = np.asarray(x2, dtype=np.float64) - np.asarray(x1, dtype=np.float64)
    dy = np.asarray(y2, dtype=np.float64) - np.asarray(y1, dtype=np.float64)

    ang = np.zeros_like(dx)
    with np.errstate(divide="ignore", invalid="ignore"):
        q1 = (dx > 0) & (dy > 0)
        q2 = (dx > 0) & (dy < 0)
        q3 = (dx < 0) & (dy < 0)
        q4 = (dx < 0) & (dy > 0)
        ang = np.where(q1, np.arctan(np.divide(dx, dy, where=dy != 0)), ang)
        ang = np.where(q2, np.pi / 2 + np.arctan(np.divide(-dy, dx, where=dx != 0)), ang)
        ang = np.where(q3, np.pi + np.arctan(np.divide(dx, dy, where=dy != 0)), ang)
        ang = np.where(q4, 3 * np.pi / 2 + np.arctan(np.divide(dy, -dx, where=dx != 0)), ang)
    ang = np.where((dx == 0) & (dy < 0), np.pi, ang)
    ang = np.where((dy == 0) & (dx > 0), np.pi / 2, ang)
    ang = np.where((dy == 0) & (dx < 0), 3 * np.pi / 2, ang)
    ang = np.where((dx == 0) & (dy >= 0), 0.0, ang)
    return ang * 180.0 / np.pi


def bearing_diff_deg(a, b) -> np.ndarray:
    """Absolute angular difference folded to [0, 180] degrees (azimuth.py:8-26)."""
    diff = np.abs(np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64))
    return np.where(diff > 180.0, 360.0 - diff, diff)


def bearing_cos_similarity(a, b) -> np.ndarray:
    """cos of the folded angle difference, in [-1, 1] (azimuth.py:102-118)."""
    return np.cos(np.radians(bearing_diff_deg(a, b)))


def seq_lengths(coords: np.ndarray):
    """Per-segment euclidean lengths of an (n,2) coordinate sequence and their sum."""
    coords = np.asarray(coords, dtype=np.float64)
    d = np.linalg.norm(coords[1:] - coords[:-1], axis=1)
    return d, float(d.sum())


def polyline_bearing_cos_dist(coords, head_bearing_deg: float) -> float:
    """Length-weighted mean of per-segment normalized cos-similarity against a
    heading — the dir_prob kernel (azimuth.py:175-208).

    Normalizes cos from [-1,1] to [0,1]; weights are segment lengths (metric
    coords -> euclidean). Zero total length falls back to the unweighted mean.
    Returns nan for None/degenerate geometry, matching the reference's None.
    """
    if coords is None:
        return float("nan")
    coords = np.asarray(coords, dtype=np.float64)
    if coords.ndim != 2 or coords.shape[0] < 2:
        return float("nan")
    segs = bearing_deg(coords[:-1, 0], coords[:-1, 1], coords[1:, 0], coords[1:, 1])
    sim = (bearing_cos_similarity(segs, head_bearing_deg) + 1.0) / 2.0
    w, total = seq_lengths(coords)
    if total == 0:
        return float(np.mean(sim))
    return float(np.average(sim, weights=w))


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters (vectorized)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(v, dtype=np.float64))
                              for v in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(h))


def point_to_chord_dist(px, py, ax, ay, bx, by) -> np.ndarray:
    """Distance from point X to the chord A-B via Heron's formula
    (distance.py:82-102). When A==B degenerates to point distance.

    sqrt(dx*dx+dy*dy) instead of np.hypot deliberately: IEEE sqrt/mul/add
    are correctly rounded (hypot is not), so a SQL twin of the DP
    recursion reproduces every distance bitwise — ties and >= tolerance
    decisions included."""
    def _norm(dx, dy):
        dx = np.asarray(dx, dtype=np.float64)
        dy = np.asarray(dy, dtype=np.float64)
        return np.sqrt(dx * dx + dy * dy)

    a = _norm(np.asarray(bx) - ax, np.asarray(by) - ay)          # |AB|
    b = _norm(np.asarray(px) - ax, np.asarray(py) - ay)          # |AX|
    c = _norm(np.asarray(px) - bx, np.asarray(py) - by)          # |BX|
    p = (a + b + c) / 2.0
    s = np.sqrt(np.abs(p * (p - a) * (p - b) * (p - c)))
    # no errstate: the denominator is substituted with 1.0 where a == 0,
    # so no division warning can fire (the context manager cost ~2 us per
    # call — material in the per-interval DP recursion)
    d = np.where(a == 0, b, 2.0 * s / np.where(a == 0, 1.0, a))
    return d
