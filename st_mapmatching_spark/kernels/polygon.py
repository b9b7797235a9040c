"""Point-in-polygon (ray casting) — the exact refine step of the tiling
queries (north_rule capability; no direct reference analogue — the
reference's nearest spatial surface is
/root/reference/mapmatching/geo/query.py:12-118).

Vectorized over many points against one ring; boundary points follow the
usual crossing convention (on-edge results are half-open and made
deterministic by the fixtures avoiding exact-boundary points).
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Boolean mask: is each (px[i], py[i]) inside the closed ring (k,2)?"""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] >= 2 and np.allclose(ring[0], ring[-1]):
        ring = ring[:-1]
    n = ring.shape[0]
    inside = np.zeros(px.shape, dtype=bool)
    x0, y0 = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    for i in range(n):
        crosses = ((y0[i] > py) != (y1[i] > py))
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x1[i] - x0[i]) * (py - y0[i]) / (y1[i] - y0[i]) + x0[i]
        inside ^= crosses & (px < xint)
    return inside


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    ring = np.asarray(ring, dtype=np.float64)
    return (float(ring[:, 0].min()), float(ring[:, 1].min()),
            float(ring[:, 0].max()), float(ring[:, 1].max()))
