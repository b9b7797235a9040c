"""Parallel-offset kernel for two-way edge rendering.

Numpy re-derivation of the reference's parallel_offset_edge
(/root/reference/mapmatching/osmnet/twoway_edge.py:67-123): the reverse
twin of a two-way road is shifted a small distance to its RIGHT so the
two directions render (and project) as separate carriageways. The
reference delegates the core offset to shapely's
``LineString.parallel_offset(distance, side='right')`` and then rebuilds
the ends: original endpoints are kept, with a short "turning" segment
(1/15 of the first/last segment vector) splicing the offset body back
into them.

Here the right-offset polyline is computed directly with miter joins
(the textbook polygon-offsetting construction): each segment shifts by
``distance`` along its right normal, and consecutive offset segments
meet at p_i + distance * (n_{i-1} + n_i) / (1 + n_{i-1}·n_i).

Documented divergence: shapely's offset additionally resolves
self-intersections on sharp concave turns (it may drop vertices or
return a MultiLineString, which the reference then fails on and falls
back to the unmodified geometry — twoway_edge.py:119-123). The miter
construction never self-heals but is exact for the gentle polylines the
offset is meant for; near-180-degree turns fall back to a bevel
midpoint.
"""

from __future__ import annotations

import numpy as np

# ~1.25 m expressed in degrees, the reference's default offset distance
DEFAULT_OFFSET_DEG = 1.25 / 110 / 1000


def right_offset_polyline(coords: np.ndarray, distance: float) -> np.ndarray:
    """Offset a polyline by ``distance`` to the right of its direction of
    travel, miter joins at interior vertices."""
    c = np.asarray(coords, dtype=np.float64)
    d = np.diff(c, axis=0)
    seg_len = np.hypot(d[:, 0], d[:, 1])
    seg_len = np.where(seg_len == 0, 1.0, seg_len)
    # right normal of (dx,dy) is (dy,-dx)
    n = np.stack([d[:, 1], -d[:, 0]], axis=1) / seg_len[:, None]

    out = np.empty_like(c)
    out[0] = c[0] + distance * n[0]
    out[-1] = c[-1] + distance * n[-1]
    if len(c) > 2:
        n0, n1 = n[:-1], n[1:]
        dot = np.sum(n0 * n1, axis=1)
        miter = (n0 + n1) / np.maximum(1.0 + dot, 1e-9)[:, None]
        # near-reversal (dot ~ -1): miter explodes; bevel midpoint instead
        sharp = dot < -0.999
        if sharp.any():
            bevel = (n0 + n1) / 2.0
            miter[sharp] = bevel[sharp]
        out[1:-1] = c[1:-1] + distance * miter
    return out


def parallel_offset_edge(coords, distance: float = DEFAULT_OFFSET_DEG) -> np.ndarray:
    """The reference's end-preserving offset (twoway_edge.py:99-118):
    original endpoints kept, turning points = offset ends nudged by 1/15
    of the first/last segment vector, offset body in between; rings and
    degenerate (<2 point) lines returned unchanged; coordinates rounded
    to 1e-7 (twoway_edge.py:112)."""
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        return c
    if np.array_equal(c[0], c[-1]):  # is_ring
        return c
    off = right_offset_polyline(c, distance)
    dxdy_s = (c[1] - c[0]) / 15.0
    dxdy_e = (c[-1] - c[-2]) / 15.0
    turning_s = off[0] + dxdy_s
    turning_e = off[-1] - dxdy_e
    parts = [c[0][None, :], turning_s[None, :]]
    if len(c) > 2:
        parts.append(off[1:-1])
    parts += [turning_e[None, :], c[-1][None, :]]
    return np.round(np.concatenate(parts, axis=0), 7)
