"""Douglas-Peucker trajectory simplification.

Semantics re-derived from /root/reference/mapmatching/geo/ops/simplify.py
(dp_compress :6-53, simplify_trajetory_points :85-118): keep both endpoints,
recursively keep the point with max chord distance when it is >= tolerance;
a 2-point trajectory collapses to 1 point when the points coincide (<1e-6).

Implemented iteratively (explicit stack) over numpy — data-dependent
recursion is exactly the non-SQL shape that lives inside `applyInPandas`.
"""

from __future__ import annotations

import numpy as np

from .geodesy import point_to_chord_dist


def dp_keep_mask(xy: np.ndarray, tolerance: float) -> np.ndarray:
    """Boolean keep-mask for an ordered (n, 2) metric coordinate array."""
    n = xy.shape[0]
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep

    stack = [(0, n - 1)]
    while stack:
        s, e = stack.pop()
        if e - s < 2:
            continue
        mid = xy[s + 1: e]
        d = point_to_chord_dist(mid[:, 0], mid[:, 1],
                                xy[s, 0], xy[s, 1], xy[e, 0], xy[e, 1])
        j = int(np.argmax(d))
        if d[j] >= tolerance:
            k = s + 1 + j
            keep[k] = True
            stack.append((s, k))
            stack.append((k, e))
    return keep


def simplify_points(xy: np.ndarray, tolerance: float) -> np.ndarray:
    """Return kept-row indices. Mirrors simplify_trajetory_points edge cases:
    single point passes through; a 2-point trajectory with coincident points
    collapses to its first point (simplify.py:106-112)."""
    n = xy.shape[0]
    if n <= 1:
        return np.arange(n)
    keep = dp_keep_mask(np.asarray(xy, dtype=np.float64), tolerance)
    idx = np.flatnonzero(keep)
    # Only an *originally* 2-point coincident trajectory collapses
    # (simplify.py:106-112 checks ori_size == 2).
    if n == 2 and np.linalg.norm(xy[0] - xy[1]) < 1e-6:
        return idx[:1]
    return idx
