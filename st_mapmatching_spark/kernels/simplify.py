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


def dp_keep_masks_batch(xy: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                        tolerance: float) -> np.ndarray:
    """Douglas-Peucker over MANY concatenated trajectories at once: each
    round evaluates the max-chord-distance point of EVERY pending interval
    in one set of numpy ops (the per-interval recursion costs ~60 us of
    call overhead per interval — the measured extract-stage hot spot).

    xy: (N, 2) concatenated points; trajectory i spans [starts[i],
    ends[i]). Returns the global keep mask. Decision-identical to
    dp_keep_mask per trajectory: same chord kernel, same first-max
    tie-break (argmax), same >= tolerance test — the interval processing
    order never affects the final keep set (each interval's decision
    depends only on its own endpoints)."""
    n = len(xy)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[starts] = True
    keep[ends - 1] = True

    s = starts[ends - starts > 2].astype(np.int64)
    e = (ends - 1)[ends - starts > 2].astype(np.int64)
    x, y = xy[:, 0], xy[:, 1]
    while len(s):
        m = e - s - 1                                # interior point count
        base = np.repeat(np.cumsum(m) - m, m)
        rows = np.repeat(s + 1, m) + (np.arange(int(m.sum())) - base)
        iv = np.repeat(np.arange(len(s)), m)
        d = point_to_chord_dist(x[rows], y[rows],
                                x[s[iv]], y[s[iv]], x[e[iv]], y[e[iv]])
        # first-max per interval (np.argmax semantics): order by
        # (interval, -d, position); the first row of each interval wins
        local = np.arange(len(rows)) - base
        order = np.lexsort((local, -d, iv))
        iv_o = iv[order]
        first = np.concatenate([[True], iv_o[1:] != iv_o[:-1]])
        w = order[first]                             # winner row per interval
        split = d[w] >= tolerance
        k = rows[w[split]]
        keep[k] = True
        sw, ew = s[iv[w[split]]], e[iv[w[split]]]
        s = np.concatenate([sw, k])
        e = np.concatenate([k, ew])
        sub = e - s >= 2                             # intervals with interiors
        s, e = s[sub], e[sub]
    return keep


def simplify_points_batch(xy_all: np.ndarray, starts: np.ndarray,
                          ends: np.ndarray, tolerance: float) -> np.ndarray:
    """Batch twin of simplify_points over concatenated trajectories:
    returns a global keep MASK (same per-trajectory decisions, including
    the originally-2-point coincident collapse)."""
    keep = dp_keep_masks_batch(xy_all, starts, ends, tolerance)
    two = ends - starts == 2
    if two.any():
        i0 = starts[two]
        co = np.linalg.norm(xy_all[i0] - xy_all[i0 + 1], axis=1) < 1e-6
        keep[i0[co] + 1] = False
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
