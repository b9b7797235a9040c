"""Trajectory similarity metrics + resampling (the eval surface,
SURVEY.md §2.11).

Semantics re-derived from /root/reference/mapmatching/geo/metric/trajDist.py
(lcss :8-53, edr :55-88, erp :90-124) and geo/ops/resample.py:9-45.
Euclidean geometry variants (the engine works in the pinned metric plane);
numpy DP loops instead of numba (absent here) — O(n*m) is fine at eval
scale, and the matrices are vectorized.
"""

from __future__ import annotations

import numpy as np


def dist_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)


def lcss(a: np.ndarray, b: np.ndarray, eps: float = 10.0) -> float:
    """Normalized longest-common-subsequence similarity in [0, 1]
    (trajDist.py:31-53: C[n,m] / min(n, m))."""
    m = dist_matrix(a, b) < eps
    n0, n1 = len(a), len(b)
    c = np.zeros((n0 + 1, n1 + 1), dtype=np.int64)
    for i in range(1, n0 + 1):
        hit = m[i - 1]
        for j in range(1, n1 + 1):
            c[i, j] = c[i - 1, j - 1] + 1 if hit[j - 1] else max(c[i, j - 1], c[i - 1, j])
    return float(c[n0, n1]) / min(n0, n1)


def edr(a: np.ndarray, b: np.ndarray, eps: float = 10.0) -> float:
    """Edit Distance on Real sequence, normalized by max(n, m)
    (trajDist.py:55-88)."""
    m = (dist_matrix(a, b) < eps)
    n0, n1 = len(a), len(b)
    c = np.zeros((n0 + 1, n1 + 1), dtype=np.float64)
    c[:, 0] = np.arange(n0 + 1)
    c[0, :] = np.arange(n1 + 1)
    for i in range(1, n0 + 1):
        for j in range(1, n1 + 1):
            sub = 0.0 if m[i - 1, j - 1] else 1.0
            c[i, j] = min(c[i, j - 1] + 1, c[i - 1, j] + 1, c[i - 1, j - 1] + sub)
    return float(c[n0, n1]) / max(n0, n1)


def erp(a: np.ndarray, b: np.ndarray, g: np.ndarray) -> float:
    """Edit distance with Real Penalty against gap point g
    (trajDist.py:90-124)."""
    n0, n1 = len(a), len(b)
    md = dist_matrix(a, b)
    ref1 = np.linalg.norm(a - g[None, :], axis=1)
    ref2 = np.linalg.norm(b - g[None, :], axis=1)
    c = np.zeros((n0 + 1, n1 + 1))
    c[1:, 0] = ref1.sum()
    c[0, 1:] = ref2.sum()
    for i in range(1, n0 + 1):
        for j in range(1, n1 + 1):
            c[i, j] = min(c[i - 1, j] + ref1[i - 1],
                          c[i, j - 1] + ref2[j - 1],
                          c[i - 1, j - 1] + md[i - 1, j - 1])
    return float(c[n0, n1])


def resample_polyline(coords: np.ndarray, step: float = 5.0,
                      keep_last: bool = True) -> np.ndarray:
    """Sample points every `step` meters along a polyline
    (resample.py:9-45): cumulative arc length + linear interpolation;
    duplicate consecutive vertices dropped first."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) > 1:
        keep = np.concatenate([[True], np.any(coords[1:] != coords[:-1], axis=1)])
        coords = coords[keep]
    if len(coords) == 1:
        return coords.copy()
    seg = np.linalg.norm(coords[1:] - coords[:-1], axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    samples = np.arange(0.0, cum[-1], step)
    xs = np.interp(samples, cum, coords[:, 0])
    ys = np.interp(samples, cum, coords[:, 1])
    out = np.stack([xs, ys], axis=1)
    if keep_last:
        out = np.concatenate([out, coords[-1:][:, :2]])
    return out
