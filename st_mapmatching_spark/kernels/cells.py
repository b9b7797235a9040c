"""Integer grid-cell encoding over the pinned metric plane.

Replaces the reference's GeoPandas STRtree spatial index
(/root/reference/mapmatching/geo/query.py:65-71,92-97) with an
S2/H3-style discrete cell id that turns the radius spatial join into an
equi-join Catalyst can plan. The encoding is pure integer arithmetic so
DuckDB can reproduce it in SQL for the correctness oracle:

    ix   = floor(x / cell_size);  iy = floor(y / cell_size)
    cell = (ix + 2^25) * 2^26 + (iy + 2^25)

Valid for |x|,|y| < 2^25 * cell_size (a couple of thousand km at 64 m),
and cell < 2^52 fits exactly in both int64 and float64.
"""

from __future__ import annotations

import numpy as np

OFFSET = 1 << 25
SHIFT = 1 << 26


def encode_cell(ix, iy) -> np.ndarray:
    return (np.asarray(ix, dtype=np.int64) + OFFSET) * SHIFT + (np.asarray(iy, dtype=np.int64) + OFFSET)


def decode_cell(cell):
    cell = np.asarray(cell, dtype=np.int64)
    ix = cell // SHIFT - OFFSET
    iy = cell % SHIFT - OFFSET
    return ix, iy


def xy_to_cell(x, y, cell_size: float) -> np.ndarray:
    ix = np.floor(np.asarray(x, dtype=np.float64) / cell_size).astype(np.int64)
    iy = np.floor(np.asarray(y, dtype=np.float64) / cell_size).astype(np.int64)
    return encode_cell(ix, iy)


def box_cover_cells(x0, y0, x1, y1, cell_size: float) -> np.ndarray:
    """All cells intersecting one axis-aligned box (scalar inputs)."""
    ix0 = int(np.floor(x0 / cell_size)); ix1 = int(np.floor(x1 / cell_size))
    iy0 = int(np.floor(y0 / cell_size)); iy1 = int(np.floor(y1 / cell_size))
    ixs, iys = np.meshgrid(np.arange(ix0, ix1 + 1), np.arange(iy0, iy1 + 1))
    return encode_cell(ixs.ravel(), iys.ravel())


def polyline_cover_cells(coords: np.ndarray, cell_size: float, pad: float = 0.0) -> np.ndarray:
    """Conservative cell cover of a polyline: union of per-segment bbox
    covers (optionally padded). Over-covering is fine — the join is
    refined by exact point-to-curve distance afterwards."""
    coords = np.asarray(coords, dtype=np.float64)
    out = []
    for i in range(len(coords) - 1):
        x0 = min(coords[i, 0], coords[i + 1, 0]) - pad
        x1 = max(coords[i, 0], coords[i + 1, 0]) + pad
        y0 = min(coords[i, 1], coords[i + 1, 1]) - pad
        y1 = max(coords[i, 1], coords[i + 1, 1]) + pad
        out.append(box_cover_cells(x0, y0, x1, y1, cell_size))
    if not out:
        return xy_to_cell(coords[:1, 0], coords[:1, 1], cell_size)
    return np.unique(np.concatenate(out))
