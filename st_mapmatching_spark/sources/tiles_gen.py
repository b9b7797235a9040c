"""Deterministic tile-polygon fixture generator (FIXTURES.md §3).

Rectangular tiles covering the network bbox plus a few convex non-
rectangular tiles so the exact ray-cast refine path is exercised.
Polygons are in metric coords (the pinned projection plane)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..graph.network import Network


def make_tiles(net: Network, n_side: int = 4, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    x0, y0, x1, y1 = net.bbox_xy
    dx = (x1 - x0) / n_side
    dy = (y1 - y0) / n_side
    rows = []
    tid = 0
    for j in range(n_side):
        for i in range(n_side):
            ax, ay = x0 + i * dx, y0 + j * dy
            ring = [[ax, ay], [ax + dx, ay], [ax + dx, ay + dy], [ax, ay + dy], [ax, ay]]
            rows.append((tid, 0, ring))
            tid += 1
    # convex non-rectangular tiles (hexagons) at jittered centers
    for _ in range(3):
        cx = rng.uniform(x0 + dx, x1 - dx)
        cy = rng.uniform(y0 + dy, y1 - dy)
        rad = min(dx, dy) * 0.4
        ang = np.linspace(0, 2 * np.pi, 7)
        ring = [[cx + rad * np.cos(a), cy + rad * np.sin(a)] for a in ang]
        rows.append((tid, 1, ring))
        tid += 1
    return pd.DataFrame(rows, columns=["tile_id", "res", "polygon"])
