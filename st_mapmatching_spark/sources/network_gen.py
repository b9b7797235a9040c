"""Deterministic synthetic road-network generator.

Stands in for the reference's OSM XML ETL
(/root/reference/mapmatching/osmnet/parse_osm_xml.py:354-384): grid +
diagonal ways over a small lon/lat window, a mix of oneway and two-way
ways (two-way expanded to reverse twins exactly like
/root/reference/mapmatching/osmnet/twoway_edge.py:22-49), multi-vertex
polylines via a jittered midpoint, speeds by road class. Pure function of
(seed, nx, ny) — no external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import M_PER_DEG, MatchConfig


def make_grid_network(cfg: MatchConfig, nx: int = 12, ny: int = 12,
                      spacing_m: float = 200.0, seed: int = 42,
                      diagonals: bool = True):
    """Returns (edges_df, nodes_df). Node ids: j*nx+i for grid position
    (i, j). Edge geometry is 3 vertices (jittered midpoint) so the linear
    referencing kernel exercises real polylines."""
    rng = np.random.default_rng(seed)
    k = np.cos(np.radians(cfg.lat0))
    dlon = spacing_m / (M_PER_DEG * k)
    dlat = spacing_m / M_PER_DEG

    nid, lon, lat = [], [], []
    for j in range(ny):
        for i in range(nx):
            nid.append(j * nx + i)
            lon.append(cfg.lon0 + i * dlon)
            lat.append(cfg.lat0 + j * dlat)
    nodes = pd.DataFrame({"nid": nid, "x": lon, "y": lat})
    pos = {n: (lo, la) for n, lo, la in zip(nid, lon, lat)}

    def mid_jitter(a, b, mag=0.08):
        mx, my = (a[0] + b[0]) / 2, (a[1] + b[1]) / 2
        return (mx + (rng.random() - 0.5) * mag * dlon,
                my + (rng.random() - 0.5) * mag * dlat)

    ways = []  # (way_id, src, dst, speed, oneway)
    wid = 0
    for j in range(ny):            # horizontal ways
        for i in range(nx - 1):
            ways.append((wid, j * nx + i, j * nx + i + 1, 16.7, j % 3 == 0))
        wid += 1
    for i in range(nx):            # vertical ways
        for j in range(ny - 1):
            ways.append((wid, j * nx + i, (j + 1) * nx + i, 13.9, i % 4 == 0))
        wid += 1
    if diagonals:                  # sparse diagonals (fast roads)
        for j in range(0, ny - 1, 3):
            for i in range(0, nx - 1, 3):
                ways.append((wid, j * nx + i, (j + 1) * nx + i + 1, 22.2, True))
            wid += 1

    rows = []
    eid = 0
    for way_id, src, dst, speed, oneway in ways:
        a, b = pos[src], pos[dst]
        geom = [list(a), list(mid_jitter(a, b)), list(b)]
        rows.append((eid, src, dst, way_id, 1, speed, geom))
        eid += 1
        if not oneway:
            rgeom = geom[::-1]
            rows.append((eid, dst, src, way_id, -1, speed, rgeom))
            eid += 1

    edges = pd.DataFrame(rows, columns=["eid", "src", "dst", "way_id", "dir", "speed", "geom"])
    return edges, nodes
