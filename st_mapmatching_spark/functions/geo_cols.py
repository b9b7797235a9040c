"""Reusable pyspark Column builders for the geometry math that is pure
arithmetic — these stay JVM-side inside whole-stage codegen (no Python in
the hot path). Each mirrors a numpy kernel bit-for-bit:

* projection      <-> kernels/projection.py (pinned equirectangular)
* cell encoding   <-> kernels/cells.py
* bearing         <-> kernels/geodesy.py::bearing_deg
  (the piecewise-quadrant definition of
  /root/reference/mapmatching/geo/azimuth.py:68-99)
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import M_PER_DEG
from ..kernels.cells import OFFSET, SHIFT


def xy_cols(lon: Column, lat: Column, lon0: float, lat0: float) -> tuple[Column, Column]:
    k = math.cos(math.radians(lat0))
    x = (lon - F.lit(lon0)) * F.lit(M_PER_DEG * k)
    y = (lat - F.lit(lat0)) * F.lit(M_PER_DEG)
    return x, y


def cell_col(ix: Column, iy: Column) -> Column:
    return (ix + F.lit(OFFSET)).cast("long") * F.lit(SHIFT) + (iy + F.lit(OFFSET)).cast("long")


def cell_of_xy(x: Column, y: Column, cell_size: float) -> Column:
    ix = F.floor(x / F.lit(cell_size))
    iy = F.floor(y / F.lit(cell_size))
    return cell_col(ix, iy)


def bearing_col(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Compass bearing in degrees, 0 = +y, clockwise; same quadrant cases
    as kernels.geodesy.bearing_deg."""
    dx = x2 - x1
    dy = y2 - y1
    rad = (
        F.when((dx == 0) & (dy >= 0), F.lit(0.0))
        .when((dx == 0) & (dy < 0), F.lit(math.pi))
        .when((dy == 0) & (dx > 0), F.lit(math.pi / 2))
        .when((dy == 0) & (dx < 0), F.lit(3 * math.pi / 2))
        .when((dx > 0) & (dy > 0), F.atan(dx / dy))
        .when((dx > 0) & (dy < 0), F.lit(math.pi / 2) + F.atan(-dy / dx))
        .when((dx < 0) & (dy < 0), F.lit(math.pi) + F.atan(dx / dy))
        .otherwise(F.lit(3 * math.pi / 2) + F.atan(dy / -dx))
    )
    return rad * F.lit(180.0 / math.pi)
