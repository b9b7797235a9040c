"""Tiling queries vs brute-force numpy oracle: PIP assignment exact match,
raster aggregation counts."""

import numpy as np
import pandas as pd
import pytest

from st_mapmatching_spark.kernels.polygon import points_in_ring
from st_mapmatching_spark.operators.candidates import extract_trajs, simplify_trajs
from st_mapmatching_spark.operators.tiling import assign_tiles, rasterize_points
from st_mapmatching_spark.sources.tiles_gen import make_tiles
from st_mapmatching_spark.kernels.cells import xy_to_cell


@pytest.fixture(scope="module")
def points_df(spark, pages, cfg):
    pages_df = spark.createDataFrame(pages)
    return simplify_trajs(extract_trajs(pages_df), cfg).persist()


@pytest.fixture(scope="module")
def tiles(net):
    return make_tiles(net)


def test_tile_assignment_matches_bruteforce(spark, points_df, tiles, cfg):
    got = (assign_tiles(spark, points_df, tiles, cfg)
           .select("url", "pid", "tile_id").toPandas()
           .sort_values(["url", "pid", "tile_id"]).reset_index(drop=True))

    pts = points_df.select("url", "pid", "x", "y").toPandas()
    rows = []
    for tile_id, ring in zip(tiles.tile_id, tiles.polygon):
        mask = points_in_ring(pts.x.to_numpy(), pts.y.to_numpy(),
                              np.vstack(ring).astype(np.float64))
        hit = pts[mask]
        rows.append(pd.DataFrame({"url": hit.url, "pid": hit.pid,
                                  "tile_id": int(tile_id)}))
    want = (pd.concat(rows).sort_values(["url", "pid", "tile_id"])
            .reset_index(drop=True).astype({"tile_id": "int64"}))

    pd.testing.assert_frame_equal(
        got.astype({"pid": "int64", "tile_id": "int64"}),
        want.astype({"pid": "int64"}))


def test_assign_tiles_distributed_catalog_parity(spark, points_df, tiles, cfg):
    """A Spark-DataFrame tile catalog must produce the same assignments as
    the driver-built path (both exact ray-cast and bbox modes)."""
    tiles_df = spark.createDataFrame(
        [(int(t), [[float(x), float(y)] for x, y in np.vstack(p)])
         for t, p in zip(tiles.tile_id, tiles.polygon)],
        "tile_id long, polygon array<array<double>>")
    for exact in (True, False):
        got = (assign_tiles(spark, points_df, tiles_df, cfg, exact=exact)
               .select("url", "pid", "tile_id").toPandas()
               .sort_values(["url", "pid", "tile_id"]).reset_index(drop=True))
        want = (assign_tiles(spark, points_df, tiles, cfg, exact=exact)
                .select("url", "pid", "tile_id").toPandas()
                .sort_values(["url", "pid", "tile_id"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want), exact


def test_assign_tiles_1e5_catalog_never_on_driver(spark, cfg):
    """10^5-tile catalog generated AS A SPARK JOB (spark.range -> polygon
    columns; never a driver pandas frame): square tiles on a 320x320 grid,
    so the expected assignment is closed-form floor arithmetic."""
    from pyspark.sql import functions as F
    side = 320                      # 102,400 tiles
    ts = 50.0                       # tile size, meters
    t = spark.range(side * side).select(F.col("id").alias("tile_id"))
    tx = (F.col("tile_id") % side).cast("double") * ts
    ty = (F.col("tile_id") / side).cast("long").cast("double") * ts
    poly = F.array(F.array(tx, ty), F.array(tx + ts, ty),
                   F.array(tx + ts, ty + ts), F.array(tx, ty + ts),
                   F.array(tx, ty))
    tiles_df = t.select("tile_id", poly.alias("polygon"))

    # 200 points at known positions strictly inside tiles (never on an
    # edge): tile (i, j) at its center
    pts = [("u", k, (k % side) * ts + ts / 2, (k * 7 % side) * ts + ts / 2)
           for k in range(200)]
    pdf = spark.createDataFrame(pts, "url string, pid int, x double, y double")
    got = (assign_tiles(spark, pdf, tiles_df, cfg)
           .select("pid", "tile_id").toPandas()
           .sort_values("pid").reset_index(drop=True))
    assert len(got) == 200
    for r in got.itertuples():
        i, j = r.pid % side, (r.pid * 7) % side
        assert r.tile_id == j * side + i, (r.pid, r.tile_id)


def test_rasterize_counts(spark, points_df, cfg):
    got = rasterize_points(points_df, cfg.cell_size).toPandas()
    pts = points_df.select("x", "y").toPandas()
    cells = xy_to_cell(pts.x.to_numpy(), pts.y.to_numpy(), cfg.cell_size)
    want = pd.Series(cells).value_counts()
    assert got.n_points.sum() == len(pts)
    assert len(got) == want.size
    gm = dict(zip(got.cell, got.n_points))
    for cell, n in want.items():
        assert gm[cell] == n
