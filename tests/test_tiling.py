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
