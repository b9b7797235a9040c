"""Region-sharded one-pass matcher (operators/sharded.py) vs the staged
relational path: identical rows on a multi-region fixture including
guard-violating trajectories (fallback), an off-network trajectory
(status 3), and a single-point page."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from st_mapmatching_spark.config import M_PER_DEG, MatchConfig
from st_mapmatching_spark.operators.matching import match_pages
from st_mapmatching_spark.operators.sharded import match_pages_sharded
from st_mapmatching_spark.sources import derived as D

CFG = MatchConfig(lon0=D.LON0, lat0=D.LAT0)
K = math.cos(math.radians(D.LAT0))


def _page(url, pts):
    lines = []
    for i, (x, y) in enumerate(pts):
        lon = x / (M_PER_DEG * K) + D.LON0
        lat = y / M_PER_DEG + D.LAT0
        lines.append(f"GEO {i} {lon:.7f} {lat:.7f} {1700000000 + i}")
    return (url, "\n".join(lines))


@pytest.fixture(scope="module")
def bignet():
    # 40x40 = 1,600 nodes (span 9.75 km), metric grid, eids global
    return D.big_grid_network(CFG, g=40)


@pytest.fixture(scope="module")
def fixture_pages(spark):
    rows = []
    # t1: row-following inside region (0,0)'s tile [0, 3000)^2
    rows.append(_page("t1", [(100.0 + 40 * i, 625.0 + ((i * 31) % 41 - 20))
                             for i in range(30)]))
    # t2: t1's shape shifted into the negative-quadrant region (the grid
    # is uniform, so it must match the same way t1 does)
    rows.append(_page("t2", [(100.0 - 5000.0 + 40 * i,
                              625.0 - 4500.0 + ((i * 31) % 41 - 20))
                             for i in range(30)]))
    # t3: guard-A violator — spans ~7 km, far beyond core (tile + 1.5 km pad)
    rows.append(_page("t3", [(-3500.0 + 70 * i, 125.0) for i in range(100)]))
    # t4: far off-network (region exists, zero edges) -> status 3
    rows.append(_page("t4", [(60000.0 + 10 * i, 60000.0) for i in range(5)]))
    # t5: single point -> status 2
    rows.append(_page("t5", [(150.0, 630.0)]))
    # t6: no GEO lines at all -> status 3
    rows.append(("t6", "no coordinates here"))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))


def test_sharded_matches_staged(spark, bignet, fixture_pages):
    from dataclasses import replace
    cfg = replace(CFG, sp_broadcast_max_rows=0)   # force the staged path
    want = (match_pages(spark, fixture_pages, bignet, cfg)
            .toPandas().set_index("url").sort_index())
    got = (match_pages_sharded(spark, fixture_pages, bignet, cfg,
                               region_m=3000.0, cover_pad=1500.0,
                               sp_pair_max=1300.0)
           .toPandas().set_index("url").sort_index())
    assert list(got.index) == list(want.index)
    assert (got.status == want.status).all(), \
        got.status.compare(want.status)
    for url in want.index:
        g_ep = got.loc[url].epath
        w_ep = want.loc[url].epath
        g_ep = None if g_ep is None else [int(e) for e in g_ep]
        w_ep = None if w_ep is None else [int(e) for e in w_ep]
        assert g_ep == w_ep, f"{url}: {g_ep} != {w_ep}"
        for c in ("step_0", "step_n", "dist", "avg_speed", "prob",
                  "norm_prob", "dist_prob", "trans_prob", "dir_prob"):
            gv, wv = float(got.loc[url][c]), float(want.loc[url][c])
            if np.isnan(wv):
                assert np.isnan(gv), f"{url}:{c}"
            else:
                assert gv == pytest.approx(wv, rel=1e-12, abs=1e-12), f"{url}:{c}"
    # sanity on the fixture's intent
    assert int(want.loc["t1"].status) == 0
    assert int(want.loc["t2"].status) == 0
    assert int(want.loc["t3"].status) == 0     # matched via fallback
    assert int(want.loc["t4"].status) == 3
    assert int(want.loc["t5"].status) == 2
    assert int(want.loc["t6"].status) == 3


def test_sharded_fallback_routes_guard_violators(spark, bignet, fixture_pages):
    """The guard-A violator must be detected (not wrongly matched against
    a partial regional payload): with a tiny cover_pad even t1/t2 fall
    back, and results still equal the staged path."""
    from dataclasses import replace
    cfg = replace(CFG, sp_broadcast_max_rows=0)
    got = (match_pages_sharded(spark, fixture_pages, bignet, cfg,
                               region_m=3000.0, cover_pad=100.0,
                               sp_pair_max=1300.0)
           .toPandas().set_index("url").sort_index())
    want = (match_pages(spark, fixture_pages, bignet, cfg)
            .toPandas().set_index("url").sort_index())
    assert (got.status == want.status).all()
