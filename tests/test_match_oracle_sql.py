"""Pins for the flagship DuckDB oracle (oracle/match_sql.py).

The oracle is an independent re-derivation of the whole match pipeline;
these tests pin the two places where it encodes ENGINE-derived closed
forms, so a change to the engine breaks a test here instead of silently
breaking the driver's correctness gate:

1. the grid shortest-path tie rule ("horizontal leg on the lower row",
   a consequence of the (cost, node) heap order) vs graph/dijkstra.py
   for every node pair;
2. full engine-vs-oracle equality of both flagship gates at sf0.001.
"""

import duckdb
import pytest

from st_mapmatching_spark.graph.dijkstra import (build_adjacency,
                                                 shortest_paths_to_targets)
from st_mapmatching_spark.oracle.match_sql import (
    match_grid_classic_oracle_sql, match_grid_oracle_sql)
from st_mapmatching_spark.sources import derived as D

SF = "/root/testdata/sf0.001"


def _closed_form_sp(o: int, d: int, g: int = 9) -> list[int]:
    """The oracle's `_splist` rule in Python (same arithmetic)."""
    i0, j0, i1, j1 = o % g, o // g, d % g, d // g
    dx, dy = i1 - i0, j1 - j0
    out: list[int] = []
    if dy >= 0:
        if dx > 0:
            out += [j0 * 8 + i0 + s for s in range(dx)]
        elif dx < 0:
            out += [144 + j0 * 8 + i0 - s - 1 for s in range(-dx)]
        out += [72 + i1 * 8 + j0 + s for s in range(dy)]
    else:
        out += [216 + i0 * 8 + j0 - s - 1 for s in range(-dy)]
        if dx > 0:
            out += [j1 * 8 + i0 + s for s in range(dx)]
        elif dx < 0:
            out += [144 + j1 * 8 + i0 - s - 1 for s in range(-dx)]
    return out


def test_sp_closed_form_matches_dijkstra_all_pairs():
    net = D.grid_network()
    adj = build_adjacency(net.edges)
    for o in range(D.G * D.G):
        rows = shortest_paths_to_targets(adj, o, list(range(D.G * D.G)), 10000.0)
        for r in rows:
            want = [int(e) for e in (r["epath"] or [])]
            assert _closed_form_sp(o, int(r["d_node"])) == want, (o, r["d_node"])


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return con


def _engine_df(spark, fn):
    return (fn(spark, SF).toPandas()
            .sort_values("url").reset_index(drop=True))


def test_match_grid_oracle_equals_engine(spark, duck):
    import __spark_entry__ as E
    got = duck.execute(match_grid_oracle_sql()).df() \
        .sort_values("url").reset_index(drop=True)
    want = _engine_df(spark, E.q_match_grid)
    assert list(got.url) == list(want.url)
    for c in ["status", "epath_s", "step_0_r", "norm_prob_r"]:
        assert list(got[c]) == list(want[c]), c


def test_match_grid_classic_oracle_equals_engine(spark, duck):
    import __spark_entry__ as E
    got = duck.execute(match_grid_classic_oracle_sql()).df() \
        .sort_values("url").reset_index(drop=True)
    want = _engine_df(spark, E.q_match_grid_classic)
    assert list(got.url) == list(want.url)
    for c in ["status", "epath_s", "norm_prob_r"]:
        assert list(got[c]) == list(want[c]), c
