"""Combine 1-in/1-out chains (reference osmnet/combine_edges.py:23-84 +
utils/interval_helper.py:2-51) — hand-computed fixture oracle."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from st_mapmatching_spark.operators.graph_build import (aux_nodes,
                                                        combine_chain_edges,
                                                        node_degrees)


@pytest.fixture(scope="module")
def edges_df(spark):
    # way 1: chain 10->11->12->13->14->15 (orders 0..4)
    # way 2: branch 90->13 makes node 13 indegree-2 (chain must break there)
    rows = [
        # way_id, dir, order, eid, src, dst, dist
        (1, 1, 0, 100, 10, 11, 5),
        (1, 1, 1, 101, 11, 12, 6),
        (1, 1, 2, 102, 12, 13, 7),
        (1, 1, 3, 103, 13, 14, 8),
        (1, 1, 4, 104, 14, 15, 9),
        (2, 1, 0, 200, 90, 13, 3),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["way_id", "dir", "order", "eid", "src",
                                    "dst", "dist"]))


def test_degrees_and_aux(spark, edges_df):
    deg = node_degrees(edges_df).toPandas().set_index("nid")
    assert deg.loc[13].indeg == 2 and deg.loc[13].outdeg == 1
    assert deg.loc[11].indeg == 1 and deg.loc[11].outdeg == 1
    aux = set(aux_nodes(edges_df).toPandas().nid)
    assert aux == {11, 12, 14}  # 13 has indeg 2; 10/90 have indeg 0; 15 outdeg 0


def test_combine_full_chain_with_junction(spark, edges_df):
    out = combine_chain_edges(edges_df).toPandas().sort_values(["way_id", "order"])
    w1 = out[out.way_id == 1]
    # islands: [0,1,2] (srcs 11,12 aux) | [3,4] (13 breaks, 14 aux)
    assert w1.order.tolist() == [0, 3]
    first = w1.iloc[0]
    assert (first.eid, first.src, first.dst, first.dist, first.n_merged) == (100, 10, 13, 18, 3)
    assert [int(x) for x in first.waypoints] == [10, 11, 12, 13]
    second = w1.iloc[1]
    assert (second.eid, second.src, second.dst, second.dist, second.n_merged) == (103, 13, 15, 17, 2)
    assert [int(x) for x in second.waypoints] == [13, 14, 15]
    w2 = out[out.way_id == 2].iloc[0]
    assert (w2.eid, w2.src, w2.dst, w2.n_merged) == (200, 90, 13, 1)
    assert [int(x) for x in w2.waypoints] == [90, 13]


def test_combine_respects_exclude_list(spark, edges_df):
    excl = spark.createDataFrame(pd.DataFrame({"nid": [11]}))
    out = combine_chain_edges(edges_df, exclude=excl).toPandas()
    w1 = out[out.way_id == 1].sort_values("order")
    # node 11 excluded -> break between orders 0 and 1: islands [0], [1,2], [3,4]
    assert w1.order.tolist() == [0, 1, 3]
    mid = w1.iloc[1]
    assert (mid.eid, mid.src, mid.dst, mid.dist, mid.n_merged) == (101, 11, 13, 13, 2)


def test_combine_preserves_totals(spark, edges_df):
    out = combine_chain_edges(edges_df)
    tot = out.agg(F.sum("dist")).collect()[0][0]
    orig = edges_df.agg(F.sum("dist")).collect()[0][0]
    assert tot == orig


def test_bidirectional_dijkstra_matches_single_direction():
    """Bi-directional search (reference bi_astar.py twin, with the optimal
    termination rule) returns the same costs as bounded Dijkstra on every
    grid pair, and its epaths are connected with summed length == cost."""
    import math
    import numpy as np
    from st_mapmatching_spark.graph.dijkstra import (
        build_adjacency, build_adjacency_reverse, bidirectional_dijkstra,
        shortest_paths_to_targets)
    from st_mapmatching_spark.sources import derived as D

    net = D.grid_network()
    adj = build_adjacency(net.edges)
    adj_r = build_adjacency_reverse(net.edges)
    esrc = dict(zip(net.edges.eid.astype(int), net.edges.src.astype(int)))
    edst = dict(zip(net.edges.eid.astype(int), net.edges.dst.astype(int)))
    edist = dict(zip(net.edges.eid.astype(int), net.edges.dist.astype(float)))

    rng = np.random.default_rng(7)
    origins = rng.choice(81, size=12, replace=False)
    for o in origins:
        rows = shortest_paths_to_targets(adj, int(o), list(range(81)), 10000.0)
        want = {int(r["d_node"]): r["cost"] for r in rows}
        for d in range(81):
            res = bidirectional_dijkstra(adj, adj_r, int(o), d, 10000.0)
            assert res["cost"] == want[d], (o, d)
            if res["epath"]:
                ep = res["epath"]
                assert esrc[ep[0]] == int(o) and edst[ep[-1]] == d
                for a, b in zip(ep, ep[1:]):
                    assert edst[a] == esrc[b]
                assert math.isclose(sum(edist[e] for e in ep), res["cost"])


def test_bidirectional_dijkstra_real_network():
    """Cost parity on the reference's real LXD network (486 edges)."""
    import os
    import numpy as np
    import pytest as _pytest
    ckpt = "/root/reference/data/network/LXD_graph.ckpt"
    if not os.path.exists(ckpt):
        _pytest.skip("reference data not present")
    from st_mapmatching_spark.graph.dijkstra import (
        build_adjacency, build_adjacency_reverse, bidirectional_dijkstra,
        shortest_paths_to_targets)
    from st_mapmatching_spark.sources.ckpt import reference_network

    net, _ = reference_network(ckpt)
    adj = build_adjacency(net.edges)
    adj_r = build_adjacency_reverse(net.edges)
    nids = sorted({int(n) for n in net.edges.src} | {int(n) for n in net.edges.dst})
    rng = np.random.default_rng(11)
    for o in rng.choice(len(nids), size=6, replace=False):
        o = nids[int(o)]
        targets = [nids[int(i)] for i in rng.choice(len(nids), size=25, replace=False)]
        rows = shortest_paths_to_targets(adj, o, targets, 10000.0)
        for r in rows:
            res = bidirectional_dijkstra(adj, adj_r, o, int(r["d_node"]), 10000.0)
            if r["cost"] == float("inf"):
                assert res["cost"] == float("inf")
            else:
                # the two halves sum edge costs in different orders ->
                # last-ulp differences on real-valued networks
                assert abs(res["cost"] - r["cost"]) <= 1e-9 * max(1.0, r["cost"])
