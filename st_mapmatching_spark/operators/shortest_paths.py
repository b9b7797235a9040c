"""Demand-driven shortest-path table.

The reference memoizes A* results per query
(/root/reference/mapmatching/graph/astar.py:70-72,113,119 — "2 orders of
magnitude" speedup, changelog.md:684). Distributed, that memo becomes a
pure table: collect the DISTINCT (o_node, d_node) demands from the
transition-pair table, partition by origin, run one bounded Dijkstra per
origin against the broadcast adjacency, and join the result back. Turning
a stateful cache into a join also makes the stage resumable and reusable
across runs (persist it next to the network).

Scale: demands ~= |points| * top_k^2 before distinct; after distinct it is
bounded by the network's locality (origins near the trajectory corridor).
For planet-scale networks, partition the adjacency by region and route
origins to their region's partition instead of broadcasting everything.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..config import MatchConfig
from ..graph.dijkstra import shortest_paths_to_targets
from ..graph.network import Network

SP_SCHEMA = ("o_node long, d_node long, cost double, epath array<long>, "
             "path_speed double, pcx double, pcy double, pw double, pn int")
_SP_COLS = ["o_node", "d_node", "cost", "epath", "path_speed", "pcx", "pcy", "pw", "pn"]


def shortest_path_table(spark: SparkSession, demands: DataFrame, net: Network,
                        cfg: MatchConfig) -> DataFrame:
    """demands(o_node, d_node) -> sp(o_node, d_node, cost, epath,
    path_speed, pcx, pcy, pw, pn).

    Missing/unreachable pairs get cost=inf (HMM break semantics, matching
    the reference's status-2 search, astar.py:111-114); o==d pairs get
    cost=0 with an empty path (astar.py:67-68). pcx/pcy/pw/pn are the
    path's additive direction statistics (kernels.dir_stats)."""
    sc = spark.sparkContext
    bc = sc.broadcast((net.adj, net.edge_speed, net.edge_dist,
                       net.dir_stats().edge_totals()))
    max_dist = cfg.max_dist

    def per_origin(pdf: pd.DataFrame) -> pd.DataFrame:
        adj, espeed, edist, etot = bc.value
        o = int(pdf.o_node.iloc[0])
        rows = shortest_paths_to_targets(adj, o, pdf.d_node.unique().tolist(),
                                         max_dist, espeed, edist, etot)
        return pd.DataFrame(rows, columns=_SP_COLS)

    return (demands.dropDuplicates(["o_node", "d_node"])
            .groupBy("o_node").applyInPandas(per_origin, schema=SP_SCHEMA))
