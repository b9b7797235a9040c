"""Network-build operators: combine 1-in/1-out chains (graph
simplification) — the distributed form of the reference's
pipeline_combine_links (/root/reference/mapmatching/osmnet/
combine_edges.py:23-84) and its interval-merge helper
(/root/reference/mapmatching/utils/interval_helper.py:2-51).

Reference semantics, re-expressed relationally:
* aux node = indegree 1 AND outdegree 1 (combine_edges.py:8-21), minus an
  optional exclude set (traffic signals etc.);
* within one (way_id, dir), edges whose src is an aux node merge with
  their predecessor; the reference builds [order-1, order] intervals and
  merges touching ones (interval_helper.merge_intervals) — equivalently,
  maximal runs of consecutive orders ("islands");
* the merged edge keeps the FIRST edge's identity (eid, src, order), takes
  the LAST edge's dst, sums dist, and records the waypoint node chain
  (combine_links, combine_edges.py:23-56).

The whole pipeline is two aggregations + one window + one aggregation —
no driver-side loop over ways (the reference parallelizes per way with a
process pool; Catalyst's hash aggregate does the same thing shuffle-wise).
Divergence (documented): singleton edges get waypoints [src, dst] rather
than the reference's NaN — a uniform superset of the same information.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def node_degrees(edges: DataFrame) -> DataFrame:
    """(nid, indeg, outdeg) over the full edge table
    (combine_edges.py:8-12)."""
    indeg = edges.groupBy(F.col("dst").alias("nid")).agg(F.count("*").alias("indeg"))
    outdeg = edges.groupBy(F.col("src").alias("nid")).agg(F.count("*").alias("outdeg"))
    return (indeg.join(outdeg, "nid", "full")
            .select("nid", F.coalesce("indeg", F.lit(0)).alias("indeg"),
                    F.coalesce("outdeg", F.lit(0)).alias("outdeg")))


def aux_nodes(edges: DataFrame, exclude: DataFrame | None = None) -> DataFrame:
    """Degree-(1,1) pass-through nodes (combine_edges.py:14-21).
    ``exclude`` is an optional (nid) DataFrame (e.g. traffic signals)."""
    aux = (node_degrees(edges)
           .filter((F.col("indeg") == 1) & (F.col("outdeg") == 1))
           .select("nid"))
    if exclude is not None:
        aux = aux.join(exclude.select("nid"), "nid", "left_anti")
    return aux


def combine_chain_edges(edges: DataFrame,
                        exclude: DataFrame | None = None) -> DataFrame:
    """edges(way_id, dir, order, eid, src, dst, dist) -> combined edges
    (way_id, dir, eid, src, dst, order, dist, n_merged, waypoints).

    An edge merges into its predecessor iff its src is an aux node AND the
    predecessor is order-consecutive within the same (way_id, dir) — the
    island formulation of the reference's merged [order-1, order]
    intervals."""
    aux = aux_nodes(edges, exclude).withColumnRenamed("nid", "src") \
        .withColumn("_aux", F.lit(True))
    e = edges.join(aux, "src", "left")

    w = Window.partitionBy("way_id", "dir").orderBy("order")
    prev_order = F.lag("order").over(w)
    mergeable = (F.col("_aux").isNotNull() & (F.col("order") > 0)
                 & (prev_order == F.col("order") - 1))
    grp = F.sum(F.when(mergeable, F.lit(0)).otherwise(F.lit(1))).over(w)

    agg = (e.withColumn("_grp", grp)
           .groupBy("way_id", "dir", "_grp")
           .agg(F.min("order").alias("order"),
                F.min_by("eid", "order").alias("eid"),
                F.min_by("src", "order").alias("src"),
                F.max_by("dst", "order").alias("dst"),
                F.sum("dist").alias("dist"),
                F.count("*").alias("n_merged"),
                F.array_sort(F.collect_list(F.struct("order", F.col("src").alias("s")))).alias("_ss"),
                F.max_by("dst", "order").alias("_last_dst")))
    waypoints = F.concat(F.transform("_ss", lambda x: x.s), F.array(F.col("_last_dst")))
    return (agg.withColumn("waypoints", waypoints)
            .select("way_id", "dir", "eid", "src", "dst", "order", "dist",
                    "n_merged", "waypoints"))
