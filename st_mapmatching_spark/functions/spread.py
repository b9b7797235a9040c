"""Scale-adaptive input spreading.

A small local corpus arrives from parquet in 1-2 scan partitions, and any
expensive narrow stage above it (Arrow hash passes, interpreted
higher-order folds, broadcast-join probes whose OUTPUT is large) then
runs on 1-2 cores regardless of cluster size — measured as the entire
remaining cost of dedup_simhash at sf1.0 (r7). At 100 TB the same input
arrives in thousands of partitions and a repartition would shuffle heavy
payload bytes for nothing (guide §2.3: don't move bytes you don't have
to). So: spread ONLY when the plan's partition count is below the
session's parallelism — a no-op at scale, a trivial shuffle locally."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition iff the frame's planned partition count is
    below ``min_parts`` (default: the context's defaultParallelism).
    Resolving the partition count compiles the plan but runs no job.
    Row-wise consumers are unaffected by row placement, so results are
    unchanged by construction."""
    sess = df.sparkSession
    if min_parts is None:
        min_parts = sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df
