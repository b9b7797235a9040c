"""SparkSession factory with the engine's standard knobs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cores: int | str = "*", app: str = "st_mapmatching_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """local[N] session tuned for this engine.

    On a real cluster the same configs apply minus master; AQE stays on so
    skewed cell joins re-plan at runtime (north_rule: explicit skew
    handling), and shuffle partitions default to the core count locally
    instead of Spark's 200.
    """
    if shuffle_partitions is None:
        env = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        n = os.cpu_count() or 8 if cores == "*" else int(cores)
        # 4x cores, not cores: a shuffle partition must also fit the
        # per-task sort buffer — at 8 cores / 8 partitions a 38M-row pair
        # table sorts ~5M wide rows per task and spills (measured cliff on
        # the staged-path bench at high replication). AQE coalesces the
        # excess away when partitions come out small, so the only cost of
        # over-partitioning is scheduler overhead.
        shuffle_partitions = int(env) if env else max(16, n * 4)
    return (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's coalescing floor is byte-based (default 1 MB), but this
        # engine's hot stages are Python/Arrow kernels whose cost-per-byte
        # is ~100x a JVM op: at bench scale (sf0.1, ~3 MB shuffles) the
        # default floor collapses the candidate refine + top-k windows
        # onto 2-3 of 32 cores (measured: geo_knn_edges 2.4 s -> 1.6 s
        # with a 64 KB floor). parallelismFirst is already on, so this
        # only lowers the coalescing floor; large shuffles still coalesce
        # toward the advisory target exactly as before.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # UI off by default (saves ~1 s startup + a port); profiling tools
        # (scripts/profile_leg.py) flip it on to read stage metrics via REST
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # local mode funnels every shuffle through one host disk — that
        # shared bottleneck caps core-scaling and does not exist on a real
        # cluster (per-executor disks). tmpfs restores the cluster-like
        # behavior for the local[8]-vs-local[32] scaling proxy.
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .getOrCreate()
    )
