"""Checkpoint / resume with per-partition lineage + metrics.

The reference's resumability is a pickle checkpoint that skips the whole
ETL (/root/reference/mapmatching/osmnet/build_graph.py:35-36,
utils/serialization.py:7-32). At cluster scale that becomes stage tables:
every pipeline stage writes its output as parquet next to a `_lineage`
table recording (stage, bucket/partition, input fingerprint, rows,
wall_ms, finished_at). A rerun:

* stage level  — if the stage directory exists and its fingerprint matches,
  the stage is read back instead of recomputed;
* bucket level — for trajectory-keyed stages the output is written
  partitioned by a stable url-hash bucket; a rerun anti-joins the already-
  finished buckets from the lineage table and computes only the missing
  ones, then appends (exactly-once per bucket: each bucket directory is
  written once and the lineage row is the commit record).

This is driver-side orchestration of plain DataFrame jobs — no custom
Catalyst machinery, matching SURVEY.md §4's "resume-from-checkpoint" row.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageRunner:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- helpers
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.meta.json")

    def _read_meta(self, name: str) -> dict | None:
        try:
            with open(self._meta_path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _write_meta(self, name: str, meta: dict) -> None:
        with open(self._meta_path(name), "w") as f:
            json.dump(meta, f, indent=1)

    def lineage(self, name: str) -> DataFrame | None:
        p = os.path.join(self._dir(name), "_lineage")
        return self.spark.read.parquet(p) if os.path.exists(p) else None

    # ------------------------------------------------------------- stages
    def stage(self, name: str, fingerprint: str, build) -> DataFrame:
        """Whole-stage checkpoint: reuse the stage table when the input
        fingerprint matches, else compute + persist + record lineage."""
        meta = self._read_meta(name)
        data_dir = os.path.join(self._dir(name), "data")
        if meta and meta.get("fingerprint") == fingerprint and os.path.exists(data_dir):
            return self.spark.read.parquet(data_dir)

        t0 = time.perf_counter()
        df = build()
        df.write.mode("overwrite").parquet(data_dir)
        wall_ms = int((time.perf_counter() - t0) * 1000)

        out = self.spark.read.parquet(data_dir)
        lin = (out.groupBy(F.spark_partition_id().alias("partition_id"))
               .agg(F.count("*").alias("rows"))
               .withColumn("stage", F.lit(name))
               .withColumn("fingerprint", F.lit(fingerprint))
               .withColumn("wall_ms", F.lit(wall_ms))
               .withColumn("finished_at", F.current_timestamp()))
        lin.write.mode("overwrite").parquet(os.path.join(self._dir(name), "_lineage"))
        self._write_meta(name, {"fingerprint": fingerprint, "wall_ms": wall_ms,
                                "rows": out.count()})
        return out

    def bucketed_stage(self, name: str, fingerprint: str, inputs: DataFrame,
                       build, key: str = "url", n_buckets: int = 16) -> DataFrame:
        """Bucket-level resume, exactly-once per bucket.

        The commit protocol (crash-safe at every boundary):
        1. todo = buckets with no lineage row (lineage is the commit log).
        2. Bucket data is written with DYNAMIC PARTITION OVERWRITE on
           `bucket` — a rerun after a crash REPLACES any orphan partition
           from the crashed attempt instead of appending a second copy.
        3. The lineage rows are appended only after the data write
           returns; a crash between (2) and (3) leaves data-without-
           lineage, which step 1 classifies as todo and step 2 overwrites.

        `build(inputs_subset) -> DataFrame` must emit rows carrying `key`.
        Timing note: buckets in one batch share a measured `batch_wall_ms`
        (they execute as one Spark job); `batch_id` groups them.
        """
        data_dir = os.path.join(self._dir(name), "data")
        lin_dir = os.path.join(self._dir(name), "_lineage")
        meta = self._read_meta(name)
        bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")

        done: set[int] = set()
        if meta and meta.get("fingerprint") == fingerprint and os.path.exists(lin_dir):
            done = {r.bucket for r in self.spark.read.parquet(lin_dir)
                    .select("bucket").distinct().collect()}
        elif os.path.exists(self._dir(name)):
            # fingerprint changed -> invalidate
            import shutil
            shutil.rmtree(self._dir(name))

        todo = [b for b in range(n_buckets) if b not in done]
        if todo:
            # reconcile: drop orphan partitions (data but no lineage row)
            # left by a crashed attempt — covers the zero-rows-on-recompute
            # edge dynamic overwrite alone would miss
            import shutil
            for b in todo:
                orphan = os.path.join(data_dir, f"bucket={b}")
                if os.path.exists(orphan):
                    shutil.rmtree(orphan)
            subset = inputs.withColumn("_b", bucket).filter(F.col("_b").isin(todo)).drop("_b")
            t0 = time.perf_counter()
            out = build(subset).withColumn("bucket", bucket)
            (out.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("bucket").parquet(data_dir))
            wall_ms = int((time.perf_counter() - t0) * 1000)
            counts = {}
            if _has_parquet(data_dir):
                counts = {r.bucket: r.rows for r in
                          self.spark.read.parquet(data_dir)
                          .filter(F.col("bucket").isin(todo))
                          .groupBy("bucket").agg(F.count("*").alias("rows")).collect()}
            batch_id = f"{name}:{len(done)}:{len(todo)}"
            lin = (self.spark.createDataFrame(
                [(int(b), int(counts.get(b, 0))) for b in todo],
                "bucket int, rows long")
                .withColumn("stage", F.lit(name))
                .withColumn("fingerprint", F.lit(fingerprint))
                .withColumn("batch_id", F.lit(batch_id))
                .withColumn("batch_wall_ms", F.lit(wall_ms))
                .withColumn("finished_at", F.current_timestamp()))
            self._commit_lineage(lin, lin_dir)
            self._write_meta(name, {"fingerprint": fingerprint,
                                    "n_buckets": n_buckets})
        return self.spark.read.parquet(data_dir).drop("bucket") \
            if _has_parquet(data_dir) else build(inputs.limit(0))

    def _commit_lineage(self, lin: DataFrame, lin_dir: str) -> None:
        """The lineage append IS the per-bucket commit record (separated
        out so crash-injection tests can fail exactly at this boundary)."""
        lin.write.mode("append").parquet(lin_dir)


def _has_parquet(d: str) -> bool:
    """True if the directory holds at least one committed parquet file
    (an all-zero-rows stage leaves a dir Spark cannot infer schema from)."""
    for root, _dirs, files in os.walk(d):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False
