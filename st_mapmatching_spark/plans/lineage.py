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
        """Bucket-level resume: compute only the url-hash buckets whose
        lineage rows are missing; append each finished bucket exactly once.

        `build(inputs_subset) -> DataFrame` must emit rows carrying `key`.
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
            subset = inputs.withColumn("_b", bucket).filter(F.col("_b").isin(todo)).drop("_b")
            t0 = time.perf_counter()
            out = build(subset).withColumn("bucket", bucket)
            out.write.mode("append").partitionBy("bucket").parquet(data_dir)
            wall_ms = int((time.perf_counter() - t0) * 1000)
            new = self.spark.read.parquet(data_dir) \
                .filter(F.col("bucket").isin(todo)) \
                .groupBy("bucket").agg(F.count("*").alias("rows")) \
                .withColumn("stage", F.lit(name)) \
                .withColumn("fingerprint", F.lit(fingerprint)) \
                .withColumn("wall_ms", F.lit(wall_ms)) \
                .withColumn("finished_at", F.current_timestamp())
            # buckets with zero output rows still need a commit record
            zero = [b for b in todo]
            present = {r.bucket for r in new.select("bucket").distinct().collect()}
            missing = [b for b in zero if b not in present]
            if missing:
                extra = self.spark.createDataFrame(
                    [(b, 0) for b in missing], "bucket int, rows long") \
                    .withColumn("stage", F.lit(name)) \
                    .withColumn("fingerprint", F.lit(fingerprint)) \
                    .withColumn("wall_ms", F.lit(wall_ms)) \
                    .withColumn("finished_at", F.current_timestamp())
                new = new.unionByName(extra)
            new.write.mode("append").parquet(lin_dir)
            self._write_meta(name, {"fingerprint": fingerprint,
                                    "n_buckets": n_buckets})
        return self.spark.read.parquet(data_dir).drop("bucket") \
            if os.path.exists(data_dir) else build(inputs.limit(0))
