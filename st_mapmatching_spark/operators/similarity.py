"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k; dot products as built-in
  zip_with/aggregate expressions (JVM-side), top-k via window. The
  correctness baseline.
* lsh_topk — random-hyperplane LSH bucketing as the scale path: signature
  via one Arrow matmul pass, candidate generation via bucket equi-join,
  exact cosine re-rank inside buckets. Recall is measured against the
  brute-force baseline in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of each query against the corpus.
    queries is expected small -> broadcast; corpus scan is one pass."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = embeddings.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    scored = (c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
              .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec"))))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "c_id", "cosine", "rank"))


def _plane_matrix(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, n_planes))


def lsh_signatures(spark: SparkSession, embeddings: DataFrame, dim: int,
                   n_planes: int = 16, seed: int = 42,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane signature: sign bits packed into one long."""
    planes = _plane_matrix(dim, n_planes, seed)
    bc = spark.sparkContext.broadcast(planes)

    def op(batches):
        p = bc.value
        weights = (1 << np.arange(p.shape[1], dtype=np.uint64))
        for pdf in batches:
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (m @ p) >= 0
            sig = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "sig": sig})

    return embeddings.select(id_col, vec_col).mapInPandas(op, schema=f"{id_col} long, sig long")


def lsh_topk(spark: SparkSession, embeddings: DataFrame, queries: DataFrame, dim: int,
             k: int = 10, n_planes: int = 16, n_bands: int = 4, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: multi-band signature match -> exact cosine
    re-rank inside candidate buckets. Bands of n_planes/n_bands bits."""
    bits_per = n_planes // n_bands

    def banded(df, prefix):
        sig = lsh_signatures(spark, df, dim, n_planes, seed, id_col, vec_col)
        out = df.select(F.col(id_col).alias(f"{prefix}_id"),
                        F.col(vec_col).alias(f"{prefix}_vec")) \
                .join(sig.withColumnRenamed(id_col, f"{prefix}_id"), f"{prefix}_id")
        mask = (1 << bits_per) - 1
        return out.select(
            f"{prefix}_id", f"{prefix}_vec",
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"),
                         F.shiftright("sig", b * bits_per).bitwiseAND(F.lit(mask)).alias("bv"))
                for b in range(n_bands)])).alias("bk")) \
            .select(f"{prefix}_id", f"{prefix}_vec",
                    F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))

    qb = banded(queries, "q")
    cb = banded(embeddings, "c")
    cand = (cb.join(F.broadcast(qb), ["band", "bv"])
            .filter(F.col("q_id") != F.col("c_id"))
            .dropDuplicates(["q_id", "c_id"]))
    scored = cand.withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "c_id", "cosine", "rank"))
