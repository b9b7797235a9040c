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


def cosine_neardup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold)
    — the exactness baseline of the near-dup family (quadratic; use after
    LSH/IVF blocking at scale, exactly like ngram_jaccard_pairs vs the
    MinHash path)."""
    a = embeddings.select(F.col(id_col).alias("a_id"),
                          F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("b_id"),
                          F.col(vec_col).alias("vb"))
    return (a.join(b, F.col("a_id") < F.col("b_id"))
            .withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= threshold)
            .select("a_id", "b_id", "cosine"))


def _kmeans_lite(sample: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Driver-side Lloyd iterations on a sample — centroids for IVF."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=k, replace=False)].astype(np.float64)
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            m = a == j
            if m.any():
                cent[j] = sample[m].mean(0)
    return cent


def ivf_assign(spark: SparkSession, embeddings: DataFrame, centroids: np.ndarray,
               n_probe: int = 1, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, centroid) rows; n_probe>1 emits that many nearest lists
    (query-side multi-probe)."""
    import pandas as pd
    bc = spark.sparkContext.broadcast(centroids)

    def op(batches):
        cent = bc.value
        for pdf in batches:
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            near = np.argsort(d, axis=1)[:, :n_probe]
            ids = np.repeat(pdf[id_col].to_numpy(), n_probe)
            yield pd.DataFrame({id_col: ids, "centroid": near.ravel()})

    return embeddings.select(id_col, vec_col).mapInPandas(
        op, schema=f"{id_col} long, centroid int")


def ivf_topk(spark: SparkSession, embeddings: DataFrame, queries: DataFrame,
             dim: int, k: int = 10, n_centroids: int = 16, n_probe: int = 4,
             iters: int = 5, seed: int = 42, sample_n: int = 2000,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k: kmeans-lite centroids on a driver sample,
    corpus partitioned by nearest centroid (one list each), queries probe
    their n_probe nearest lists, exact cosine re-rank inside. The standard
    scale path next to LSH; coarse quantizer quality is bounded by the
    sample, which is the usual IVF tradeoff."""
    # deterministic sample: bare limit() is partition-order-dependent on a
    # real cluster, so centroids (and recall) would vary run to run
    sample = np.vstack(embeddings.select(id_col, vec_col)
                       .orderBy(id_col).limit(sample_n)
                       .toPandas()[vec_col].to_numpy()).astype(np.float64)
    cent = _kmeans_lite(sample, n_centroids, iters, seed)

    c_assign = ivf_assign(spark, embeddings, cent, 1, id_col, vec_col)
    q_assign = ivf_assign(spark, queries, cent, n_probe, id_col, vec_col)

    c = embeddings.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")) \
        .join(c_assign.withColumnRenamed(id_col, "c_id"), "c_id")
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")) \
        .join(q_assign.withColumnRenamed(id_col, "q_id"), "q_id")

    cand = (c.join(F.broadcast(q), "centroid")
            .filter(F.col("q_id") != F.col("c_id"))
            .dropDuplicates(["q_id", "c_id"]))
    scored = cand.withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec")))
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
