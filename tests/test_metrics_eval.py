"""Eval operators: trajectory-similarity metrics + corpus precision, and
the IVF ANN recall check."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from st_mapmatching_spark.kernels import metrics as M
from st_mapmatching_spark.operators.metrics import eval_precision, eval_similarity


def test_metric_kernels_basics():
    a = np.array([[0.0, 0.0], [10.0, 0.0], [20.0, 0.0]])
    assert M.lcss(a, a, eps=1.0) == 1.0
    assert M.edr(a, a, eps=1.0) == 0.0
    b = a + np.array([0.0, 100.0])
    assert M.lcss(a, b, eps=1.0) == 0.0
    assert M.erp(a, a, np.zeros(2)) == 0.0
    r = M.resample_polyline(np.array([[0.0, 0.0], [10.0, 0.0]]), 2.0)
    assert len(r) == 6 and r[-1].tolist() == [10.0, 0.0]


@pytest.fixture(scope="module")
def matched_and_points(spark, pages, net, cfg):
    from st_mapmatching_spark.operators.candidates import extract_trajs, simplify_trajs
    from st_mapmatching_spark.operators.matching import match_pages
    pages_df = spark.createDataFrame(pages)
    matched = match_pages(spark, pages_df, net, cfg)
    points = simplify_trajs(extract_trajs(pages_df), cfg)
    return matched, points


def test_eval_similarity_lcss(spark, matched_and_points, net, cfg):
    matched, points = matched_and_points
    out = eval_similarity(spark, matched, points, net, cfg, metric="lcss").toPandas()
    assert len(out) >= 8
    # matched paths should be close to their trajectories
    assert (out.metric_value > 0.5).mean() > 0.7


def test_eval_precision_against_oracle(spark, matched_and_points, net, cfg, pages):
    matched, _ = matched_and_points
    from st_mapmatching_spark.oracle.matcher import match_trajectory
    from st_mapmatching_spark.sources.extract import extract_points
    pts = extract_points(pages)
    gold = []
    for url, grp in pts.groupby("url"):
        res = match_trajectory(grp[["x", "y"]].to_numpy(), net, cfg)
        if res.get("vpath"):
            gold.append((url, [int(v) for v in res["vpath"]]))
    gold_df = spark.createDataFrame(pd.DataFrame(gold, columns=["url", "gold_vpath"]))
    out = eval_precision(matched, gold_df, net, spark).toPandas().iloc[0]
    assert out.n == len(gold)
    assert out.precision == 1.0  # engine == oracle exactly


def test_ivf_recall(spark):
    from st_mapmatching_spark.operators.similarity import brute_force_topk, ivf_topk
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .withColumn("embedding", F.col("embedding").cast("array<double>")).persist())
    q = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=5).toPandas()
    approx = ivf_topk(spark, emb, q, dim=64, k=5, n_centroids=8, n_probe=4).toPandas()
    hit = tot = 0
    for qi in range(10):
        e = set(exact[exact.q_id == qi].c_id)
        a = set(approx[approx.q_id == qi].c_id)
        hit += len(e & a)
        tot += len(e)
    assert hit / tot >= 0.6, f"IVF recall {hit/tot}"
