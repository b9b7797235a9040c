"""Connected-components dedup clustering (operators/dedup.py tail).

The operator runs alternating large-star/small-star rounds; truth here is
an independent union-find. Random graphs cover chains (worst-case diameter
— the case plain label propagation handles in O(n) rounds and star
contraction in O(log^2 n)), cliques, singletons-in-pairs, and empty input.
"""

import numpy as np
import pandas as pd
import pytest

from st_mapmatching_spark.operators.dedup import (connected_components,
                                                  dedup_keep_canonical)


def _uf_labels(n_ids, edges):
    parent = list(range(n_ids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id per component, only for ids that appear in edges
    seen = sorted({x for e in edges for x in e})
    comp = {}
    for x in seen:
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(comp[find(x)]) for x in seen}


def _check(spark, edges):
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["a", "b"]).astype("int64"))
    got = {int(r.id): int(r.component)
           for r in connected_components(pairs).collect()}
    want = _uf_labels(max((max(e) for e in edges), default=0) + 1, edges)
    assert got == want


def test_chain_worst_case_diameter(spark):
    # 0-1-2-...-40: diameter 40, must converge in O(log^2) star rounds
    _check(spark, [(i, i + 1) for i in range(40)])


def test_chain_with_reliable_checkpoint_dir(spark, tmp_path):
    """reliable_checkpoint_dir routes the per-round lineage cut through a
    durable checkpoint (survives executor loss on a real cluster) — same
    labels, and the dir actually receives checkpoint data."""
    import os
    edges = [(i, i + 1) for i in range(40)]
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["a", "b"]).astype("int64"))
    ckpt = str(tmp_path / "cc_ckpt")
    got = {int(r.id): int(r.component)
           for r in connected_components(
               pairs, reliable_checkpoint_dir=ckpt).collect()}
    want = _uf_labels(41, edges)
    assert got == want
    # the checkpoint dir must have been used (rdd checkpoint files on disk)
    walked = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert walked, "reliable checkpoint dir is empty — option not honored"


def test_reversed_chain_and_gaps(spark):
    _check(spark, [(i + 1, i) for i in range(0, 30, 3)])


def test_clique_plus_islands(spark):
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    _check(spark, clique + [(10, 11), (20, 21), (21, 22), (11, 10)])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = np.random.default_rng(seed)
    n, m = 60, 45
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (m, 2))
             if a != b]
    _check(spark, edges)


def test_empty_pairs(spark):
    pairs = spark.createDataFrame(pd.DataFrame({"a": [], "b": []}),
                                  schema="a long, b long")
    assert connected_components(pairs).count() == 0


def test_keep_canonical(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [f"d{i}" for i in range(6)]}))
    # components {0,1,2} and {4,5}; 3 untouched
    pairs = spark.createDataFrame(pd.DataFrame(
        [(1, 0), (1, 2), (4, 5)], columns=["a", "b"]))
    kept = sorted(r.doc_id for r in
                  dedup_keep_canonical(docs, pairs).collect())
    assert kept == [0, 3, 4]


def test_keep_best_quality(spark):
    from pyspark.sql import functions as F
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "quality": [0.1, 0.9, 0.5, 0.7, 0.2, 0.8],
        "text": [f"d{i}" for i in range(6)]}))
    pairs = spark.createDataFrame(pd.DataFrame(
        [(1, 0), (1, 2), (4, 5)], columns=["a", "b"]))
    kept = sorted(r.doc_id for r in dedup_keep_canonical(
        docs, pairs, order=[F.desc("quality"), "doc_id"]).collect())
    # cluster {0,1,2} -> best quality 1; {4,5} -> 5; 3 untouched
    assert kept == [1, 3, 5]
