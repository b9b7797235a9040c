"""Round-7 candidate_join shape: the dropDuplicates removal is only safe
because each (url, pid, eid) pair is emitted exactly once (single-cell
probe of a radius-dilated, one-row-per-(cell,eid) index), and the
attrs-after-topk move is only a win if Catalyst actually prunes the join
when its columns are unused. Both invariants are pinned here."""

import re

import pytest
from pyspark.sql import functions as F

from st_mapmatching_spark.operators.candidates import (candidate_join,
                                                       extract_trajs,
                                                       network_frames,
                                                       simplify_trajs)


@pytest.fixture(scope="module")
def points(spark, pages, cfg):
    return simplify_trajs(extract_trajs(spark.createDataFrame(pages)),
                          cfg).persist()


def _plan(df, spark):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def test_candidate_pairs_unique_without_dedupe(spark, points, net, cfg):
    """The invariant the removed dropDuplicates used to enforce at
    runtime: candidate rows are unique on (url, pid, eid) by construction
    — broadcast AND shuffle cell-join variants."""
    idx, attrs = network_frames(spark, net)
    for bc in (True, False):
        cands = candidate_join(points, idx, attrs, cfg,
                               broadcast_index=bc, net=net)
        dup = (cands.groupBy("url", "pid", "eid").count()
               .filter(F.col("count") > 1).count())
        assert dup == 0, f"broadcast_index={bc}: {dup} duplicate pairs"


def test_no_dedupe_aggregate_in_plan(spark, points, net, cfg):
    """No hash aggregate keyed (url, pid, eid) between refine and top-k —
    the r7 removal stays removed."""
    idx, attrs = network_frames(spark, net)
    plan = _plan(candidate_join(points, idx, attrs, cfg, net=net), spark)
    assert not re.search(r"Keys \[3\]: \[url#\d+, pid#\d+, eid#\d+L?\]",
                         plan), plan


def test_attrs_stay_out_of_refine_and_exchange(spark, points, net, cfg):
    """The Arrow refine stage and the url exchange must not carry edge
    attribute columns — the attrs broadcast join sits ABOVE the top-k
    window, on survivors only. (The join itself is not prunable: it is an
    inner join, so it participates in row-count semantics.)"""
    idx, attrs = network_frames(spark, net)
    cands = candidate_join(points, idx, attrs, cfg, net=net)
    plan = _plan(cands.select("url", "pid", "eid", "dist_p2c"), spark)
    m = re.search(r"\(\d+\) MapInArrow\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert m, plan
    assert "way_id" not in m.group(1), m.group(1)
    ex = re.search(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\n"
                   r"Arguments: hashpartitioning\(url", plan)
    assert ex, plan
    assert "way_id" not in ex.group(1), ex.group(1)
    # full consumers still see every attr column
    full_cols = set(cands.columns)
    assert {"src", "dst", "way_id", "dir", "dist", "speed",
            "observ_prob"} <= full_cols


def test_attrs_values_correct_after_move(spark, points, net, cfg):
    """Attr columns joined post-topk carry the same per-eid values the
    pre-refine join carried (spot-check against the network table)."""
    import pandas as pd
    idx, attrs = network_frames(spark, net)
    cands = candidate_join(points, idx, attrs, cfg, net=net)
    got = cands.select("eid", "src", "dst", "dist", "speed").distinct() \
        .toPandas().sort_values("eid").reset_index(drop=True)
    exp = attrs.select("eid", "src", "dst", "dist", "speed").toPandas()
    merged = got.merge(exp, on="eid", suffixes=("", "_e"))
    assert (merged.src == merged.src_e).all()
    assert (merged.dst == merged.dst_e).all()
    assert (merged.dist == merged.dist_e).all()
    assert (merged.speed == merged.speed_e).all()
