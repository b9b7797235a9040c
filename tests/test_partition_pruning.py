"""Partition-pruning evidence on the pages read path (r6 verdict item 6):
the 100 TB pages table's first line of defense is that a `warc_day` (and
cell-key) partition predicate prunes parquet partitions BEFORE any byte is
read, and that the matcher's scan reads only (url, text). Both are
plan-asserted here, plus an end-to-end row check through match_pages."""

import pytest
from pyspark.sql import functions as F

from st_mapmatching_spark.operators.candidates import extract_trajs
from st_mapmatching_spark.operators.dedup import simhash64


def _plan(df, spark):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


@pytest.fixture(scope="module")
def part_pages_path(spark, pages, tmp_path_factory):
    """pages written the way a crawl archive lays them out: partitioned by
    warc_day and a coarse region key (first-point cell)."""
    p = str(tmp_path_factory.mktemp("pages_part") / "pages")
    df = spark.createDataFrame(pages)
    # two synthetic days + two regions so pruning has something to prune
    df = (df.withColumn(
              "warc_day",
              F.when(F.xxhash64("url") % 2 == 0, F.lit("2023-11-14"))
               .otherwise(F.lit("2023-11-15")))
          .withColumn("region",
                      (F.xxhash64("url", F.lit(1)) % 2).cast("int")))
    df.write.partitionBy("warc_day", "region").parquet(p)
    return p


def test_warc_day_predicate_prunes_partitions(spark, part_pages_path):
    src = spark.read.parquet(part_pages_path)
    q = src.filter((F.col("warc_day") == "2023-11-14")
                   & (F.col("region") == 0)).select("url", "text")
    plan = _plan(q, spark)
    assert "PartitionFilters" in plan, plan
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "warc_day" in m.group(1) and "region" in m.group(1), plan
    # the predicate must NOT appear as a post-scan Filter on data columns
    # (that would mean every partition was read then discarded)
    assert "2023-11-14" in m.group(1), m.group(1)


def test_match_read_path_prunes_partitions_and_columns(spark,
                                                       part_pages_path,
                                                       net, cfg):
    """The matcher's actual page scan (extract_trajs = the first stage of
    match_pages) over a day-sliced read: partition filters reach the scan
    and ReadSchema is exactly (url, text)."""
    import re
    src = spark.read.parquet(part_pages_path)
    day = src.filter(F.col("warc_day") == "2023-11-14")
    plan = _plan(extract_trajs(day), spark)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "warc_day" in m.group(1), plan
    rs = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert rs, plan
    cols = {c.split(":")[0] for c in rs.group(1).split(",")}
    assert cols == {"url", "text"}, f"scan not pruned: {cols}"
    # end to end: only the selected day's urls come out of match_pages
    from st_mapmatching_spark.operators.matching import match_pages
    want_urls = {r.url for r in day.select("url").collect()}
    out = match_pages(spark, day, net, cfg)
    assert {r.url for r in out.select("url").collect()} == want_urls
    out.unpersist()


def test_dedup_read_path_prunes_partitions(spark, part_pages_path):
    """The dedup family's scan side under a day predicate: partition
    filters present, ReadSchema limited to (url, text) for the simhash
    pass (doc id column = url here)."""
    import re
    src = spark.read.parquet(part_pages_path)
    day = (src.filter(F.col("warc_day") == "2023-11-15")
           .withColumn("doc_id", F.xxhash64("url")))
    sh = simhash64(day, text_col="text")
    plan = _plan(sh, spark)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "warc_day" in m.group(1), plan
    rs = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in rs.group(1).split(",")}
    assert cols == {"url", "text"}, f"scan not pruned: {cols}"
    n_day = day.count()
    assert sh.count() == n_day and n_day > 0
