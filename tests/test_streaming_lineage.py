"""Streaming smoke (file source -> windowed cell counts -> memory sink)
and checkpoint/resume with per-partition lineage."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from st_mapmatching_spark.plans.lineage import StageRunner
from st_mapmatching_spark.streaming.pipeline import (stream_cell_counts,
                                                     stream_extract_points,
                                                     stream_pages)


def test_streaming_cell_counts(spark, pages, cfg, tmp_path):
    src = str(tmp_path / "pages_in")
    spark.createDataFrame(pages).write.parquet(src)

    pts = stream_extract_points(stream_pages(spark, src))
    agg = stream_cell_counts(pts, cfg)
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("cells_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select sum(n_points) as n from cells_out").collect()[0].n

    # batch equivalent
    from st_mapmatching_spark.operators.candidates import extract_trajs
    n_batch = extract_trajs(spark.createDataFrame(pages)).count()
    assert got == n_batch


def test_stage_checkpoint_reuse(spark, tmp_path):
    runner = StageRunner(spark, str(tmp_path / "stages"))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    a = runner.stage("s1", "fp1", build)
    b = runner.stage("s1", "fp1", build)
    assert calls["n"] == 1           # second call read back
    assert a.count() == b.count() == 100
    lin = runner.lineage("s1").toPandas()
    assert lin.rows.sum() == 100
    assert (lin.fingerprint == "fp1").all()

    runner.stage("s1", "fp2", build)  # fingerprint change -> recompute
    assert calls["n"] == 2


def test_bucketed_resume_completes_missing(spark, tmp_path):
    import shutil

    root = str(tmp_path / "stages2")
    runner = StageRunner(spark, root)
    inputs = spark.range(1000).select(F.concat(F.lit("u"), F.col("id")).alias("url"),
                                      F.col("id").alias("v"))

    seen = []

    def build(subset):
        seen.append(subset.count())
        return subset.withColumn("out", F.col("v") * 10)

    r1 = runner.bucketed_stage("m", "fp", inputs, build, key="url", n_buckets=8)
    assert r1.count() == 1000
    assert seen == [1000]

    # simulate a mid-run kill: buckets >= 4 lost their data AND their
    # lineage commit records
    lin_dir = os.path.join(root, "m", "_lineage")
    lin = spark.read.parquet(lin_dir).filter(F.col("bucket") < 4).toPandas()
    shutil.rmtree(lin_dir)
    spark.createDataFrame(lin).write.parquet(lin_dir)
    data_dir = os.path.join(root, "m", "data")
    lost_rows = 0
    for b in range(4, 8):
        d = os.path.join(data_dir, f"bucket={b}")
        if os.path.exists(d):
            lost_rows += spark.read.parquet(d).count()
            shutil.rmtree(d)

    r2 = runner.bucketed_stage("m", "fp", inputs, build, key="url", n_buckets=8)
    done = {r.bucket for r in runner.lineage("m").select("bucket").collect()}
    assert done == set(range(8))
    assert r2.count() == 1000
    # the resume pass computed only the lost buckets
    assert seen[1] == lost_rows


def test_bucketed_exactly_once_on_crash(spark, tmp_path, monkeypatch):
    """Kill the run BETWEEN the bucket-data write and the lineage commit:
    the rerun must not duplicate the orphan buckets' rows (the round-1
    append-then-commit protocol did)."""
    from st_mapmatching_spark.plans import lineage as L

    root = str(tmp_path / "stages3")
    runner = StageRunner(spark, root)
    inputs = spark.range(600).select(F.concat(F.lit("u"), F.col("id")).alias("url"),
                                     F.col("id").alias("v"))

    def build(subset):
        return subset.withColumn("out", F.col("v") * 10)

    # attempt 1 crashes after data lands, before the lineage append
    orig = StageRunner._commit_lineage

    def boom(self, lin, lin_dir):
        raise RuntimeError("injected crash before lineage commit")

    monkeypatch.setattr(StageRunner, "_commit_lineage", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        runner.bucketed_stage("m", "fp", inputs, build, key="url", n_buckets=4)
    # orphan data exists, zero lineage
    data_dir = os.path.join(root, "m", "data")
    assert spark.read.parquet(data_dir).count() == 600
    assert runner.lineage("m") is None

    # attempt 2 succeeds; rows must NOT double
    monkeypatch.setattr(StageRunner, "_commit_lineage", orig)
    out = runner.bucketed_stage("m", "fp", inputs, build, key="url", n_buckets=4)
    assert out.count() == 600
    got = out.toPandas().sort_values("v").reset_index(drop=True)
    assert got.v.tolist() == list(range(600))
    lin = runner.lineage("m").toPandas()
    assert set(lin.bucket) == set(range(4))
    assert lin.rows.sum() == 600


def test_bucketed_exactly_once_zero_row_bucket(spark, tmp_path, monkeypatch):
    """Crash + rerun where a recomputed bucket legitimately emits ZERO
    rows: the orphan partition from the crashed attempt must be
    reconciled away, not read back."""
    from st_mapmatching_spark.plans.lineage import StageRunner as SR

    root = str(tmp_path / "stages4")
    runner = StageRunner(spark, root)
    inputs = spark.range(200).select(F.concat(F.lit("u"), F.col("id")).alias("url"),
                                     F.col("id").alias("v"))

    phase = {"drop": False}

    def build(subset):
        if phase["drop"]:
            return subset.filter(F.col("v") < 0).withColumn("out", F.col("v"))
        return subset.withColumn("out", F.col("v"))

    def boom(self, lin, lin_dir):
        raise RuntimeError("injected")

    monkeypatch.setattr(SR, "_commit_lineage", boom)
    with pytest.raises(RuntimeError):
        runner.bucketed_stage("m", "fp", inputs, build, key="url", n_buckets=2)
    monkeypatch.undo()

    phase["drop"] = True  # recompute now yields zero rows everywhere
    out = runner.bucketed_stage("m", "fp", inputs, build, key="url", n_buckets=2)
    assert out.count() == 0  # no stale rows resurrected
    lin = runner.lineage("m").toPandas()
    assert lin.rows.sum() == 0


def test_stream_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: points of two urls arrive split
    across two micro-batches; a later sentinel batch advances the
    watermark past the session gap, which times the sessions out and
    emits one completed trajectory per url, points merged across batches
    and sorted by pid."""
    import pandas as pd

    from st_mapmatching_spark.streaming.pipeline import stream_sessionize

    src = str(tmp_path / "pts_in")
    os.makedirs(src)
    t0 = pd.Timestamp("2023-11-14 00:00:00")

    def mk(rows, fn):
        df = pd.DataFrame(rows, columns=["url", "pid_raw", "x", "y",
                                         "t_epoch", "warc_ts"])
        # microsecond timestamps: Spark's TimestampType cannot read the
        # INT64 nanos pandas writes by default
        df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
        df.to_parquet(os.path.join(src, fn))

    # batch 1: first half of a and b
    mk([("a", 0, 0.0, 0.0, 0, t0), ("a", 1, 1.0, 0.0, 1, t0),
        ("b", 0, 5.0, 5.0, 0, t0)], "b1.parquet")
    # batch 2: second half, 1 minute later (inside the 10-min gap)
    t1 = t0 + pd.Timedelta(minutes=1)
    mk([("a", 2, 2.0, 0.0, 2, t1), ("b", 1, 6.0, 5.0, 1, t1)], "b2.parquet")
    # batch 3: sentinel far in the future -> watermark passes a/b's
    # timeout, sessions emit
    mk([("c", 0, 9.0, 9.0, 0, t0 + pd.Timedelta(hours=5))], "b3.parquet")

    schema = ("url string, pid_raw long, x double, y double, t_epoch long, "
              "warc_ts timestamp")
    pts = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    sess = stream_sessionize(pts, gap_minutes=10, watermark="0 seconds")
    q = (sess.writeStream.outputMode("append")
         .format("memory").queryName("sessions_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.url: r for r in spark.sql("select * from sessions_out").collect()}
    assert set(got) >= {"a", "b"}, f"sessions not emitted: {set(got)}"
    assert got["a"].n_points == 3
    assert list(got["a"].xs) == [0.0, 1.0, 2.0]   # merged across batches, pid order
    assert got["b"].n_points == 2
    assert list(got["b"].ys) == [5.0, 5.0]


def test_stream_sessionize_out_of_order_batch_keeps_session_open(spark, tmp_path):
    """Regression (round-3 advice): an out-of-order micro-batch OLDER than
    the session's stored max event time must not pull the timeout
    earlier. Batch order: t0+9min, then t0 (older), then a sentinel at
    t0+13min — within gap_minutes=10 of the TRUE latest point (t0+9min),
    so the session must still be open (no emission); a final sentinel far
    ahead then closes it with all points merged."""
    import pandas as pd

    from st_mapmatching_spark.streaming.pipeline import stream_sessionize

    src = str(tmp_path / "pts_in")
    os.makedirs(src)
    t0 = pd.Timestamp("2023-11-14 00:00:00")

    def mk(rows, fn):
        df = pd.DataFrame(rows, columns=["url", "pid_raw", "x", "y",
                                         "t_epoch", "warc_ts"])
        df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
        df.to_parquet(os.path.join(src, fn))

    mk([("a", 1, 1.0, 0.0, 1, t0 + pd.Timedelta(minutes=9))], "b1.parquet")
    mk([("a", 0, 0.0, 0.0, 0, t0)], "b2.parquet")  # out-of-order, older
    # watermark reaches t0+13min: AFTER t0+gap (the buggy timeout, which
    # would CLOSE the session here) but BEFORE t0+9min+gap (the correct
    # one, which keeps it open)
    mk([("z", 0, 9.0, 9.0, 0, t0 + pd.Timedelta(minutes=13))], "b3.parquet")
    # second sentinel: its trigger STARTS with watermark 13min — past the
    # buggy timeout (t0+10min) but before the correct one (t0+19min); the
    # bug emits 'a' here, the fix keeps it open
    mk([("z", 1, 9.1, 9.1, 1, t0 + pd.Timedelta(minutes=14))], "b4.parquet")
    # a third point for the still-open session (within gap of the true
    # latest): merges under the fix; starts a SECOND session row under
    # the bug
    mk([("a", 2, 2.0, 0.0, 2, t0 + pd.Timedelta(minutes=15))], "b5.parquet")
    mk([("z", 2, 9.0, 9.0, 2, t0 + pd.Timedelta(hours=5))], "b6.parquet")

    schema = ("url string, pid_raw long, x double, y double, t_epoch long, "
              "warc_ts timestamp")
    pts = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    sess = stream_sessionize(pts, gap_minutes=10, watermark="0 seconds")
    q = (sess.writeStream.outputMode("append")
         .format("memory").queryName("sessions_ooo").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from sessions_ooo where url = 'a'").collect()
    # exactly ONE session holding all three points; the buggy early
    # timeout emits a 2-point session at b3 plus a separate 1-point one
    assert len(rows) == 1, [(r.n_points, list(r.xs)) for r in rows]
    r = rows[0]
    assert r.n_points == 3
    assert list(r.xs) == [0.0, 1.0, 2.0]
    assert r.t_last == int((t0 + pd.Timedelta(minutes=15)).value // 1_000_000)


def test_stream_sessionize_hot_url_state_bounded(spark, tmp_path):
    """Round-4 VERDICT item 2: a million-point always-hot url must not grow
    sessionizer state without bound. With max_points_per_session=100k the
    operator emits full 100k-point segments as soon as the cap is crossed
    (emit-and-restart, the streaming twin of the batch HMM-break), so state
    between micro-batches never exceeds the cap — verified by the emitted
    segment sizes. A normal small session in the same stream is unchanged."""
    import pandas as pd

    from st_mapmatching_spark.streaming.pipeline import stream_sessionize

    src = str(tmp_path / "hot_in")
    os.makedirs(src)
    t0 = pd.Timestamp("2023-11-14 00:00:00")
    cap = 100_000
    n_total, n_batches = 1_000_000, 4
    per = n_total // n_batches
    for b in range(n_batches):
        pid0 = b * per
        df = pd.DataFrame({
            "url": "hot",
            "pid_raw": np.arange(pid0, pid0 + per, dtype="int64"),
            "x": np.arange(pid0, pid0 + per, dtype="float64") * 1e-3,
            "y": np.zeros(per),
            "t_epoch": np.arange(pid0, pid0 + per, dtype="int64"),
            "warc_ts": t0 + pd.Timedelta(minutes=b),
        })
        if b == 0:   # one normal url alongside the hot one
            df = pd.concat([df, pd.DataFrame({
                "url": ["norm"] * 3, "pid_raw": [0, 1, 2],
                "x": [0.0, 1.0, 2.0], "y": [5.0, 5.0, 5.0],
                "t_epoch": [0, 1, 2], "warc_ts": [t0] * 3})],
                ignore_index=True)
        df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
        df.to_parquet(os.path.join(src, f"b{b}.parquet"))
    # sentinel far in the future flushes the residual segments
    sent = pd.DataFrame({"url": ["zz"], "pid_raw": [0], "x": [9.0], "y": [9.0],
                         "t_epoch": [0],
                         "warc_ts": [(t0 + pd.Timedelta(hours=9))]})
    sent["warc_ts"] = sent["warc_ts"].astype("datetime64[us]")
    sent.to_parquet(os.path.join(src, "zz.parquet"))

    schema = ("url string, pid_raw long, x double, y double, t_epoch long, "
              "warc_ts timestamp")
    pts = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    sess = stream_sessionize(pts, gap_minutes=10, watermark="0 seconds",
                             max_points_per_session=cap)
    q = (sess.writeStream.outputMode("append")
         .format("memory").queryName("hot_sessions").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql(
        "select url, n_points, t_first, t_last from hot_sessions").collect()
    hot = [r for r in out if r.url == "hot"]
    # every segment respects the cap; full segments are exactly cap-sized;
    # nothing lost: the million points all emerge
    assert max(r.n_points for r in hot) <= cap
    assert sum(r.n_points for r in hot) == n_total
    assert len(hot) == n_total // cap
    assert all(r.n_points == cap for r in hot)
    norm = [r for r in out if r.url == "norm"]
    assert len(norm) == 1 and norm[0].n_points == 3
