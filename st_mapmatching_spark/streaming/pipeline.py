"""Structured Streaming variants of the engine's stages.

The reference is pure batch (SURVEY.md §2.12); these are the engine's
stream-shaped entry points for a continuously-crawled pages table:

* stream_extract_points  — the same Arrow extractor over a file stream
* stream_cell_counts     — watermarked windowed raster aggregation
* stream_match_batches   — foreachBatch bridge running the full batch
  matcher per micro-batch (exactly-once per sink partition when combined
  with the lineage stage tables)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import MatchConfig
from ..functions.geo_cols import cell_of_xy, xy_cols
from ..sources.extract import extract_points

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def stream_pages(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def stream_extract_points(pages: DataFrame) -> DataFrame:
    def op(batches):
        for pdf in batches:
            out = extract_points(pdf)
            # merge, not set_index/reindex: a micro-batch may legitimately
            # carry the same url twice (re-crawl); reindex raises on dups
            ts = pdf[["url", "warc_ts"]].drop_duplicates("url", keep="first")
            yield out.merge(ts, on="url", how="left")

    schema = ("url string, pid_raw long, x double, y double, t_epoch long, "
              "warc_ts timestamp")
    return pages.select("url", "text", "warc_ts").mapInPandas(op, schema=schema)


def stream_cell_counts(points: DataFrame, cfg: MatchConfig,
                       window: str = "10 minutes",
                       watermark: str = "30 minutes") -> DataFrame:
    """Windowed per-cell point counts with late-data handling — the
    streaming face of the raster aggregation."""
    xm, ym = xy_cols(F.col("x"), F.col("y"), cfg.lon0, cfg.lat0)
    cells = points.withColumn("cell", cell_of_xy(xm, ym, cfg.cell_size))
    return (cells.withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window), "cell")
            .agg(F.count("*").alias("n_points")))


def stream_match_batches(spark: SparkSession, pages: DataFrame, net, cfg: MatchConfig,
                         sink_fn):
    """foreachBatch bridge: run the full batch matcher on each micro-batch
    and hand the matched DataFrame to sink_fn(df, epoch_id)."""
    from ..operators.matching import match_pages

    def per_batch(batch_df: DataFrame, epoch_id: int):
        if batch_df.isEmpty():
            return
        sink_fn(match_pages(spark, batch_df, net, cfg), epoch_id)

    return pages.writeStream.foreachBatch(per_batch)
