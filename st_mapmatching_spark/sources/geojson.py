"""GeoJSON trajectory loader — the reference's load_points
(/root/reference/mapmatching/match/io.py:7-26) re-expressed Spark-first.

A GeoJSON FeatureCollection is one JSON document per file, so
``spark.read.option("multiLine", True).json`` parses a whole glob of
trajectory files in one distributed scan; features explode positionally
(the feature index IS the point order, matching geopandas' row order in
``gpd.read_file``). Datum conversion (wgs/gcj/bd, io.py:17 via
coord_transfer) reuses the numpy kernels in kernels.datum inside one
Arrow pass.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRAJ_POINTS_SCHEMA = "url string, pid_raw long, x double, y double"


def load_points_geojson(spark: SparkSession, path, in_sys: str = "wgs",
                        out_sys: str = "wgs") -> DataFrame:
    """path (file, dir, or glob of .geojson FeatureCollections of Points)
    -> (url, pid_raw, x, y), url = source file name, pid_raw = feature
    position. Coordinates round-trip exactly when in_sys == out_sys.

    The reference notes-but-never-fixes duplicate points (io.py:8 'BUG');
    dedup stays downstream (extract/simplify), as there.
    """
    # explicit schema: only the geometry is read (skips the inference pass,
    # and sidesteps per-file property schemas that can collide
    # case-insensitively — the reference corpus itself has files with
    # properties `x` and `X`)
    schema = ("features array<struct<"
              "geometry: struct<coordinates: array<double>, type: string>>>")
    raw = (spark.read.option("multiLine", True).schema(schema).json(path)
           .select(F.col("_metadata.file_name").alias("url"), "features"))
    pts = (raw.select("url", F.posexplode("features").alias("pid_raw", "f"))
           .select("url", F.col("pid_raw").cast("long"),
                   F.col("f.geometry.coordinates").getItem(0).alias("x"),
                   F.col("f.geometry.coordinates").getItem(1).alias("y")))
    if in_sys == out_sys:
        return pts

    def op(batches):
        from ..kernels.datum import convert
        for pdf in batches:
            x, y = convert(pdf.x.to_numpy(), pdf.y.to_numpy(), in_sys, out_sys)
            yield pd.DataFrame({"url": pdf.url, "pid_raw": pdf.pid_raw,
                                "x": x, "y": y})

    return pts.mapInPandas(op, schema=TRAJ_POINTS_SCHEMA)


def load_labels(spark: SparkSession, path) -> DataFrame:
    """gt.json ground-truth loader (eval.py:17-23): {traj file -> node-id
    path} -> (url, vpath array<long>)."""
    raw = spark.read.option("multiLine", True).json(path)
    cols = raw.columns
    return raw.select(F.stack(
        F.lit(len(cols)),
        *[c for name in cols
          for c in (F.lit(name), F.col(f"`{name}`"))]).alias("url", "vpath"))
