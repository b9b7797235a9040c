"""Table IO with Iceberg support behind a capability probe.

The north rule targets Iceberg tables of web pages. This container has no
Iceberg runtime jars (environment constraint: stub connectors behind an
import-try), so the IO layer probes for the Iceberg data source and falls
back to plain parquet with identical call sites. On a real cluster, add

    --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver>
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.lake.type=hadoop
    --conf spark.sql.catalog.lake.warehouse=s3://bucket/warehouse

and pass table identifiers like `lake.db.pages` to these helpers. The
lineage/resume layer (plans/lineage.py) maps onto Iceberg snapshots
naturally: each bucket commit becomes an append snapshot and the lineage
table an Iceberg audit table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


_FILE_EXTS = (".parquet", ".csv", ".json", ".orc", ".avro", ".txt", ".tsv")


def _looks_like_table_ident(path: str) -> bool:
    """Only a full catalog.db.table identifier routes to the Iceberg
    reader; bare filenames like 'pages.parquet' must stay on the file
    path (they contain a dot but are not table idents)."""
    import re
    if "/" in path or path.lower().endswith(_FILE_EXTS):
        return False
    return re.fullmatch(r"\w+\.\w+\.\w+", path) is not None


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read an Iceberg table identifier (catalog.db.table) when the runtime
    is present, else a parquet path."""
    if _looks_like_table_ident(path) and iceberg_available(spark):
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def write_table(df: DataFrame, path: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if _looks_like_table_ident(path) and iceberg_available(df.sparkSession):
        w.format("iceberg").saveAsTable(path)
    else:
        w.parquet(path)


def network_to_csv(spark: SparkSession, net, folder: str) -> tuple[str, str]:
    """CSV sink for a routable network — the reference's GeoGraph.to_csv
    (/root/reference/mapmatching/graph/geograph.py:165-184): one edge CSV
    (attributes + WKT LINESTRING geometry) and one node CSV (nid/x/y +
    WKT POINT), written with Spark's distributed CSV writer. Returns the
    two output directories."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    e = net.edges
    epdf = pd.DataFrame({
        "eid": e["eid"].astype(int),
        "way_id": e["way_id"].astype(int),
        "src": e["src"].astype(int),
        "dst": e["dst"].astype(int),
        "dir": e["dir"].astype(int),
        "dist": e["dist"].astype(float),
        "speed": e["speed"].astype(float),
        "geom": ["LINESTRING (" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in g) + ")"
                 for g in e["geom_xy"]],
    })
    npdf = net.nodes.copy()
    npdf["geom"] = ["POINT (" + f"{x:.10g} {y:.10g}" + ")"
                    for x, y in zip(npdf["x"].astype(float), npdf["y"].astype(float))]

    edge_dir = os.path.join(folder, "edges_csv")
    node_dir = os.path.join(folder, "nodes_csv")
    (spark.createDataFrame(epdf).write.mode("overwrite")
     .option("header", True).csv(edge_dir))
    cols = [c for c in ("nid", "x", "y", "geom") if c in npdf.columns]
    (spark.createDataFrame(npdf[cols]).write.mode("overwrite")
     .option("header", True).csv(node_dir))
    return edge_dir, node_dir


# ---------------------------------------------------------------------------
# PostGIS / JDBC sink (capability-probed — no server or driver jar in this
# sandbox; on a real cluster add --packages org.postgresql:postgresql:<ver>)
# ---------------------------------------------------------------------------

def jdbc_driver_available(spark: SparkSession,
                          driver: str = "org.postgresql.Driver") -> bool:
    """Capability probe for a JDBC driver class on the JVM classpath
    (the iceberg_available pattern)."""
    try:
        spark._jvm.java.lang.Class.forName(driver)
        return True
    except Exception:
        return False


def _postgis_options(table: str, url: str, *,
                     user: str | None = None, password: str | None = None,
                     driver: str = "org.postgresql.Driver",
                     batchsize: int = 10_000) -> dict:
    """The exact spark-jdbc option map a write will use — split out so
    the plumbing is unit-testable without a server or driver jar."""
    opts = {"url": url, "dbtable": table, "driver": driver,
            "batchsize": str(batchsize)}
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return opts


def _postgis_writer(df: DataFrame, table: str, url: str, *,
                    mode: str = "overwrite", **kw):
    """Configure (but do not run) the JDBC write."""
    return (df.write.format("jdbc").mode(mode)
            .options(**_postgis_options(table, url, **kw)))


def network_to_postgis(spark: SparkSession, net, name: str, url: str, *,
                       user: str | None = None, password: str | None = None,
                       mode: str = "overwrite") -> dict:
    """PostGIS sink for a routable network — the reference's
    GeoGraph.to_postgis (/root/reference/mapmatching/graph/geograph.py:152-164):
    writes topo_osm_<name>_edge (attributes + WKT LINESTRING geometry),
    topo_osm_<name>_endpoint (nodes + degree), and topo_osm_<name>_node
    via Spark's distributed JDBC writer. Geometry travels as WKT text —
    cast server-side with ST_GeomFromText (this engine has no JVM
    geometry type; PostGIS ingests WKT natively). Raises RuntimeError
    with setup guidance when the driver jar is absent (this sandbox)."""
    import pandas as pd
    from pyspark.sql import functions as F

    if not jdbc_driver_available(spark):
        raise RuntimeError(
            "PostGIS sink needs the postgresql JDBC driver on the JVM "
            "classpath: launch with --packages org.postgresql:postgresql:42.7.3 "
            "(no driver jar in this sandbox)")

    e = net.edges
    epdf = pd.DataFrame({
        "eid": e["eid"].astype(int), "way_id": e["way_id"].astype(int),
        "src": e["src"].astype(int), "dst": e["dst"].astype(int),
        "dir": e["dir"].astype(int), "dist": e["dist"].astype(float),
        "speed": e["speed"].astype(float),
        "geom": ["LINESTRING (" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in g) + ")"
                 for g in e["geom_xy"]],
    })
    npdf = net.nodes.copy()
    npdf["geom"] = ["POINT (" + f"{x:.10g} {y:.10g}" + ")"
                    for x, y in zip(npdf["x"].astype(float),
                                    npdf["y"].astype(float))]
    edges_df = spark.createDataFrame(epdf)
    nodes_df = spark.createDataFrame(npdf[["nid", "x", "y", "geom"]])
    deg = (edges_df.select(F.col("src").alias("nid"))
           .unionAll(edges_df.select(F.col("dst").alias("nid")))
           .groupBy("nid").agg(F.count("*").alias("degree")))
    endpoint_df = nodes_df.join(deg, "nid", "left").fillna({"degree": 0})

    tables = {"edge": edges_df, "endpoint": endpoint_df, "node": nodes_df}
    written = {}
    for suffix, df in tables.items():
        tbl = f"topo_osm_{name}_{suffix}"
        _postgis_writer(df, tbl, url, user=user, password=password,
                        mode=mode).save()
        written[suffix] = tbl
    return written
