from st_mapmatching_spark.sources.tables import (_looks_like_table_ident,
                                                 iceberg_available,
                                                 read_table, write_table)


def test_parquet_fallback_roundtrip(spark, tmp_path):
    df = spark.range(100).withColumnRenamed("id", "v")
    out = str(tmp_path / "t")
    write_table(df, out)
    back = read_table(spark, out)
    assert back.count() == 100
    # this sandbox has no Iceberg jars; the probe must degrade cleanly
    assert iceberg_available(spark) in (True, False)


def test_table_ident_detection():
    assert _looks_like_table_ident("lake.db.pages")
    assert not _looks_like_table_ident("pages.parquet")
    assert not _looks_like_table_ident("db.pages")          # needs catalog
    assert not _looks_like_table_ident("a/b/pages.parquet")
    assert not _looks_like_table_ident("lake.db.pages.csv")


def test_network_csv_sink_roundtrip(spark, tmp_path):
    """CSV sink (reference geograph.py:165-184): edge/node tables with WKT
    geometry written by the distributed CSV writer and read back intact."""
    from st_mapmatching_spark.sources import derived as D
    from st_mapmatching_spark.sources.tables import network_to_csv

    net = D.grid_network()
    edge_dir, node_dir = network_to_csv(spark, net, str(tmp_path))
    e = spark.read.option("header", True).csv(edge_dir)
    n = spark.read.option("header", True).csv(node_dir)
    assert e.count() == len(net.edges)
    assert n.count() == len(net.nodes)
    row = e.filter(e.eid == "0").collect()[0]
    assert row.geom.startswith("LINESTRING (") and " " in row.geom
    assert {"eid", "way_id", "src", "dst", "dir", "dist", "speed", "geom"} <= set(e.columns)
    assert {"nid", "x", "y", "geom"} <= set(n.columns)
