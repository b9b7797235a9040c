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
