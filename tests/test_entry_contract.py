"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle_sql() twin must match DuckDB row-for-row at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_duckdb(spark, duck, name):
    got = _canon(entrymod.queries()[name](spark, SF).toPandas())
    want = _canon(duck.execute(entrymod.oracle_sql()[name]).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns), \
        f"{name}: cols {list(got.columns)} != {list(want.columns)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  rtol=1e-6, atol=1e-6, obj=name)


def test_every_query_has_an_oracle():
    """As of round 4 every queries() entry carries a full SQL twin — the
    five former rows-only gates (match_grid, match_grid_classic, sim_lsh,
    sim_ivf, eval_lcss) were the last conversions. Keep it that way."""
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert set(qs) == set(sqls), set(qs) ^ set(sqls)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert {"url", "status", "epath"} <= set(pdf.columns)
    assert pdf.status.isin([0, 1, 2, 3, 4, 99]).all()
