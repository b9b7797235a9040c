"""Self-check replica of the driver's correctness gate: run every
`queries()` entry against its `oracle_sql()` twin at sf0.01 and compare
rows / schema / value-hash after driver-style canonicalization (columns
sorted by name, rows sorted by all columns, values rounded via repr).

Usage: python scripts/gate_check.py [query ...]
"""
import hashlib
import json
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            vals = s.round(9).astype(str)
        else:
            vals = s.astype(str)
        h.update("\n".join(vals.tolist()).encode())
    return h.hexdigest()


def main():
    from pyspark.sql import SparkSession
    import __spark_entry__ as E

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs = E.queries()
    osql = E.oracle_sql()
    only = set(sys.argv[1:])
    out = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = _canon(fn(spark, SF).toPandas())
        except Exception as ex:  # noqa: BLE001
            out[name] = {"err": f"spark: {ex}"}
            print(name, out[name])
            continue
        if name not in osql:
            out[name] = {"spark_rows": len(sdf), "err": "no_oracle"}
            print(name, out[name])
            continue
        try:
            odf = _canon(con.execute(osql[name]).df())
        except Exception as ex:  # noqa: BLE001
            out[name] = {"err": f"oracle: {ex}"}
            print(name, out[name])
            continue
        res = {
            "rows_match": len(sdf) == len(odf),
            "schema_match": list(sdf.columns) == list(odf.columns),
            "hash_match": _hash(sdf) == _hash(odf),
            "spark_rows": len(sdf), "oracle_rows": len(odf),
        }
        out[name] = res
        print(name, res)
    bad = {k: v for k, v in out.items()
           if v.get("err") not in (None, "no_oracle")
           or (v.get("rows_match") is False or v.get("hash_match") is False)}
    print(json.dumps({"n": len(out), "bad": bad}, indent=1, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
