#!/usr/bin/env python
"""spark-submit entry point for the matching pipeline.

Cluster launch (north rule):

    cd /root/repo && zip -qr /tmp/stmm.zip st_mapmatching_spark
    spark-submit --master <cluster> \
        --py-files /tmp/stmm.zip \
        scripts/submit_match.py \
        --pages  s3://bucket/pages/           \
        --edges  s3://bucket/network/edges/   \
        --nodes  s3://bucket/network/nodes/   \
        --out    s3://bucket/matched/         \
        [--work-dir s3://bucket/checkpoints/run1]

Local smoke (this sandbox):

    python scripts/submit_match.py --demo --out /tmp/matched

With --work-dir the run is resumable: stages checkpoint to lineage-tracked
tables and a rerun skips finished work (plans/lineage.py).
"""

from __future__ import annotations

import argparse
import os
import sys

# running as `python scripts/submit_match.py` puts scripts/ on sys.path,
# not the repo root; spark-submit --py-files provides the package instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages")
    ap.add_argument("--edges")
    ap.add_argument("--nodes")
    ap.add_argument("--out", required=True)
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--cores", default="*")
    ap.add_argument("--demo", action="store_true",
                    help="use the deterministic grid network + synthesized pages")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from st_mapmatching_spark.config import MatchConfig
    from st_mapmatching_spark.graph.network import Network
    from st_mapmatching_spark.operators.matching import match_pages
    from st_mapmatching_spark.plans.lineage import StageRunner
    from st_mapmatching_spark.session import get_spark

    spark = (SparkSession.getActiveSession() or get_spark(cores=args.cores,
                                                          app="stmm-submit"))

    if args.demo:
        from st_mapmatching_spark.sources import derived as D
        import __spark_entry__ as entry
        cfg = entry.CFG
        net = D.grid_network(cfg)
        pages = entry._render_pages(D.derive_points(spark, "/root/testdata/sf0.001"))
    else:
        cfg = MatchConfig()
        edges = spark.read.parquet(args.edges).toPandas()
        nodes = spark.read.parquet(args.nodes).toPandas()
        net = Network(edges, nodes, cfg)
        pages = spark.read.parquet(args.pages)

    if args.work_dir:
        runner = StageRunner(spark, args.work_dir)
        fingerprint = f"{args.pages}|{args.edges}|{cfg}"
        matched = runner.bucketed_stage(
            "matched", fingerprint, pages,
            lambda subset: match_pages(spark, subset, net, cfg), key="url")
    else:
        matched = match_pages(spark, pages, net, cfg)

    matched.write.mode("overwrite").parquet(args.out)
    print(f"wrote {spark.read.parquet(args.out).count()} matched rows to {args.out}")


if __name__ == "__main__":
    sys.exit(main())
