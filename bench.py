#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`python bench.py --scaling` additionally runs the same job at local[8] and
local[32] (the sandbox proxy for N vs 4N executors) and writes
BENCH/BASELINE.md with both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEADLINE = [
    "match_grid",        # flagship: full extract->HMM->Viterbi pipeline
    "geo_knn_edges",     # core cell-cover kNN spatial join
    "geo_pip_tiles",     # point-in-polygon tile assignment
    "geo_cell_assign",   # raster aggregation
    "rel_agg_pricing",   # wide agg
    "rel_topk_orders",   # window top-k
    "dedup_minhash",     # MinHash LSH near-dup
    "sim_cosine_topk",   # brute-force ANN baseline
]


def run_once(sf_dir: str, cpus: str) -> dict:
    from st_mapmatching_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(cores=cpus, app=f"bench-{cpus}")
    qs = entry.queries()

    # tiny warm-up: JIT, Arrow init, broadcast machinery
    qs["geo_cell_assign"](spark, "/root/testdata/sf0.001").count()

    times, counts = {}, {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        counts[name] = qs[name](spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    n_trajs = qs["match_grid"](spark, sf_dir).select("url").distinct().count()
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0),
        "cpus": int(cpus) if str(cpus).isdigit() else cpus,
        "rows": counts,
        "trajs_per_sec": round(n_trajs / times["match_grid"], 2),
        "tile_assignments_per_sec": round(counts["geo_pip_tiles"] / times["geo_pip_tiles"], 2),
    }
    spark.stop()
    return out


def main():
    if "--scaling" in sys.argv:
        results = {}
        for cpus in ("8", "32"):
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
            env.pop("_BENCH_SCALING", None)
            p = subprocess.run([sys.executable, __file__], env=env,
                               capture_output=True, text=True, check=True)
            results[cpus] = json.loads(p.stdout.strip().splitlines()[-1])
        t8, t32 = results["8"]["value"], results["32"]["value"]
        tp8, tp32 = results["8"]["trajs_per_sec"], results["32"]["trajs_per_sec"]
        eff = (t8 / t32) / 4.0           # ideal 4x speedup -> efficiency 1.0
        tp_eff = (tp32 / tp8) / 4.0
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write("# BENCH — measured throughput + scaling\n\n")
            f.write(f"Input: {os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')}; "
                    "identical input at both parallelism levels "
                    "(local[8] vs local[32] = sandbox proxy for N vs 4N executors).\n\n")
            f.write("| cores | suite sec | trajs/sec | tile-assign/sec |\n|---|---|---|---|\n")
            for c in ("8", "32"):
                r = results[c]
                f.write(f"| {c} | {r['value']} | {r['trajs_per_sec']} | "
                        f"{r['tile_assignments_per_sec']} |\n")
            f.write(f"\nSuite-time scaling efficiency (8->32 cores): **{eff:.3f}**\n")
            f.write(f"Matching-throughput scaling efficiency: **{tp_eff:.3f}**\n\n")
            f.write("Per-query seconds:\n\n| query | 8 cores | 32 cores | speedup |\n|---|---|---|---|\n")
            for q in HEADLINE:
                a, b = results["8"]["queries"][q], results["32"]["queries"][q]
                f.write(f"| {q} | {a} | {b} | {a / max(b, 1e-9):.2f}x |\n")
        print(json.dumps({"metric": "scaling_efficiency", "value": round(eff, 3),
                          "unit": "ratio", "queries": results["32"]["queries"],
                          "sf": results["32"]["sf"], "detail": results}))
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    print(json.dumps(run_once(sf_dir, cpus)))


if __name__ == "__main__":
    main()
