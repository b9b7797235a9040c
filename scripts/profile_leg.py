#!/usr/bin/env python
"""Per-stage profile of one north-rule scaling leg.

Runs the same timed window as bench.run_scaling_leg (warm-up + timed
match_pages), then pulls stage metrics from the live Spark UI REST API and
reports, for every stage submitted inside the timed window:

  - wall  : stage completionTime - firstTaskLaunchedTime (critical-path sec)
  - cpu   : executorRunTime (task-seconds; / cores = ideal wall)
  - tasks : task count (parallelism ceiling)

plus the DRIVER GAP: timed-window seconds not covered by any running stage
(serial driver work — planning, AQE re-opt, toPandas builds, broadcasts).
The stage whose wall-time refuses to shrink 2 -> 8 cores, or a large driver
gap, is the input-proportional serial component F observed in
BENCH/scaling_r05_summary.json (F ~ 30 s @ x64, ~79 s @ x128).

Usage: python scripts/profile_leg.py <cores> <mult>
"""
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def api(path):
    with urllib.request.urlopen("http://localhost:4040/api/v1" + path) as r:
        return json.load(r)


def main(cores: str, mult: int):
    import __spark_entry__ as entry
    from st_mapmatching_spark.operators.matching import match_pages
    from st_mapmatching_spark.session import get_spark
    from st_mapmatching_spark.sources import derived as D

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(cores=cores, app=f"profile-leg-{cores}")
    points = D.replicate_points(D.derive_points(spark, sf_dir), mult)
    # tasks-per-core of the materialized input: on a real cluster input
    # parallelism comes from file splits (many per core); locally the
    # render shuffle coalesces to ~core count, leaving zero straggler
    # slack at 1 task/core. SPARK_GRAFT_TPC mirrors the cluster layout.
    tpc = int(os.environ.get("SPARK_GRAFT_TPC", "0"))
    pages = entry._render_pages(points)
    if tpc:
        pages = pages.repartition(tpc * int(cores))
    pages = pages.persist()
    n_trajs = pages.count()

    df = match_pages(spark, pages, entry._net(), entry.CFG)
    df.count(); df.unpersist()                       # warm-up

    wall0 = time.time()
    t0 = time.perf_counter()
    df = match_pages(spark, pages, entry._net(), entry.CFG)
    df.count()
    t_match = time.perf_counter() - t0
    wall1 = time.time()
    df.unpersist()

    def ms(s):  # REST timestamps like '2026-08-17T12:00:00.123GMT'
        return time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S"))

    app_id = api("/applications")[0]["id"]
    stages = api(f"/applications/{app_id}/stages?status=complete")
    rows, intervals = [], []
    for st in stages:
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        comp = st.get("completionTime")
        if not sub or not comp:
            continue
        t_sub, t_comp = ms(sub), ms(comp)
        if t_comp < wall0 or t_sub > wall1:
            continue
        rows.append({
            "stage": st["stageId"],
            "name": st["name"].split("\n")[0][:70],
            "tasks": st["numTasks"],
            "wall_s": round(t_comp - t_sub, 1),
            "run_task_s": round(st["executorRunTime"] / 1000.0, 1),
            "cpu_task_s": round(st["executorCpuTime"] / 1e9, 1),
            "gc_s": round(st["jvmGcTime"] / 1000.0, 1),
            "shuf_r_mb": round(st["shuffleReadBytes"] / 1e6, 1),
            "shuf_w_mb": round(st["shuffleWriteBytes"] / 1e6, 1),
            "in_mb": round(st["inputBytes"] / 1e6, 1),
            "out_mb": round(st["outputBytes"] / 1e6, 1),
            "spill_mb": round((st["memoryBytesSpilled"]
                               + st["diskBytesSpilled"]) / 1e6, 1),
            "where": [ln for ln in st.get("details", "").splitlines()
                      if "st_mapmatching_spark" in ln or "__spark_entry__" in ln][:3],
        })
        intervals.append((max(t_sub, wall0), min(t_comp, wall1)))

    intervals.sort()
    covered, cur_s, cur_e = 0.0, None, None
    for s, e in intervals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    gap = (wall1 - wall0) - covered

    rows.sort(key=lambda r: -r["wall_s"])
    out = {"cores": int(cores), "mult": mult, "n_trajs": n_trajs,
           "match_sec": round(t_match, 2),
           "stage_covered_sec": round(covered, 1),
           "driver_gap_sec": round(gap, 1),
           "stages": rows[:15]}
    print(json.dumps(out, indent=1))
    with open(os.path.join(REPO, "BENCH", f"profile_leg_{cores}c_x{mult}.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
