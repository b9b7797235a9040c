"""Post-match evaluation operators (SURVEY.md §2.11 + §3.3).

* eval_similarity — per-url lcss/edr/erp between the matched path geometry
  and the raw trajectory, both resampled every `resample` meters
  (ST_Matching.eval, /root/reference/mapmatching/matching.py:194-222);
  the matched path geometry applies the step_0/step_n fractional cuts of
  transform_mathching_res_2_path (postprocess.py:99-123).
* eval_precision — exact-sequence corpus precision vs gold vpaths
  (/root/reference/eval.py:26-59) as one DataFrame job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import MatchConfig
from ..graph.network import Network
from ..kernels import metrics as M
from ..kernels.hmm import path_coords_from_epath


def cut_path_by_fractions(coords_list: list[np.ndarray], step_0: float, step_n: float) -> np.ndarray:
    """Apply fractional first/last-edge cuts and stitch the path geometry."""
    def cut(coords, f0, f1):
        out = M.resample_polyline(coords, step=1e18, keep_last=True)  # dedup only
        seg = np.linalg.norm(out[1:] - out[:-1], axis=1)
        total = seg.sum()
        if total == 0:
            return out
        s = np.concatenate([[0.0], np.cumsum(seg)])
        lo, hi = f0 * total, f1 * total
        xs = np.interp([lo, hi], s, out[:, 0])
        ys = np.interp([lo, hi], s, out[:, 1])
        mid = out[(s > lo) & (s < hi)]
        return np.concatenate([[[xs[0], ys[0]]], mid, [[xs[1], ys[1]]]])

    if len(coords_list) == 1:
        return cut(coords_list[0], step_0, step_n)
    first = cut(coords_list[0], step_0, 1.0)
    last = cut(coords_list[-1], 0.0, step_n)
    middle = [c for c in coords_list[1:-1]]
    parts = [first] + middle + [last]
    out = [parts[0]]
    for p in parts[1:]:
        out.append(p[1:] if len(p) > 1 and np.allclose(p[0], out[-1][-1]) else p)
    return np.concatenate(out)


def eval_similarity(spark: SparkSession, matched: DataFrame, points: DataFrame,
                    net: Network, cfg: MatchConfig, metric: str = "lcss",
                    resample: float = 5.0, eps: float = 10.0) -> DataFrame:
    """-> (url, metric_value) for successfully matched urls."""
    assert metric in ("lcss", "edr", "erp")
    bc = spark.sparkContext.broadcast(net.edge_coords)

    def fn(key, mt: pd.DataFrame, pts: pd.DataFrame) -> pd.DataFrame:
        url = key[0]
        if mt.empty or pts.empty:
            return pd.DataFrame({"url": [], "metric_value": []})
        row = mt.iloc[0]
        if row.epath is None or row.status not in (0, 1):
            return pd.DataFrame({"url": [], "metric_value": []})
        geoms = bc.value
        coords_list = [np.asarray(geoms[int(e)]) for e in row.epath]
        s0 = 0.0 if not np.isfinite(row.step_0) else float(row.step_0)
        sn = 1.0 if not np.isfinite(row.step_n) else float(row.step_n)
        path = cut_path_by_fractions(coords_list, s0, sn)
        traj = pts.sort_values("pid")[["x", "y"]].to_numpy()
        p_r = M.resample_polyline(path, resample)
        t_r = M.resample_polyline(traj, resample)
        if metric == "lcss":
            v = M.lcss(t_r, p_r, eps)
        elif metric == "edr":
            v = M.edr(t_r, p_r, eps)
        else:
            v = M.erp(t_r, p_r, np.zeros(2))
        return pd.DataFrame({"url": [url], "metric_value": [float(v)]})

    return (matched.groupBy("url")
            .cogroup(points.groupBy("url"))
            .applyInPandas(fn, schema="url string, metric_value double"))


def eval_precision(matched: DataFrame, gold: DataFrame, net: Network,
                   spark: SparkSession) -> DataFrame:
    """Exact vpath equality vs gold (eval.py:41-55) -> one-row DataFrame
    (n, hits, precision)."""
    src = spark.createDataFrame(
        pd.DataFrame({"eid": list(net.edge_src), "e_src": list(net.edge_src.values()),
                      "e_dst": [net.edge_dst[e] for e in net.edge_src]}))
    e = (matched.filter(F.col("epath").isNotNull())
         .select("url", F.posexplode("epath").alias("pos", "eid"))
         .join(F.broadcast(src), "eid"))
    vpath = (e.groupBy("url")
             .agg(F.sort_array(F.collect_list(F.struct("pos", "e_src", "e_dst"))).alias("s"))
             .select("url",
                     F.concat(F.transform("s", lambda x: x.e_src),
                              F.slice(F.transform("s", lambda x: x.e_dst), -1, 1)).alias("vpath")))
    j = vpath.join(gold, "url")
    return j.agg(F.count("*").alias("n"),
                 F.sum(F.when(F.col("vpath") == F.col("gold_vpath"), 1).otherwise(0)).alias("hits")) \
            .withColumn("precision", F.col("hits") / F.col("n"))
