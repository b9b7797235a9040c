"""The map-matching pipeline: transition pairs -> flags -> shortest-path
attach -> scoring -> per-trajectory beam Viterbi.

Stage map (Spark lifecycle of ST_Matching.matching, SURVEY.md §3.1):
  pairs  : layer self-join of the candidate table — pure DataFrame joins
           (candidatesGraph.py:117-166 at table granularity)
  flags  : F.when column arithmetic (candidatesGraph.py:58-114)
  sp     : broadcast-adjacency Dijkstra fan-out + equi-join back
  scores : one Arrow pass with the shared numpy kernel (dist/temporal/
           dir/trans probs, spatialAnalysis.py:10-151); when
           dir_trans=False the whole scoring stays JVM-side
  viterbi: cogrouped applyInPandas keyed by url — the only genuinely
           sequential state (viterbi.py:107-154)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import MatchConfig
from ..functions.geo_cols import bearing_col
from ..graph.network import Network
from ..kernels import hmm
from .candidates import candidate_join, extract_trajs, network_frames, simplify_trajs
from .shortest_paths import shortest_path_table

MATCHED_SCHEMA = ("url string, status int, epath array<long>, step_0 double, "
                  "step_n double, dist double, avg_speed double, prob double, "
                  "norm_prob double, dist_prob double, trans_prob double, dir_prob double")

# no `epath` here: nested arrays through Arrow cost ~10x the rest of the
# row combined (measured); stitch fetches paths from the broadcast sp map
SCORED_COLS = ["url", "pid_0", "pid_1", "eid_0", "eid_1", "flag", "observ_prob",
               "trans_prob", "dist_prob", "dir_prob", "d_sht", "avg_speed",
               "o_node", "d_node"]


def build_pairs_df(cands: DataFrame, points: DataFrame, cfg: MatchConfig) -> DataFrame:
    """Consecutive-layer Cartesian product + flag identification + straight
    -line params, all relational. Geometry stays out of the row: the step
    cuts are carried as (eid, seg_idx, ratio) and re-materialized from the
    broadcast network inside the scoring Arrow pass."""
    left = cands.select(
        "url", F.col("pid").alias("pid_0"), F.col("eid").alias("eid_0"),
        F.col("dist").alias("dist_0"), F.col("speed").alias("speed_0"),
        "dst", F.col("len1").alias("step_0_len"), F.col("len0").alias("left_len0"),
        F.col("seg_idx").alias("seg_idx_0"), F.col("ratio").alias("ratio_0"))

    right = cands.select(
        "url", F.col("pid").alias("pid_1"), F.col("eid").alias("eid_1"),
        F.col("dist").alias("dist_1"), F.col("speed").alias("speed_1"),
        "src", F.col("len0").alias("step_n_len"),
        F.col("seg_idx").alias("seg_idx_1"), F.col("ratio").alias("ratio_1"),
        "observ_prob")

    # consecutive candidate layers (pids that HAVE candidates), with the
    # straight-line distance/heading between them (candidatesGraph.py:137-160)
    layer_pts = cands.select("url", "pid").distinct().join(points, ["url", "pid"])
    w = Window.partitionBy("url").orderBy("pid")
    link = (layer_pts
            .withColumn("pid_1", F.lead("pid").over(w))
            .withColumn("x1", F.lead("x").over(w))
            .withColumn("y1", F.lead("y").over(w))
            .filter(F.col("pid_1").isNotNull())
            .select("url", F.col("pid").alias("pid_0"), "pid_1",
                    F.hypot(F.col("x1") - F.col("x"), F.col("y1") - F.col("y")).alias("d_euc"),
                    bearing_col(F.col("x"), F.col("y"), F.col("x1"), F.col("y1")).alias("move_dir")))

    gt = (left.join(link, ["url", "pid_0"])
              .join(right, ["url", "pid_1"]))

    # ---- flag identification (candidatesGraph.py:58-114), pure columns ----
    eps_d, eps_r = cfg.flag_dist_eps, cfg.flag_ratio_eps
    offset_0 = F.col("dist_0") - F.col("step_0_len")
    cond_1 = offset_0 <= F.col("step_n_len")
    relaxed = F.least(F.greatest(F.lit(0.0), offset_0 - eps_d), offset_0 * (1.0 - eps_r))
    cond = relaxed <= F.col("step_n_len")
    approx = cond & (~cond_1)
    same = F.col("eid_0") == F.col("eid_1")

    gt = (gt.withColumn("approx", approx)
            .withColumn("flag", F.when(same & cond, hmm.FLAG_SAME_SRC_FIRST)
                                 .when(same & (~cond), hmm.FLAG_SAME_SRC_LAST)
                                 .otherwise(hmm.FLAG_NORMAL).cast("int"))
            .withColumn("step_n_len", F.when(F.col("approx"), F.col("left_len0")).otherwise(F.col("step_n_len")))
            .withColumn("o_node", F.when(F.col("flag") == hmm.FLAG_SAME_SRC_FIRST, F.col("src")).otherwise(F.col("dst")))
            .withColumn("d_node", F.when(F.col("flag") == hmm.FLAG_SAME_SRC_FIRST, F.col("dst")).otherwise(F.col("src")))
            .drop("left_len0"))
    return gt


def score_pairs_df(spark: SparkSession, pairs: DataFrame, sp: DataFrame,
                   net: Network, cfg: MatchConfig, broadcast_sp: bool = True) -> DataFrame:
    """Attach shortest paths (equi-join on the precomputed table — the
    distributed version of the reference's search memo) and compute the
    transition probabilities with the shared kernel in one Arrow pass.

    broadcast_sp=True keeps the pair table's url partitioning intact (the
    demand-driven sp table is bounded by the trajectory corridor, so it is
    broadcastable for city/regional networks); set False at planet scale
    to shuffle on (o_node, d_node) instead."""
    sp_slim = sp.select("o_node", "d_node", "cost", "path_speed",
                        "pcx", "pcy", "pw", "pn",
                        F.coalesce(F.size("epath"), F.lit(0)).alias("path_len"))
    sp_side = F.broadcast(sp_slim) if broadcast_sp else sp_slim
    joined = (pairs.join(sp_side, ["o_node", "d_node"], "left")
              .withColumn("cost", F.coalesce(F.col("cost"), F.lit(float("inf"))))
              .withColumn("path_speed", F.coalesce(F.col("path_speed"), F.lit(0.0)))
              .withColumn("pcx", F.coalesce(F.col("pcx"), F.lit(0.0)))
              .withColumn("pcy", F.coalesce(F.col("pcy"), F.lit(0.0)))
              .withColumn("pw", F.coalesce(F.col("pw"), F.lit(0.0)))
              .withColumn("pn", F.coalesce(F.col("pn"), F.lit(0)))
              .withColumn("path_len", F.coalesce(F.col("path_len"), F.lit(0))))

    bc = spark.sparkContext.broadcast(net.dir_stats())
    dir_trans = cfg.dir_trans

    schema = ("url string, pid_0 int, pid_1 int, eid_0 long, eid_1 long, flag int, "
              "observ_prob double, trans_prob double, dist_prob double, dir_prob double, "
              "d_sht double, avg_speed double, o_node long, d_node long")

    def op(batches):
        from ..kernels.dir_stats import dir_prob_from_stats
        from ..kernels.geodesy import bearing_deg
        stats = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            scored = hmm.score_base(pdf.copy(), cfg)
            if not dir_trans:
                scored["dir_prob"] = np.nan
                scored["trans_prob"] = scored.dist_prob
            else:
                e0 = scored.eid_0.to_numpy()
                i0 = scored.seg_idx_0.to_numpy()
                r0 = scored.ratio_0.to_numpy()
                ap = scored.approx.to_numpy()
                # the step_n source edge/cut: cand_0's own head cut after
                # the approx-point reset, else cand_1's head cut
                en = np.where(ap, e0, scored.eid_1.to_numpy())
                i_n = np.where(ap, i0, scored.seg_idx_1.to_numpy())
                rn = np.where(ap, r0, scored.ratio_1.to_numpy())

                cx0, cy0, w0, n0, p0 = stats.tail_cut_stats(e0, i0, r0)
                cxn, cyn, wn, nn, pn_ = stats.head_cut_stats(en, i_n, rn)
                # path presence via the slim path_len column (flag-1 rows
                # drop the path entirely via the override below)
                has_path = scored.path_len.to_numpy() > 0
                pcx = scored.pcx.to_numpy(); pcy = scored.pcy.to_numpy()
                pw = scored.pw.to_numpy(); pn_path = scored.pn.to_numpy()

                # real joint segment step_0 -> step_n when the path is absent
                jfrom = stats.vertex(e0, first=False)
                jto = stats.vertex(en, first=True)
                jdx = jto[:, 0] - jfrom[:, 0]
                jdy = jto[:, 1] - jfrom[:, 1]
                jlen = np.hypot(jdx, jdy)
                jb = np.radians(bearing_deg(jfrom[:, 0], jfrom[:, 1], jto[:, 0], jto[:, 1]))
                flag1 = scored.flag.to_numpy() == hmm.FLAG_SAME_SRC_FIRST
                jreal = p0 & pn_ & (~has_path) & (~flag1)

                parts = (p0.astype(np.int64) + pn_.astype(np.int64)
                         + has_path.astype(np.int64))
                n_joints = np.maximum(parts - 1, 0)
                cx = (np.where(p0, cx0, 0.0) + np.where(has_path, pcx, 0.0)
                      + np.where(pn_, cxn, 0.0) + np.where(jreal, jlen * np.cos(jb), 0.0))
                cy = (np.where(p0, cy0, 0.0) + np.where(has_path, pcy, 0.0)
                      + np.where(pn_, cyn, 0.0) + np.where(jreal, jlen * np.sin(jb), 0.0))
                w = (np.where(p0, w0, 0.0) + np.where(has_path, pw, 0.0)
                     + np.where(pn_, wn, 0.0) + np.where(jreal, jlen, 0.0))
                n = (np.where(p0, n0, 0) + np.where(has_path, pn_path, 0)
                     + np.where(pn_, nn, 0) + n_joints)

                # flag-1: geometry is step_n alone (and only when step_0
                # exists) — the reference's get_shared_line behavior
                cx = np.where(flag1, cxn, cx)
                cy = np.where(flag1, cyn, cy)
                w = np.where(flag1, wn, w)
                n = np.where(flag1, nn, n)
                present = np.where(flag1, p0 & pn_, parts > 0)

                scored["dir_prob"] = dir_prob_from_stats(
                    scored.move_dir.to_numpy(dtype=np.float64), cx, cy, w, n, present)
                scored["trans_prob"] = scored.dist_prob * scored.dir_prob

            yield scored[SCORED_COLS]

    return joined.mapInPandas(op, schema=schema)


def viterbi_match(cands: DataFrame, scored: DataFrame, cfg: MatchConfig,
                  sp_paths) -> DataFrame:
    """Cogrouped per-trajectory beam Viterbi + path stitch (the stateful
    core, viterbi.py:107-154 + postprocess.py:13-97).

    ``sp_paths`` is a broadcast dict {(o_node, d_node): epath list} — paths
    are resolved only for the <=L winning steps per trajectory instead of
    shipping nested arrays through the cogroup shuffle."""
    cands_min = cands.select("url", "pid", "eid", "src", "dst",
                             "dist_p2c", "observ_prob", "len0", "len1")
    dir_trans = cfg.dir_trans

    def fn(key, cpdf: pd.DataFrame, gpdf: pd.DataFrame) -> pd.DataFrame:
        url = key[0]
        base = {"url": url, "status": hmm.STATUS_NO_CANDIDATES, "epath": None,
                "step_0": np.nan, "step_n": np.nan, "dist": np.nan,
                "avg_speed": np.nan, "prob": np.nan, "norm_prob": np.nan,
                "dist_prob": np.nan, "trans_prob": np.nan, "dir_prob": np.nan}
        if len(cpdf) == 0:
            return pd.DataFrame([base])
        if cpdf.pid.nunique() == 1:
            # single matched layer -> nearest edge (matching.py:170-178)
            best = cpdf.sort_values(["dist_p2c", "eid"]).iloc[0]
            base.update(status=hmm.STATUS_ONE_POINT, epath=[int(best.eid)])
            return pd.DataFrame([base])
        paths = sp_paths.value
        end_prob, rlist = hmm.viterbi_beam(cpdf, gpdf, cfg)
        res = hmm.stitch_path(rlist, gpdf, cpdf, end_prob, cfg, dir_trans,
                              epath_lookup=lambda o, d: paths.get((o, d)))
        base.update(res)
        return pd.DataFrame([base])

    return (cands_min.groupBy("url")
            .cogroup(scored.groupBy("url"))
            .applyInPandas(fn, schema=MATCHED_SCHEMA))


def match_pages(spark: SparkSession, pages: DataFrame, net: Network,
                cfg: MatchConfig = MatchConfig(), broadcast_index: bool = True) -> DataFrame:
    """pages -> matched, one row per url (SURVEY.md §1.2 result schema).

    Urls whose trajectories produce no candidates anywhere (including
    out-of-bbox, status 3) are re-attached via a left-anti join — the
    engine's non-throwing version of the reference's bbox assert
    (matching.py:155-168)."""
    trajs = extract_trajs(pages)
    points = simplify_trajs(trajs, cfg).persist()
    cell_index, edge_attrs = network_frames(spark, net)
    cands = candidate_join(points, cell_index, edge_attrs, cfg, broadcast_index).persist()

    pairs = build_pairs_df(cands, points, cfg).persist()
    demands = pairs.select("o_node", "d_node")
    sp = shortest_path_table(spark, demands, net, cfg).persist()
    scored = score_pairs_df(spark, pairs, sp, net, cfg)

    # demand-bounded path map for stitch (the sp table is already collected
    # for the broadcast join; at planet scale swap for a post-Viterbi
    # relational epath attach instead)
    sp_paths = spark.sparkContext.broadcast({
        (int(r.o_node), int(r.d_node)): list(r.epath) if r.epath is not None else None
        for r in sp.select("o_node", "d_node", "epath")
                   .filter(F.col("epath").isNotNull()).collect()})

    matched = viterbi_match(cands, scored, cfg, sp_paths)

    # matched urls == candidate urls (cogroup keys), so anti-join against
    # the *persisted* cands — referencing `matched` here would make the
    # expensive cogroup branch compute twice per action
    no_cands = (points.select("url").distinct()
                .join(cands.select("url"), "url", "left_anti")
                .select("url",
                        F.lit(hmm.STATUS_NO_CANDIDATES).alias("status"),
                        F.lit(None).cast("array<long>").alias("epath"),
                        *[F.lit(None).cast("double").alias(c) for c in
                          ("step_0", "step_n", "dist", "avg_speed", "prob",
                           "norm_prob", "dist_prob", "trans_prob", "dir_prob")]))
    return matched.unionByName(no_cands)
