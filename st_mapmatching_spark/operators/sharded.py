"""Region-sharded one-pass matching: the shuffle-free single-crossing plan
(match_pages_onepass) extended past the global broadcast/memo cap by
partitioning the NETWORK into coarse region tiles and broadcasting one
compact payload per region — cell index, geometry/attr arrays, direction
stats, and a euclid-bounded shortest-path cost table — keyed by region.
Pages stay wherever they are (no shuffle): the kernel derives each
trajectory's region from its FIRST point and looks the payload up in the
broadcast dict, so the whole matcher is still one narrow Arrow stage.

The reference has no analogue (its A* memo is a single-process dict,
/root/reference/mapmatching/graph/astar.py:70-72); this is the
distributed answer to "the planet network does not fit one broadcast, but
any region does".

Exactness invariants (each falls back to the staged path when violated,
never silently degrades):

* REGION ASSIGNMENT uses the trajectory's first extracted point — the one
  point Douglas-Peucker always keeps — so the driver's regions-present
  job (a JVM regexp over the first GEO line, identical float ops) and the
  kernel agree bitwise on the region key.
* GUARD A (candidate coverage): the simplified trajectory's bbox dilated
  by the search radius must fit the region's CORE box (tile ± cover_pad).
  Candidate edges then all lie inside the core subnetwork.
* GUARD B (sp coverage): every consecutive-layer sp demand (o, d)
  satisfies euclid(o, d) <= step + 2*(radius + longest core edge); the
  payload precomputes ALL core-node pairs with euclid <= sp_pair_max, so
  requiring step <= sp_pair_max - 2*(radius + max_edge_len) guarantees
  every demanded pair is present — a payload miss therefore can only mean
  UNREACHABLE (cost inf), exactly the staged path's semantics.
* DIJKSTRA PARITY: payload costs/stats come from bounded Dijkstra on the
  region's EXPANDED subnetwork (core padded by margin >= radius +
  max_dist/2 + slack). Any path of cost <= max_dist between core nodes
  stays within max_dist/2 of one endpoint (d(o,p) + d(p,d) <= cost), so
  the expanded graph contains every node that can relax a node on such a
  path — costs, tie-breaks ((cost, node) heap order) and therefore
  epaths are IDENTICAL to the full-network Dijkstra. Winning-step epaths
  are reconstructed in-kernel by the same bounded_dijkstra on the same
  expanded adjacency (only for the <= n_points winning steps per
  trajectory, so path storage never rides in the payload).

Scale envelope: payload rows ~= region_nodes x pairs_within(sp_pair_max);
on real road networks (node spacing >= 100 m) with sp_pair_max ~1 km this
is tens of pairs per node. The synthetic 250 m uniform grid used by the
bench is denser than any real city; payload_max_rows fails closed with
sizing guidance rather than silently OOMing the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import M_PER_DEG, MatchConfig
from ..graph.dijkstra import _epath, bounded_dijkstra, shortest_paths_to_targets
from ..graph.network import Network
from ..kernels import hmm
from ..kernels.cells import xy_to_cell

_SP_COLS = ["o_node", "d_node", "cost", "path_speed", "pcx", "pcy", "pw",
            "pn", "has_path"]
_SP_SCHEMA = ("region long, o_node long, d_node long, cost double, "
              "path_speed double, pcx double, pcy double, pw double, "
              "pn int, has_path boolean")


def _region_key(rx: np.ndarray, ry: np.ndarray) -> np.ndarray:
    """Composite region id (same packing as the cell encoding)."""
    return (np.asarray(rx, np.int64) + (1 << 25)) * (1 << 26) \
        + (np.asarray(ry, np.int64) + (1 << 25))


class RegionSpPayload:
    """SpPayload twin backed by cost/stat columns only: epaths are
    reconstructed on demand by bounded Dijkstra over the region's expanded
    adjacency (exact — see module invariants). Keeps path storage out of
    the broadcast payload entirely."""

    __slots__ = ("o_u", "d_u", "key", "cost", "path_speed", "pcx", "pcy",
                 "pw", "pn", "has_path_a", "adj", "max_dist")

    def __init__(self, sp_pdf: pd.DataFrame, adj: dict, max_dist: float):
        o = sp_pdf.o_node.to_numpy(np.int64)
        d = sp_pdf.d_node.to_numpy(np.int64)
        self.o_u = np.unique(o)
        self.d_u = np.unique(d)
        key = (np.searchsorted(self.o_u, o).astype(np.int64) * len(self.d_u)
               + np.searchsorted(self.d_u, d))
        order = np.argsort(key)
        self.key = key[order]
        for c in ("cost", "path_speed", "pcx", "pcy", "pw"):
            setattr(self, c, sp_pdf[c].to_numpy(np.float64)[order])
        self.pn = sp_pdf.pn.to_numpy(np.int64)[order]
        self.has_path_a = sp_pdf.has_path.to_numpy(bool)[order]
        self.adj = adj
        self.max_dist = max_dist

    # -- SpPayload interface ------------------------------------------
    @property
    def has_path(self):
        return self.has_path_a

    def locate(self, o_node: np.ndarray, d_node: np.ndarray):
        n = len(self.key)
        if n == 0:
            z = np.zeros(len(o_node), dtype=np.int64)
            return z, np.zeros(len(o_node), dtype=bool)
        o_r = np.searchsorted(self.o_u, o_node)
        d_r = np.searchsorted(self.d_u, d_node)
        o_ok = (o_r < len(self.o_u)) & (self.o_u[np.minimum(o_r, len(self.o_u) - 1)] == o_node)
        d_ok = (d_r < len(self.d_u)) & (self.d_u[np.minimum(d_r, len(self.d_u) - 1)] == d_node)
        key_q = o_r * len(self.d_u) + d_r
        pos = np.searchsorted(self.key, key_q)
        hit = o_ok & d_ok & (pos < n) & (self.key[np.minimum(pos, n - 1)] == key_q)
        return np.minimum(pos, n - 1), hit

    def epath_of(self, o: int, d: int):
        if o == d:
            return None
        cost, prev, settled = bounded_dijkstra(self.adj, int(o),
                                               self.max_dist, {int(d)})
        if int(d) not in settled:
            return None
        ep = _epath(prev, int(d))
        return ep if ep else None


def _build_region_payloads(spark: SparkSession, net: Network,
                           cfg: MatchConfig, regions: list[tuple[int, int]],
                           region_m: float, cover_pad: float,
                           sp_pair_max: float, margin: float,
                           payload_max_rows: int) -> dict:
    """One payload per region: core subnetwork arrays + euclid-bounded sp
    cost table computed by ONE Spark job across all regions (demands keyed
    by region, per-region expanded adjacency in a single broadcast)."""
    cores, exp_adjs, demands = {}, {}, []
    total_rows = 0
    for rx, ry in regions:
        cx0, cy0 = rx * region_m, ry * region_m
        core_box = (cx0 - cover_pad, cy0 - cover_pad,
                    cx0 + region_m + cover_pad, cy0 + region_m + cover_pad)
        core = net.subnetwork(*core_box)
        rkey = int(_region_key(np.array([rx]), np.array([ry]))[0])
        if len(core.edges) == 0:
            cores[rkey] = None
            continue
        exp = net.subnetwork(core_box[0] - margin, core_box[1] - margin,
                             core_box[2] + margin, core_box[3] + margin)
        max_edge_len = float(core.edges.dist.max())
        if sp_pair_max <= 2 * (cfg.radius + max_edge_len):
            raise ValueError(
                f"sp_pair_max={sp_pair_max} m cannot cover any step: "
                f"2*(radius + longest core edge) = "
                f"{2 * (cfg.radius + max_edge_len)} m — raise sp_pair_max")
        nids, nxy = core.node_xy_arrays()
        # all core-node pairs within sp_pair_max (chunked O(n^2) masks) +
        # every core edge's (src, dst) (the SAME_SRC_FIRST swap demand)
        prs = []
        for s in range(0, len(nids), 1024):
            dx = nxy[s:s + 1024, 0][:, None] - nxy[None, :, 0]
            dy = nxy[s:s + 1024, 1][:, None] - nxy[None, :, 1]
            ii, jj = np.nonzero(dx * dx + dy * dy <= sp_pair_max * sp_pair_max)
            prs.append((nids[ii + s], nids[jj]))
        o = np.concatenate([p[0] for p in prs])
        d = np.concatenate([p[1] for p in prs])
        o = np.concatenate([o, core.edges.src.to_numpy(np.int64)])
        d = np.concatenate([d, core.edges.dst.to_numpy(np.int64)])
        dem = pd.DataFrame({"region": np.full(len(o), rkey, np.int64),
                            "o_node": o, "d_node": d}).drop_duplicates()
        total_rows += len(dem)
        if total_rows > payload_max_rows:
            raise ValueError(
                f"region sp payloads exceed payload_max_rows="
                f"{payload_max_rows} (at region ({rx},{ry}): {total_rows} "
                "rows so far) — shrink region_m/cover_pad/sp_pair_max or "
                "raise the cap; a silent multi-GB broadcast would stall "
                "every executor")
        demands.append(dem)
        exp_adjs[rkey] = (exp.adj, exp.edge_speed, exp.edge_dist,
                          exp.dir_stats().edge_totals())
        ci = (core.cell_index(pad=max(net.cfg.radius, cfg.radius))
              .sort_values(["cell", "eid"], kind="stable"))
        cores[rkey] = {
            "geom": (*core.padded_geoms(), *core.attr_arrays()),
            "stats": (core.dir_stats(), core.node_xy_arrays()),
            "cells": (ci.cell.to_numpy(), ci.eid.to_numpy()),
            "core_box": core_box,
            "max_edge_len": max_edge_len,
        }

    # one sp job over every region's demands
    if demands:
        dem_df = spark.createDataFrame(pd.concat(demands, ignore_index=True))
        adj_bc = spark.sparkContext.broadcast(exp_adjs)
        max_dist = cfg.max_dist
        n_groups = max(int(spark.conf.get("spark.sql.shuffle.partitions",
                                          "32")) * 4, 32)

        def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
            adjs = adj_bc.value
            out = []
            for (rk, o_), sub in pdf.groupby(["region", "o_node"], sort=False):
                adj, espeed, edist, etot = adjs[int(rk)]
                rows = shortest_paths_to_targets(
                    adj, int(o_), sub.d_node.unique().tolist(),
                    max_dist, espeed, edist, etot)
                for r in rows:
                    ep = r.pop("epath")
                    r["has_path"] = ep is not None and len(ep) > 0
                    r["region"] = int(rk)
                out.extend(rows)
            return pd.DataFrame(out, columns=["region"] + _SP_COLS)

        sp_all = (dem_df
                  .withColumn("_grp", F.pmod(F.xxhash64("region", "o_node"),
                                             F.lit(n_groups)))
                  .groupBy("_grp")
                  .applyInPandas(per_group, schema=_SP_SCHEMA)
                  .toPandas())
        for rkey, grp in sp_all.groupby("region"):
            if cores.get(int(rkey)) is not None:
                adj = exp_adjs[int(rkey)][0]
                cores[int(rkey)]["spd"] = RegionSpPayload(
                    grp.reset_index(drop=True), adj, cfg.max_dist)
    return cores


def match_pages_sharded(spark: SparkSession, pages: DataFrame, net: Network,
                        cfg: MatchConfig = MatchConfig(),
                        region_m: float = 10_000.0,
                        cover_pad: float = 4_000.0,
                        sp_pair_max: float = 1_300.0,
                        margin: float | None = None,
                        payload_max_rows: int = 20_000_000) -> DataFrame:
    """match_pages semantics over a network too big for one global
    broadcast: single-crossing regional kernel + staged-path fallback for
    the guard-violating tail. Output rows equal match_pages(...) exactly
    (pytest-pinned on a two-region fixture)."""
    from .matching import MATCHED_SCHEMA, _match_frame, match_pages

    if margin is None:
        margin = cfg.radius + cfg.max_dist / 2.0 + 300.0

    lon0, lat0 = cfg.lon0, cfg.lat0
    k = math.cos(math.radians(lat0))
    # regions present: first GEO line, identical float ops to the kernel
    lon1 = F.regexp_extract("text", r"GEO \d+ (-?[\d.]+) (-?[\d.]+)", 1)
    lat1 = F.regexp_extract("text", r"GEO \d+ (-?[\d.]+) (-?[\d.]+)", 2)
    x1 = (lon1.cast("double") - F.lit(lon0)) * F.lit(M_PER_DEG) * F.lit(k)
    y1 = (lat1.cast("double") - F.lit(lat0)) * F.lit(M_PER_DEG)
    import os as _os
    import time as _time
    _dbg = _os.environ.get("SPARK_GRAFT_SHARD_DEBUG")
    _t = _time.perf_counter()
    pres = (pages.filter(lon1 != "")
            .select(F.floor(x1 / F.lit(region_m)).cast("long").alias("rx"),
                    F.floor(y1 / F.lit(region_m)).cast("long").alias("ry"))
            .distinct().collect())
    regions = [(int(r.rx), int(r.ry)) for r in pres]
    if _dbg:
        print(f"[shard] regions job {_time.perf_counter() - _t:.2f}s "
              f"({len(regions)} regions)", flush=True)

    # payloads are a per-(network, tiling) artifact — memoize on the net
    # like _sp_payload_for, so repeated jobs against one network skip the
    # whole build (persist them next to the network in production)
    cache = getattr(net, "_shard_payload_cache", None)
    if cache is None:
        cache = net._shard_payload_cache = {}
    ckey = (frozenset(regions), region_m, cover_pad, sp_pair_max, margin,
            cfg.max_dist, cfg.radius, cfg.cell_size)
    pay_bc = cache.get(ckey)
    if _dbg:
        print(f"[shard] payload cache {'HIT' if pay_bc is not None else 'MISS'}",
              flush=True)
    if pay_bc is None:
        _t = _time.perf_counter()
        payloads = _build_region_payloads(spark, net, cfg, regions, region_m,
                                          cover_pad, sp_pair_max, margin,
                                          payload_max_rows)
        if _dbg:
            print(f"[shard] payload build {_time.perf_counter() - _t:.2f}s",
                  flush=True)
        # memoize the BROADCAST handle, not just the dict: re-pickling and
        # re-shipping hundreds of MB of regional payloads on every call
        # was measurable wall-clock on the bench leg
        pay_bc = spark.sparkContext.broadcast(payloads)
        cache[ckey] = pay_bc
    cell_size, radius = cfg.cell_size, cfg.radius
    tol, do_simpl = cfg.tolerance, cfg.simplify
    pair_budget = sp_pair_max

    def op(batches):
        import os as _os
        import time as _time
        _t0 = _time.perf_counter()
        from ..kernels.linear_ref import project_core
        from .candidates import extract_arrays
        pays = pay_bc.value
        _t1 = _time.perf_counter()
        _dbg = _os.environ.get("SPARK_GRAFT_SHARD_DEBUG")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            page_urls = pdf.url.to_numpy()
            frames = []
            done = set()
            fb = []

            def miss_rows(urls, fallback):
                return pd.DataFrame([
                    {"url": mu, "status": hmm.STATUS_NO_CANDIDATES,
                     "epath": None, "step_0": np.nan, "step_n": np.nan,
                     "dist": np.nan, "avg_speed": np.nan, "prob": np.nan,
                     "norm_prob": np.nan, "dist_prob": np.nan,
                     "trans_prob": np.nan, "dir_prob": np.nan,
                     "_fb": fallback} for mu in urls])

            ex = extract_arrays(pdf, lon0, lat0, tol, do_simpl)
            if ex is not None:
                u, pid, x, y = ex
                heads = np.flatnonzero(
                    np.concatenate([[True], u[1:] != u[:-1]]))
                ends = np.concatenate([heads[1:], [len(u)]])
                rx = np.floor(x[heads] / region_m).astype(np.int64)
                ry = np.floor(y[heads] / region_m).astype(np.int64)
                rkeys = _region_key(rx, ry)
                by_region: dict = {}
                for i, (s, e) in enumerate(zip(heads, ends)):
                    url = u[s]
                    pay = pays.get(int(rkeys[i]), "absent")
                    if pay == "absent":
                        # driver/kernel region disagreement (possible only
                        # for degenerate first-line parses) — fall back
                        fb.append(url)
                        done.add(url)
                        continue
                    if pay is None:
                        # region has no edges at all: with guard A the
                        # radius cannot reach any edge -> status 3; a
                        # guard-A violation still falls back
                        bx0, bx1 = x[s:e].min(), x[s:e].max()
                        by0, by1 = y[s:e].min(), y[s:e].max()
                        cb = (rx[i] * region_m - cover_pad,
                              ry[i] * region_m - cover_pad,
                              rx[i] * region_m + region_m + cover_pad,
                              ry[i] * region_m + region_m + cover_pad)
                        if (bx0 - radius < cb[0] or by0 - radius < cb[1]
                                or bx1 + radius > cb[2] or by1 + radius > cb[3]):
                            fb.append(url)
                        else:
                            frames.append(miss_rows([url], False))
                        done.add(url)
                        continue
                    # guard A: bbox + radius inside the core box
                    cb = pay["core_box"]
                    bx0, bx1 = x[s:e].min(), x[s:e].max()
                    by0, by1 = y[s:e].min(), y[s:e].max()
                    if (bx0 - radius < cb[0] or by0 - radius < cb[1]
                            or bx1 + radius > cb[2] or by1 + radius > cb[3]):
                        fb.append(url)
                        done.add(url)
                        continue
                    # guard B: every step coverable by the sp pair table
                    if e - s > 1:
                        dx = np.diff(x[s:e])
                        dy = np.diff(y[s:e])
                        lim = pair_budget - 2.0 * (radius + pay["max_edge_len"])
                        if (dx * dx + dy * dy > lim * lim).any():
                            fb.append(url)
                            done.add(url)
                            continue
                    by_region.setdefault(int(rkeys[i]), []).append((s, e))

                for rkey, spans in by_region.items():
                    pay = pays[rkey]
                    if "spd" not in pay:
                        # no sp rows came back for this region (no demands
                        # — e.g. single-node core); fall back defensively
                        for s, e in spans:
                            fb.append(u[s])
                            done.add(u[s])
                        continue
                    sel = np.concatenate(
                        [np.arange(s, e) for s, e in spans])
                    # urls never enter the kernel (match_pages_onepass's
                    # gid trick): points carry a slice-local integer gid,
                    # restored once on the 1-row-per-url output
                    urls_by_gid = np.array([u[s] for s, e in spans])
                    pgid = np.repeat(np.arange(len(spans)),
                                     [e - s for s, e in spans])
                    pr_, xr, yr = pid[sel], x[sel], y[sel]
                    cells_s, cell_eids = pay["cells"]
                    geom = pay["geom"]
                    eids_sorted, mat = geom[0], geom[1]
                    ck = xy_to_cell(xr, yr, cell_size)
                    lo = np.searchsorted(cells_s, ck, side="left")
                    cnt = np.searchsorted(cells_s, ck, side="right") - lo
                    P = np.repeat(np.arange(len(sel)), cnt)
                    E = cell_eids[np.arange(int(cnt.sum())) -
                                  np.repeat(np.cumsum(cnt) - cnt, cnt) +
                                  np.repeat(lo, cnt)]
                    pr = project_core(np.stack([xr[P], yr[P]], axis=1),
                                      mat[np.searchsorted(eids_sorted, E)])
                    keep = pr["dist"] <= radius
                    P, E, dp = P[keep], E[keep], pr["dist"][keep]
                    have = set()
                    if len(P):
                        o = np.lexsort((E, dp, P))
                        P, E, dp = P[o], E[o], dp[o]
                        gid = pgid[P]
                        pdf2 = pd.DataFrame({
                            "url": gid, "pid": pr_[P], "x": xr[P],
                            "y": yr[P], "eid": E, "dist_p2c": dp})
                        # chunk by candidate-row budget: the frame
                        # kernel's pair temporaries must stay
                        # cache-resident (onepass measured 3-4x the
                        # per-url cost on one giant call)
                        gheads = np.flatnonzero(np.concatenate(
                            [[True], gid[1:] != gid[:-1]]))
                        have = set(urls_by_gid[gid[gheads]])
                        budget = 100_000
                        cut_pos = np.concatenate([gheads, [len(gid)]])
                        c0 = 0
                        while c0 < len(gheads):
                            c1 = int(np.searchsorted(
                                cut_pos, cut_pos[c0] + budget, side="left"))
                            c1 = max(c1, c0 + 1)
                            sl = pdf2.iloc[cut_pos[c0]:
                                           cut_pos[min(c1, len(gheads))]]
                            out = _match_frame(sl, geom, pay["stats"],
                                               pay["spd"], cfg,
                                               cut_topk=True)
                            out["url"] = urls_by_gid[out.url.to_numpy()]
                            out["_fb"] = False
                            frames.append(out)
                            c0 = c1
                    no_c = [u[s] for s, e in spans if u[s] not in have]
                    if no_c:
                        frames.append(miss_rows(no_c, False))
                    done.update(u[s] for s, e in spans)

            miss = [pu for pu in page_urls if pu not in done]
            if miss:
                frames.append(miss_rows(miss, False))
            if fb:
                frames.append(miss_rows(fb, True))
            yield pd.concat(frames, ignore_index=True) if len(frames) > 1 \
                else frames[0]
        if _dbg:
            with open("/tmp/shard_debug.log", "a") as _f:
                _f.write(f"{_os.getpid()} start={_t0:.3f} bc={_t1 - _t0:.3f} "
                         f"end={_time.perf_counter():.3f}\n")

    out = (pages.select("url", "text")
           .mapInPandas(op, schema=MATCHED_SCHEMA + ", _fb boolean")
           .persist())
    _t = _time.perf_counter()
    n_fb = out.filter(F.col("_fb")).count()
    if _dbg:
        print(f"[shard] op stage {_time.perf_counter() - _t:.2f}s "
              f"(fb={n_fb})", flush=True)
    good = out.filter(~F.col("_fb")).drop("_fb")
    if n_fb == 0:
        result = good
    else:
        fb_pages = pages.join(out.filter(F.col("_fb")).select("url"),
                              "url", "left_semi")
        fb_matched = match_pages(spark, fb_pages, net, cfg)
        result = good.unionByName(fb_matched)
    result = result.persist()
    result.count()
    out.unpersist()   # result is materialized; drop the marker cache
    return result
