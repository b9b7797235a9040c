"""ST-Matching HMM math: transition-pair construction, flag identification,
probability scoring, beam Viterbi, path stitching.

Pure pandas/numpy — shared verbatim by the oracle and by the engine's
`applyInPandas` / `mapInPandas` stages. Semantics re-derived from:

* pair construction + flags:  /root/reference/mapmatching/match/candidatesGraph.py:58-166
* dist/temporal/trans probs:  /root/reference/mapmatching/match/spatialAnalysis.py:10-151
* dir prob:                   /root/reference/mapmatching/match/dir_similarity.py:6-15,
                              /root/reference/mapmatching/geo/azimuth.py:175-208
* beam Viterbi + pruning:     /root/reference/mapmatching/match/viterbi.py:17-154
* path stitch + status:       /root/reference/mapmatching/match/postprocess.py:13-97

Engine-vs-reference divergences (all deliberate, all shared with the oracle):
* ties in per-layer pruning and in top-k candidate cuts are broken by
  explicit keys (prob desc, eid_1, eid_0) instead of pandas' unstable sort;
* a fully-empty forward lattice returns status FAILED instead of raising;
* the reference's `get_shared_line` (match/misc.py:42-52) has an inverted
  None-check and in practice returns `step_n` whenever `step_0` exists —
  we reproduce that observable behavior directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import MatchConfig
from .geodesy import bearing_deg, polyline_bearing_cos_dist

# status codes (/root/reference/mapmatching/match/status.py:3-14)
STATUS_SUCCESS = 0
STATUS_SAME_LINK = 1
STATUS_ONE_POINT = 2
STATUS_NO_CANDIDATES = 3
STATUS_FAILED = 4
STATUS_UNKNOWN = 99

FLAG_NORMAL = 0
FLAG_SAME_SRC_FIRST = 1
FLAG_SAME_SRC_LAST = 2

_EPS = 1e-6


def gaussian_emission(dist: np.ndarray, sigma: float = 20.0, bias: float = 0.0) -> np.ndarray:
    """Unnormalized Gaussian observation density
    (geometricAnalysis.py:19-23). Normalization by the per-trajectory max
    and the sqrt happen at the caller (they need the whole candidate set)."""
    factor = 1.0 / (np.sqrt(2.0 * np.pi) * sigma)
    d = np.asarray(dist, dtype=np.float64)
    return factor * np.exp(-np.power(d - bias, 2) / (2.0 * sigma * sigma))


def observ_prob_from_density(density: np.ndarray, traj_max_density: np.ndarray) -> np.ndarray:
    """sqrt(density / max density over the trajectory's candidate set)
    (geometricAnalysis.py:24-28 with normal=True)."""
    return np.sqrt(np.asarray(density, dtype=np.float64) / np.asarray(traj_max_density, dtype=np.float64))


# ---------------------------------------------------------------------------
# transition pairs
# ---------------------------------------------------------------------------

def layer_params(layer_points: pd.DataFrame) -> pd.DataFrame:
    """Straight-line distance + heading between *consecutive candidate
    layers* (candidatesGraph.py:14-56 — note the reference computes these
    on points.loc[cands.pid.unique()], i.e. only layers that have
    candidates). Expects columns pid, x, y sorted by pid."""
    pts = layer_points.sort_values("pid").reset_index(drop=True)
    x = pts.x.to_numpy()
    y = pts.y.to_numpy()
    dx = x[1:] - x[:-1]
    dy = y[1:] - y[:-1]
    # sqrt(dx*dx + dy*dy), NOT np.hypot: IEEE sqrt/mul/add are correctly
    # rounded, so the JVM twin (operators.matching.layer_links) produces
    # bit-identical values; hypot algorithms differ in the last ulp, which
    # is enough to flip knife-edge Viterbi ties between twin edges
    d = np.sqrt(dx * dx + dy * dy)
    move_dir = bearing_deg(x[:-1], y[:-1], x[1:], y[1:])
    return pd.DataFrame({
        "pid_0": pts.pid.to_numpy()[:-1],
        "pid_1": pts.pid.to_numpy()[1:],
        "d_euc": d,
        "move_dir": np.atleast_1d(move_dir),
    })


def build_transition_pairs(cands: pd.DataFrame, layer_points: pd.DataFrame) -> pd.DataFrame:
    """Cartesian product of consecutive candidate layers
    (candidatesGraph.py:117-166). ``cands`` needs columns
    pid, eid, src, dst, dist, speed, len0, len1, seg0, seg1, observ_prob.

    Output column glossary (matching the reference's renames at
    candidatesGraph.py:122-127):
      step_0 / step_0_len : tail of the FIRST edge after its projection
                            (cand_0.seg1 / cand_0.len1)
      step_n / step_n_len : head of the LAST edge up to its projection
                            (cand_1.seg0 / cand_1.len0)
      left_seg0/left_len0 : cand_0's own head cut, needed by the
                            approx-point reset in identify_flags.
    """
    layer_ids = np.sort(cands.pid.unique())
    nxt = dict(zip(layer_ids[:-1], layer_ids[1:]))

    left = cands[["pid", "eid", "dist", "speed", "dst", "len1", "seg1", "len0", "seg0"]].rename(
        columns={"pid": "pid_0", "eid": "eid_0", "dist": "dist_0", "speed": "speed_0",
                 "len1": "step_0_len", "seg1": "step_0",
                 "len0": "left_len0", "seg0": "left_seg0"})
    left["pid_1"] = left.pid_0.map(nxt)
    left = left[left.pid_1.notna()].copy()
    left["pid_1"] = left.pid_1.astype(np.int64)

    right = cands[["pid", "eid", "dist", "speed", "src", "len0", "seg0", "observ_prob"]].rename(
        columns={"pid": "pid_1", "eid": "eid_1", "dist": "dist_1", "speed": "speed_1",
                 "len0": "step_n_len", "seg0": "step_n"})

    gt = left.merge(right, on="pid_1", how="inner")
    gt = gt.merge(layer_params(layer_points), on=["pid_0", "pid_1"], how="left")
    return gt.reset_index(drop=True)


def identify_flags(gt: pd.DataFrame, dist_eps: float = 5.0, ratio_eps: float = 0.05) -> pd.DataFrame:
    """Classify same-edge pairs and apply the near-point merge
    (candidatesGraph.py:58-114). Mutates/returns gt with columns
    flag, o_node, d_node (shortest-path endpoints after the
    SAME_SRC_FIRST swap)."""
    offset_0 = gt.dist_0.to_numpy() - gt.step_0_len.to_numpy()       # proj_0 offset on edge_0
    step_n_len = gt.step_n_len.to_numpy()

    cond_1 = offset_0 <= step_n_len
    relaxed = np.minimum(np.maximum(0.0, offset_0 - dist_eps), offset_0 * (1.0 - ratio_eps))
    cond = relaxed <= step_n_len

    # near-point merge: proj_0 barely past proj_1 -> treat the head cut of
    # cand_0 as the step_n of the row (applies to ALL rows, same-edge or not,
    # exactly as the reference does at candidatesGraph.py:99-105)
    approx = cond & (~cond_1)
    if approx.any():
        idx = np.flatnonzero(approx)
        gt.loc[gt.index[idx], "step_n_len"] = gt.left_len0.to_numpy()[idx]
        seg_col = gt.columns.get_loc("step_n")
        left_col = gt.columns.get_loc("left_seg0")
        for i in idx:
            gt.iat[i, seg_col] = gt.iat[i, left_col]

    same_edge = gt.eid_0.to_numpy() == gt.eid_1.to_numpy()
    flag = np.where(same_edge & cond, FLAG_SAME_SRC_FIRST,
                    np.where(same_edge & (~cond), FLAG_SAME_SRC_LAST, FLAG_NORMAL))
    gt["flag"] = flag.astype(np.int32)

    # shortest-path endpoints: normally edge_0.dst -> edge_1.src; the
    # SAME_SRC_FIRST swap (candidatesGraph.py:107-109 + the search-arg
    # order at spatialAnalysis.py:54) makes it edge.src -> edge.dst.
    first = gt.flag.to_numpy() == FLAG_SAME_SRC_FIRST
    gt["o_node"] = np.where(first, gt.src.to_numpy(), gt.dst.to_numpy()).astype(np.int64)
    gt["d_node"] = np.where(first, gt.dst.to_numpy(), gt.src.to_numpy()).astype(np.int64)
    return gt


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------

def path_coords_from_epath(epath, edge_coords: dict) -> np.ndarray | None:
    """Stitch edge geometries along a path, dropping the duplicated joint
    vertex between consecutive edges."""
    if epath is None or len(epath) == 0:
        return None
    parts = [np.asarray(edge_coords[int(epath[0])], dtype=np.float64)]
    for e in epath[1:]:
        parts.append(np.asarray(edge_coords[int(e)], dtype=np.float64)[1:])
    return np.concatenate(parts)


def score_base_np(cost, step_0_len, step_n_len, speed_0, speed_1, path_speed,
                  flag, dist_0, d_euc):
    """Pure-array form of the base scoring (spatialAnalysis.py:10-121):
    returns (avg_speed, d_sht, dist_prob, flag1_mask). All inputs float64/
    int arrays of equal length."""
    # temporal: weighted average of (speed_0, speed_1, path_speed) with
    # weights (step_0_len, step_n_len, cost); 0/inf weights -> eps
    # (spatialAnalysis.py:79-111)
    speeds = np.stack([speed_0, speed_1, path_speed], axis=1)
    weights = np.stack([step_0_len, step_n_len, cost], axis=1)
    weights = np.where(~np.isfinite(weights) | (weights == 0), _EPS, weights)
    avg_speed = (speeds * weights).sum(axis=1) / weights.sum(axis=1)

    # shortest-path distance (spatialAnalysis.py:60-69)
    d_sht = cost + step_0_len + step_n_len
    flag1 = flag == FLAG_SAME_SRC_FIRST
    d_sht = np.where(flag1, step_0_len + step_n_len - dist_0, d_sht)
    d_sht = np.where(flag1 & (d_sht < _EPS), d_euc, d_sht)

    # dist_prob = min(d_euc/d_sht, d_sht/d_euc) (spatialAnalysis.py:71-75)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = d_euc / d_sht
        r = np.where(r > 1.0, 1.0 / r, r)
        r = np.where(d_sht == 0, np.where(d_euc == 0, np.nan, 0.0), r)
        r = np.where(np.isinf(d_sht), 0.0, r)
    return avg_speed, d_sht, r, flag1


def score_base(gt: pd.DataFrame, cfg: MatchConfig = MatchConfig()) -> pd.DataFrame:
    """avg_speed, d_sht, dist_prob (everything except the direction term)
    given the shortest-path attach columns ``cost`` (inf if unreachable, 0
    if o_node==d_node), ``epath`` (list|None) and ``path_speed``
    (spatialAnalysis.py:10-121)."""
    if gt.empty:
        for c in ("avg_speed", "d_sht", "dist_prob"):
            gt[c] = np.array([], dtype=np.float64)
        return gt

    avg_speed, d_sht, dist_prob, flag1 = score_base_np(
        gt.cost.to_numpy(dtype=np.float64),
        gt.step_0_len.to_numpy(dtype=np.float64),
        gt.step_n_len.to_numpy(dtype=np.float64),
        gt.speed_0.to_numpy(dtype=np.float64),
        gt.speed_1.to_numpy(dtype=np.float64),
        gt.path_speed.to_numpy(dtype=np.float64),
        gt.flag.to_numpy(),
        gt.dist_0.to_numpy(dtype=np.float64),
        gt.d_euc.to_numpy(dtype=np.float64))
    gt["avg_speed"] = avg_speed
    gt["d_sht"] = d_sht
    gt["dist_prob"] = dist_prob
    if flag1.any() and "epath" in gt.columns:
        gt.loc[gt.flag == FLAG_SAME_SRC_FIRST, "epath"] = None
    return gt


def finalize_scores(gt: pd.DataFrame, edge_coords: dict, dir_trans: bool,
                    cfg: MatchConfig = MatchConfig()) -> pd.DataFrame:
    """Full scoring incl. dir_prob by literal geometry concatenation
    (dir_similarity.py:6-15) — the oracle path. The engine computes the
    same dir_prob from additive sufficient stats (kernels.dir_stats);
    the parity suite pins both to 1e-9."""
    gt = score_base(gt, cfg)
    if gt.empty or not dir_trans:
        gt["dir_prob"] = np.nan if not len(gt) else np.full(len(gt), np.nan)
        gt["trans_prob"] = gt.dist_prob if len(gt) else np.array([], dtype=np.float64)
        return gt
    flag1 = gt.flag.to_numpy() == FLAG_SAME_SRC_FIRST

    # direction prob over the stitched step geometry
    dir_prob = np.empty(len(gt), dtype=np.float64)
    step0_list = gt.step_0.tolist()
    stepn_list = gt.step_n.tolist()
    epaths = gt.epath.tolist()
    move_dirs = gt.move_dir.to_numpy(dtype=np.float64)
    for i in range(len(gt)):
        if flag1[i]:
            geom = stepn_list[i] if step0_list[i] is not None else None
            if geom is not None and len(geom) > 0:
                geom = np.vstack(geom).astype(np.float64)
        else:
            parts = [p for p in (step0_list[i],
                                 path_coords_from_epath(epaths[i], edge_coords),
                                 stepn_list[i]) if p is not None and len(p) > 0]
            # np.vstack instead of asarray: Arrow hands nested lists as
            # object arrays of row arrays
            geom = np.concatenate([np.vstack(p).astype(np.float64) for p in parts]) if parts else None
        dir_prob[i] = polyline_bearing_cos_dist(geom, move_dirs[i])
    gt["dir_prob"] = dir_prob
    gt["trans_prob"] = gt.dist_prob * gt.dir_prob
    return gt


# ---------------------------------------------------------------------------
# beam Viterbi
# ---------------------------------------------------------------------------

def _prune(pid_0, eid_0, eid_1, prob, level: int, prev_scores: dict, cfg: MatchConfig):
    """One beam-prune step (viterbi.py:17-69). Returns (eid_1 winners,
    eid_0 back-pointers, probs) in pop order.

    ``prev_scores`` may be a dict {eid: prob} (oracle path) or a
    (sorted_eids, probs) array pair (the fused matcher's array state) —
    lookups with default 1.0 either way."""
    if level < cfg.prune_start_layer:
        order = np.lexsort((eid_0, eid_1, -prob))
        cap = len(order)
    else:
        if isinstance(prev_scores, tuple):
            pe, pp = prev_scores
            if len(pe):
                loc = np.minimum(np.searchsorted(pe, eid_0), len(pe) - 1)
                ps = np.where(pe[loc] == eid_0, pp[loc], 1.0) * prob
            else:
                ps = 1.0 * np.asarray(prob)
        else:
            ps = np.array([prev_scores.get(int(e), 1.0) for e in eid_0]) * prob
        if len(ps) == 0 or not np.isfinite(np.nanmax(ps)):
            thred = -np.inf
        else:
            thred = np.nanmax(ps) * cfg.prune_trim_factor
        keep = np.flatnonzero(prob >= thred)
        order = keep[np.lexsort((eid_0[keep], eid_1[keep], -prob[keep]))]
        cap = cfg.beam_cap

    # first occurrence per eid_1 within order[:cap], in pop order — the
    # array form of the loop-with-seen-set (np.unique's return_index is
    # the first occurrence because the mergesort tie-break is positional)
    head = order[:cap]
    if len(head) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0)
    _, first = np.unique(eid_1[head], return_index=True)
    first.sort()
    win = head[first]
    return eid_1[win], eid_0[win], prob[win]


def viterbi_beam(cands: pd.DataFrame, gt: pd.DataFrame, cfg: MatchConfig = MatchConfig()):
    """Forward beam pass + back-pointer reconstruction
    (viterbi.py:107-154, 71-95). ``gt`` must already be scored
    (trans_prob, observ_prob columns). Returns (end_prob, rList DataFrame
    with columns pid, eid)."""
    c_pid = cands.pid.to_numpy()
    c_eid = cands.eid.to_numpy()
    layer_ids = np.unique(c_pid)
    m0 = c_pid == 0
    d0 = cands.dist_p2c.to_numpy()[m0]
    e0_ = c_eid[m0]
    o0 = cands.observ_prob.to_numpy()[m0]
    ordr = np.lexsort((e0_, d0))  # deterministic insertion order (dist, eid)

    # per-layer state as arrays instead of dicts (the dict build + per-edge
    # .get() calls were ~half the decode cost at 25-pair layers):
    #   ins_e1/ins_p — winners in pop (insertion) order, for the walk's
    #                  first-max tie-break;  bp — back-pointer eid_0s;
    #   srt_e1/srt_p — eid-sorted copies for O(log n) lookups.
    # layer-0 candidates are unique per eid already (one row per (pid,eid))
    ins_e1 = [e0_[ordr].astype(np.int64)]
    ins_p = [o0[ordr].astype(np.float64)]
    back_ptr = [None]
    srt = np.argsort(ins_e1[0], kind="stable")
    srt_e1 = [ins_e1[0][srt]]
    srt_p = [ins_p[0][srt]]

    # one numpy materialization, sliced per layer (pandas per-layer ops are
    # the profile hotspot at millions of trajectories)
    if len(gt):
        order = np.argsort(gt.pid_0.to_numpy(), kind="stable")
        g_pid0 = gt.pid_0.to_numpy()[order]
        g_e0 = gt.eid_0.to_numpy()[order]
        g_e1 = gt.eid_1.to_numpy()[order]
        g_tp = (gt.trans_prob.to_numpy(dtype=np.float64)
                * gt.observ_prob.to_numpy(dtype=np.float64))[order]
    else:
        g_pid0 = np.array([], dtype=np.int64)
        g_e0 = g_e1 = g_pid0
        g_tp = np.array([], dtype=np.float64)

    empty_i = np.empty(0, np.int64)
    empty_f = np.empty(0, np.float64)
    for idx, lvl in enumerate(layer_ids[:-1]):
        lo = np.searchsorted(g_pid0, lvl, side="left")
        hi = np.searchsorted(g_pid0, lvl, side="right")
        if lo == hi:
            ins_e1.append(empty_i); ins_p.append(empty_f)
            back_ptr.append(empty_i)
            srt_e1.append(empty_i); srt_p.append(empty_f)
            continue
        e0 = g_e0[lo:hi]
        pe, pp = srt_e1[-1], srt_p[-1]
        loc = np.minimum(np.searchsorted(pe, e0), max(len(pe) - 1, 0))
        cand = pp[loc] if len(pe) else np.full(hi - lo, np.nan)
        # a NaN-prob winner counts as MISSING here (the dict form surfaced
        # it as NaN through .get and the ~isnan mask dropped it)
        ok = (pe[loc] == e0) & ~np.isnan(cand) if len(pe) \
            else np.zeros(hi - lo, dtype=bool)
        if not ok.any():
            # HMM break: restart with prev prob = 1 over the full layer
            # (viterbi.py:122-126)
            sel = slice(None)
            prev = np.ones(hi - lo, dtype=np.float64)
        else:
            sel = ok
            prev = cand[ok]

        prob = prev * g_tp[lo:hi][sel]
        win_e1, win_e0, win_p = _prune(
            g_pid0[lo:hi][sel], g_e0[lo:hi][sel], g_e1[lo:hi][sel],
            prob, idx, (srt_e1[-1], srt_p[-1]), cfg)

        ins_e1.append(win_e1.astype(np.int64))
        ins_p.append(win_p.astype(np.float64))
        back_ptr.append(win_e0.astype(np.int64))
        srt = np.argsort(win_e1, kind="stable")
        srt_e1.append(win_e1[srt].astype(np.int64))
        srt_p.append(win_p[srt].astype(np.float64))

    # ------------------------------------------------------------------ walk
    epath, state, end_probs = [], None, []
    for idx in range(len(ins_e1) - 1, 0, -1):
        le1, lp_, lbp = ins_e1[idx], ins_p[idx], back_ptr[idx]
        if state is None:
            if len(le1) == 0:
                continue
            # max(f, key=f.get) on the insertion-order dict: Python's max
            # keeps the FIRST maximum and never replaces the incumbent on
            # a NaN comparison — so a NaN in slot 0 wins outright, and
            # NaNs elsewhere never win
            if np.isnan(lp_[0]):
                k = 0
            else:
                k = int(np.argmax(np.where(np.isnan(lp_), -np.inf, lp_)))
            state = int(le1[k])
            end_probs.append(float(lp_[k]))
        cur = (idx, state)
        hitpos = np.flatnonzero(le1 == state)
        if len(hitpos) == 0:
            state = None
            continue
        prev = (idx - 1, int(lbp[hitpos[0]]))
        if not epath or cur != epath[-1]:
            epath.append(cur)
        epath.append(prev)
        state = prev[1]
    epath = epath[::-1]

    if not end_probs:
        return 0.0, pd.DataFrame({"pid": [], "eid": []})

    end_prob = float(sum(end_probs) / len(end_probs))
    rlist = pd.DataFrame({"pid": [int(layer_ids[i]) for i, _ in epath],
                          "eid": [int(e) for _, e in epath]})
    return end_prob, rlist


def viterbi_classic(cands: pd.DataFrame, gt: pd.DataFrame,
                    cfg: MatchConfig = MatchConfig()):
    """Classic full-lattice Viterbi — the reference's beam_search=False
    branch (matching.py:187-188 -> viterbi.py:200-268): additive
    accumulation (decode's default mode='+') of dist_prob * emit over ALL
    candidate states, no pruning, no beam cap, no HMM-break restart.

    Reference-fidelity notes (deliberate, shared with the oracle):
    * the reference's classic branch is bit-rotted — prepare_viterbi_input
      reads a `'f'` column (viterbi.py:258) that `graph[['pid_1',
      'dist_prob']]` (matching.py:188) does not carry, so it raises
      KeyError as shipped. We implement the evident intent: the
      transition weight is dist_prob (the classic branch never uses the
      direction term).
    * ties: max((value, prev_state)) — larger prev eid wins (viterbi.py:
      237), and the final state is the larger eid on value ties
      (viterbi.py:244).
    * start layer: the first layer WITH candidates (the reference hard-
      codes pid==0, viterbi.py:251, and would emit an empty lattice when
      simplification leaves layer 0 candidate-less).
    * an HMM break (a layer no transition reaches) crashes the reference
      (max over empty, viterbi.py:244); we return an empty rlist ->
      STATUS_FAILED, consistent with the beam path's degrade rule.

    Returns (end_prob, rlist) with rlist covering every candidate layer.
    """
    c_pid = cands.pid.to_numpy()
    c_eid = cands.eid.to_numpy()
    layer_ids = np.unique(c_pid)
    obs = cands.observ_prob.to_numpy()
    emit = {(int(p), int(e)): float(o) for p, e, o in zip(c_pid, c_eid, obs)}

    m0 = c_pid == layer_ids[0]
    v = {int(e): float(o) for e, o in zip(c_eid[m0], obs[m0])}
    path = {e: [(int(layer_ids[0]), e)] for e in v}

    if len(gt):
        # canonical (layer, e1, e0) order + NaN-compares-as--inf makes the
        # winner independent of upstream row order (NaN dist_prob arises
        # from coincident points; the reference's max() over NaN tuples is
        # order-dependent — we pin a deterministic rule instead)
        order = np.lexsort((gt.eid_0.to_numpy(), gt.eid_1.to_numpy(),
                            gt.pid_0.to_numpy()))
        g_pid0 = gt.pid_0.to_numpy()[order]
        g_e0 = gt.eid_0.to_numpy()[order]
        g_e1 = gt.eid_1.to_numpy()[order]
        g_dp = gt.dist_prob.to_numpy(dtype=np.float64)[order]
    else:
        g_pid0 = np.array([], dtype=np.int64)
        g_e0 = g_e1 = g_pid0
        g_dp = np.array([], dtype=np.float64)

    def _cmp(x: float) -> float:
        return float("-inf") if np.isnan(x) else x

    for t in range(1, len(layer_ids)):
        lvl = layer_ids[t - 1]
        pid_t = int(layer_ids[t])
        lo = np.searchsorted(g_pid0, lvl, side="left")
        hi = np.searchsorted(g_pid0, lvl, side="right")
        new_v: dict[int, float] = {}
        new_path: dict[int, list] = {}
        best_prev: dict[int, int] = {}
        for e0, e1, dp in zip(g_e0[lo:hi], g_e1[lo:hi], g_dp[lo:hi]):
            e0, e1 = int(e0), int(e1)
            prev = v.get(e0)
            if prev is None:
                continue
            val = prev + dp * emit[(pid_t, e1)]
            cur = new_v.get(e1)
            if cur is None or (_cmp(val), e0) > (_cmp(cur), best_prev[e1]):
                new_v[e1] = val
                best_prev[e1] = e0
        for e1, e0 in best_prev.items():
            new_path[e1] = path[e0] + [(pid_t, e1)]
        v, path = new_v, new_path
        if not v:
            return 0.0, pd.DataFrame({"pid": [], "eid": []})

    end_state = max(v, key=lambda st: (_cmp(v[st]), st))
    end_prob = float(v[end_state])
    rlist = pd.DataFrame({"pid": [p for p, _ in path[end_state]],
                          "eid": [e for _, e in path[end_state]]})
    return end_prob, rlist


def viterbi_beam_lockstep(pl_gid, pair_off, pair_cnt, e0, e1, tp,
                          l0_e, l0_p, l0_off, n_steps,
                          cfg: MatchConfig = MatchConfig()):
    """Beam Viterbi over MANY trajectories in lockstep — the batch twin of
    viterbi_beam, decision-for-decision identical (the parity suite pins
    fused-engine == per-group oracle exactly).

    Instead of per-trajectory per-layer numpy calls on ~25-element arrays
    (fixed call overhead dominated the decode at ~6 core-ms/trajectory),
    step t of EVERY trajectory is processed in one set of array ops:
    transition-pair layers are grouped by their within-trajectory step
    index, state lookups use one composite-key searchsorted across all
    active trajectories, and the beam prune (threshold, (-prob, e1, e0)
    order, cap, first-per-e1 dedup) runs on the concatenated rows with
    group-aware segmentation. The backward walk is likewise lockstep;
    only the final epath list assembly is per-trajectory Python.

    Inputs (all numpy, pair layers sorted group-major then step-ascending;
    every consecutive-layer pair has >= 1 row — the fused matcher's pair
    table guarantees this):
      pl_gid          group id per pair-layer
      pair_off/cnt    row span of each pair-layer in e0/e1/tp
      e0, e1, tp      pair rows (tp = trans_prob * observ_prob)
      l0_e, l0_p      layer-0 (pid == 0) start states, group-major, in
                      (dist_p2c, eid) row order; l0_off: offsets (ng+1)
      n_steps         transitions per group (= layer count - 1)

    Returns per group: (end_prob, idx array, eid array) where idx is the
    layer INDEX (caller maps to pids)."""
    ng = len(n_steps)
    maxT = int(n_steps.max()) if ng else 0
    M = np.int64(max(int(e1.max(initial=0)), int(e0.max(initial=0)),
                     int(l0_e.max(initial=0))) + 1)
    NEG_INF = -np.inf

    # step-major ordering of pair layers
    t_of = np.concatenate([np.arange(c, dtype=np.int64)
                           for c in np.diff(np.searchsorted(
                               pl_gid, np.arange(ng + 1) - 0.5))]) \
        if len(pl_gid) else np.empty(0, np.int64)
    ord_kt = np.lexsort((pl_gid, t_of))
    t_sorted = t_of[ord_kt]
    t_starts = np.searchsorted(t_sorted, np.arange(maxT + 1))

    # current winner state: insertion-order arrays + sorted lookup copy
    w_grp = np.repeat(np.arange(ng, dtype=np.int64), np.diff(l0_off))
    w_e1 = l0_e.astype(np.int64)
    w_p = l0_p.astype(np.float64)
    so = np.lexsort((w_e1, w_grp))
    skey = w_grp[so] * M + w_e1[so]
    svals = w_p[so]

    steps = []  # per step: (wg, we1, wp, wb) winners in pop order
    for t in range(maxT):
        ks = ord_kt[t_starts[t]:t_starts[t + 1]]
        cnts = pair_cnt[ks]
        tot = int(cnts.sum())
        base = np.repeat(np.cumsum(cnts) - cnts, cnts)
        rows = np.repeat(pair_off[ks], cnts) + (np.arange(tot) - base)
        rg = np.repeat(pl_gid[ks], cnts)
        re0, re1, rtp = e0[rows], e1[rows], tp[rows]
        rstarts = np.cumsum(cnts) - cnts

        # previous-layer state lookup; a NaN-prob winner counts as MISSING
        # for selection (but its NaN value flows into the prune threshold)
        if len(skey):
            rkey = rg * M + re0
            loc = np.minimum(np.searchsorted(skey, rkey), len(skey) - 1)
            mk = skey[loc] == rkey
            val = svals[loc]
        else:
            mk = np.zeros(tot, dtype=bool)
            val = np.full(tot, np.nan)
        okm = mk & ~np.isnan(val)

        hit = np.add.reduceat(okm, rstarts) > 0
        restart_row = np.repeat(~hit, cnts)      # HMM break: prev prob 1
        sel = okm | restart_row
        prevv = np.where(restart_row, 1.0, val)

        rs = np.flatnonzero(sel)
        sgrp, se0, se1 = rg[rs], re0[rs], re1[rs]
        prob = prevv[rs] * rtp[rs]
        mk_sel, val_sel = mk[rs], val[rs]

        step_groups = pl_gid[ks]                 # sorted, one per group
        grank = np.searchsorted(step_groups, sgrp)

        if t >= cfg.prune_start_layer:
            ps = np.where(mk_sel, val_sel, 1.0) * prob
            sstarts = np.searchsorted(sgrp, step_groups)
            segmax = np.fmax.reduceat(ps, sstarts)   # == nanmax per group
            thred = np.where(np.isfinite(segmax),
                             segmax * cfg.prune_trim_factor, NEG_INF)
            keep = prob >= thred[grank]
            kk = np.flatnonzero(keep)
            cap = cfg.beam_cap
        else:
            kk = np.arange(len(rs))
            cap = 1 << 60

        kg, kp = sgrp[kk], prob[kk]
        order = kk[np.lexsort((se0[kk], se1[kk], -kp, kg))]
        og = sgrp[order]
        # positional rank within group -> cap, then first-per-(g, e1)
        gpos = np.searchsorted(og, np.unique(og))
        starts_of = np.repeat(gpos, np.diff(np.concatenate([gpos, [len(og)]])))
        rank = np.arange(len(og)) - starts_of
        capped = order[rank < cap]
        ogc = sgrp[capped]
        ckey = ogc * M + se1[capped]
        _, first = np.unique(ckey, return_index=True)
        first.sort()
        win = capped[first]

        wg = sgrp[win]
        we1 = se1[win]
        wp = prob[win]
        wb = se0[win]
        steps.append((wg, we1, wp, wb))

        so = np.lexsort((we1, wg))
        skey = wg[so] * M + we1[so]
        svals = wp[so]

    # ------------------------------------------------------- lockstep walk
    S = np.full(ng, -1, dtype=np.int64)
    ep_sum = np.zeros(ng)
    ep_cnt = np.zeros(ng, dtype=np.int64)
    rec = [None] * (maxT + 1)
    for idx in range(maxT, 0, -1):
        wg, we1, wp, wb = steps[idx - 1]
        g_ids = np.flatnonzero(n_steps >= idx)
        lo = np.searchsorted(wg, g_ids)
        hi = np.searchsorted(wg, g_ids, side="right")
        cnt = hi - lo

        rsm = (S[g_ids] == -1) & (cnt > 0)
        rsi = np.flatnonzero(rsm)
        if len(rsi):
            Wm = int(cnt[rsi].max())
            mi = lo[rsi][:, None] + np.arange(Wm)[None, :]
            valid = np.arange(Wm)[None, :] < cnt[rsi][:, None]
            mi = np.minimum(mi, max(len(wp) - 1, 0))
            pv = wp[mi]
            # max(f, key=f.get): first max; a NaN incumbent in slot 0 wins
            v = np.where(valid & ~np.isnan(pv), pv, NEG_INF)
            k = np.argmax(v, axis=1)
            k = np.where(np.isnan(wp[lo[rsi]]), 0, k)
            pos0 = lo[rsi] + k
            S[g_ids[rsi]] = we1[pos0]
            ep_sum[g_ids[rsi]] += wp[pos0]
            ep_cnt[g_ids[rsi]] += 1

        eng = np.flatnonzero(S[g_ids] != -1)
        if len(eng):
            Wm = int(cnt[eng].max()) if len(eng) else 0
            if Wm > 0:
                mi = lo[eng][:, None] + np.arange(Wm)[None, :]
                valid = np.arange(Wm)[None, :] < cnt[eng][:, None]
                mi = np.minimum(mi, max(len(we1) - 1, 0))
                eqm = valid & (we1[mi] == S[g_ids[eng]][:, None])
                found = eqm.any(axis=1)
                pos = np.argmax(eqm, axis=1)
                prev_e0 = wb[np.minimum(lo[eng] + pos, max(len(wb) - 1, 0))]
            else:
                found = np.zeros(len(eng), dtype=bool)
                prev_e0 = np.zeros(len(eng), dtype=np.int64)
            rec[idx] = (g_ids[eng], S[g_ids[eng]].copy(),
                        np.where(found, prev_e0, -1), found)
            S[g_ids[eng]] = np.where(found, prev_e0, -1)

    # ---------------------------------------- per-group epath assembly
    # per-group sequences of (idx, cur, prev, found), idx descending
    seqs: list[list] = [[] for _ in range(ng)]
    for idx in range(maxT, 0, -1):
        r = rec[idx]
        if r is None:
            continue
        gg, cur, prev, fnd = r
        for g, c, p, f in zip(gg.tolist(), cur.tolist(), prev.tolist(),
                              fnd.tolist()):
            seqs[g].append((idx, c, p, f))

    out = []
    for g in range(ng):
        if ep_cnt[g] == 0:
            out.append((0.0, np.empty(0, np.int64), np.empty(0, np.int64)))
            continue
        epath = []
        for idx, c, p, f in seqs[g]:
            if not f:
                continue
            cur = (idx, c)
            if not epath or cur != epath[-1]:
                epath.append(cur)
            epath.append((idx - 1, p))
        epath = epath[::-1]
        end_prob = float(ep_sum[g] / ep_cnt[g])
        out.append((end_prob,
                    np.array([i for i, _ in epath], dtype=np.int64),
                    np.array([e for _, e in epath], dtype=np.int64)))
    return out


class _ACol:
    """Array-backed stand-in for a pandas column (decode/stitch only call
    .to_numpy())."""
    __slots__ = ("a",)

    def __init__(self, a):
        self.a = a

    def to_numpy(self, dtype=None, copy=False):
        if dtype is None:
            return self.a
        return self.a.astype(dtype, copy=copy)


class ColFrame:
    """Minimal DataFrame stand-in over a dict of aligned numpy arrays.

    decode_sequence / viterbi_* / stitch_path only read columns by
    attribute and call .to_numpy() — the fused matcher feeds them
    zero-copy slices of batch-level arrays through this shim instead of
    constructing a fresh pandas frame per trajectory (measured ~2.3 ms of
    pure BlockManager work per group). pandas inputs keep working: these
    functions use the exact attribute surface this class provides."""
    __slots__ = ("_d",)

    def __init__(self, d: dict):
        self._d = d

    def __getattr__(self, k):
        try:
            return _ACol(self._d[k])
        except KeyError:
            raise AttributeError(k)

    @property
    def columns(self):
        return list(self._d)

    def __len__(self):
        d = self._d
        return len(next(iter(d.values()))) if d else 0

    @property
    def empty(self):
        return len(self) == 0


def decode_sequence(cands: pd.DataFrame, gt: pd.DataFrame,
                    cfg: MatchConfig = MatchConfig()):
    """Dispatch on cfg.beam_search (matching.py:185-188)."""
    if cfg.beam_search:
        return viterbi_beam(cands, gt, cfg)
    return viterbi_classic(cands, gt, cfg)


# ---------------------------------------------------------------------------
# path stitch
# ---------------------------------------------------------------------------

def stitch_path(rlist: pd.DataFrame, gt: pd.DataFrame, cands: pd.DataFrame,
                end_prob: float, cfg: MatchConfig = MatchConfig(),
                dir_trans: bool = True, epath_lookup=None,
                collect_steps: bool = False) -> dict:
    """Assemble the final matched path + metrics (postprocess.py:13-97).

    ``gt`` carries either an ``epath`` column (oracle path) or
    (o_node, d_node, flag) + ``epath_lookup(o, d) -> list|None`` (engine
    path — nested path arrays never ride through Arrow; they are fetched
    from the broadcast sp table only for the <=L chosen steps).

    ``collect_steps=True`` is the planet-scale variant: instead of looking
    paths up it returns ``steps`` = [(o_node, d_node, need_path, eid), ...]
    plus ``last_eid`` and leaves status=STATUS_UNKNOWN; a downstream
    relational stage joins the sp table, assembles + consecutive-dedups the
    epath and finalizes status (operators.matching.attach_epath_relational).
    All scalar metrics are computed here either way — they never depend on
    the expanded path contents."""
    res = {"status": STATUS_UNKNOWN, "epath": None, "step_0": np.nan, "step_n": np.nan,
           "dist": np.nan, "avg_speed": np.nan, "prob": end_prob,
           "norm_prob": np.nan, "dist_prob": np.nan, "trans_prob": np.nan,
           "dir_prob": np.nan}
    if rlist.empty:
        res["status"] = STATUS_FAILED
        return res

    r_pid = rlist.pid.to_numpy()
    r_eid = rlist.eid.to_numpy()
    # first/last cut params: two masked lookups instead of a dict over the
    # whole candidate slice ((pid, eid) is unique per candidate row)
    c_pid = cands.pid.to_numpy()
    c_eid = cands.eid.to_numpy()
    c_l0 = cands.len0.to_numpy()
    c_l1 = cands.len1.to_numpy()

    def _cut(p, e):
        i = np.flatnonzero((c_pid == p) & (c_eid == e))
        if not len(i):
            raise KeyError((p, e))      # same failure class as the dict
        return float(c_l0[i[0]]), float(c_l1[i[0]])

    f_l0, f_l1 = _cut(int(r_pid[0]), int(r_eid[0]))
    l_l0, l_l1 = _cut(int(r_pid[-1]), int(r_eid[-1]))
    res["step_0"] = f_l0 / (f_l0 + f_l1)
    res["step_n"] = l_l0 / (l_l0 + l_l1)

    if len(rlist) == 1:
        res["epath"] = [int(r_eid[0])]
        res["status"] = STATUS_FAILED if end_prob < cfg.prob_thres else STATUS_SAME_LINK
        return res

    # winning-step row lookup: rank-encode the (pid_0, eid_0, eid_1)
    # triples and binary-search the whole key vector at once (the
    # per-group dict build over every transition pair was the measured
    # stitch hot spot; triples are unique, so first == the dict's last)
    g_p = gt.pid_0.to_numpy()
    g_a = gt.eid_0.to_numpy()
    g_b = gt.eid_1.to_numpy()
    pu, au, bu = np.unique(g_p), np.unique(g_a), np.unique(g_b)
    code = ((np.searchsorted(pu, g_p).astype(np.int64) * len(au)
             + np.searchsorted(au, g_a)) * len(bu) + np.searchsorted(bu, g_b))
    corder = np.argsort(code, kind="stable")
    csort = code[corder]
    kp = r_pid[:-1].astype(np.int64)
    ka = r_eid[:-1].astype(np.int64)
    kb = r_eid[1:].astype(np.int64)
    qp, qa, qb = (np.searchsorted(pu, kp), np.searchsorted(au, ka),
                  np.searchsorted(bu, kb))
    comp_ok = ((qp < len(pu)) & (pu[np.minimum(qp, len(pu) - 1)] == kp)
               & (qa < len(au)) & (au[np.minimum(qa, len(au) - 1)] == ka)
               & (qb < len(bu)) & (bu[np.minimum(qb, len(bu) - 1)] == kb))
    qcode = (qp.astype(np.int64) * len(au) + qa) * len(bu) + qb
    pos = np.minimum(np.searchsorted(csort, qcode), len(csort) - 1)
    hit = comp_ok & (csort[pos] == qcode)
    if not hit.all():
        # only reachable via the empty-lattice guard in viterbi_beam;
        # the reference raises here, we degrade to FAILED
        res["status"] = STATUS_FAILED
        return res
    rows = corder[pos]
    keys = list(zip(kp.tolist(), ka.tolist(), kb.tolist()))
    g_dsht = gt.d_sht.to_numpy(dtype=np.float64)[rows]
    g_speed = gt.avg_speed.to_numpy(dtype=np.float64)[rows]
    g_distp = gt.dist_prob.to_numpy(dtype=np.float64)[rows]
    g_transp = gt.trans_prob.to_numpy(dtype=np.float64)[rows]
    if collect_steps:
        g_flag = gt.flag.to_numpy()[rows]
        g_o = gt.o_node.to_numpy()[rows]
        g_d = gt.d_node.to_numpy()[rows]
        res["steps"] = [(int(o), int(d), int(f) != FLAG_SAME_SRC_FIRST, int(k[1]))
                        for o, d, f, k in zip(g_o, g_d, g_flag, keys)]
        res["last_eid"] = int(r_eid[-1])
        _stitch_metrics(res, g_dsht, g_speed, g_distp, g_transp, end_prob,
                        len(keys), dir_trans)
        return res  # status stays STATUS_UNKNOWN: finalized relationally
    if "epath" in gt.columns:
        g_ep = gt.epath.to_numpy(dtype=object)[rows]
    else:
        g_flag = gt.flag.to_numpy()[rows]
        g_o = gt.o_node.to_numpy()[rows]
        g_d = gt.d_node.to_numpy()[rows]
        g_ep = np.array([None if int(f) == FLAG_SAME_SRC_FIRST
                         else epath_lookup(int(o), int(d))
                         for o, d, f in zip(g_o, g_d, g_flag)], dtype=object)

    eids = []
    for i, k in enumerate(keys):
        eids.append(k[1])
        ep = g_ep[i]
        if ep is not None and not (isinstance(ep, float) and np.isnan(ep)) and len(ep) > 0:
            eids.extend(int(e) for e in ep)
    eids.append(int(r_eid[-1]))
    dedup = [eids[0]] + [e for i, e in enumerate(eids[1:]) if e != eids[i]]
    res["epath"] = dedup

    if len(dedup) == 1:
        res["status"] = STATUS_FAILED if end_prob < cfg.prob_thres else STATUS_SAME_LINK
        return res

    _stitch_metrics(res, g_dsht, g_speed, g_distp, g_transp, end_prob,
                    len(keys), dir_trans)
    res["status"] = STATUS_FAILED if res["trans_prob"] < cfg.prob_thres else STATUS_SUCCESS
    return res


def _stitch_metrics(res: dict, g_dsht, g_speed, g_distp, g_transp,
                    end_prob: float, n_steps: int, dir_trans: bool) -> None:
    """dist / avg_speed / geometric-mean probabilities over the chosen steps
    (postprocess.py:60-85) — independent of the expanded path contents."""
    res["dist"] = float(g_dsht.sum())
    with np.errstate(invalid="ignore"):
        res["avg_speed"] = float(np.average(g_speed, weights=g_dsht)) \
            if g_dsht.sum() > 0 else float("nan")

    coef = 1.0 / n_steps
    dist_prob = float(np.prod(g_distp))
    trans_prob = float(np.prod(g_transp))
    res["norm_prob"] = float(np.power(end_prob, coef))
    res["dist_prob"] = float(np.power(dist_prob, coef))
    res["trans_prob"] = float(np.power(trans_prob, coef))
    if dir_trans:
        res["dir_prob"] = res["trans_prob"] / res["dist_prob"] if res["dist_prob"] else float("nan")
