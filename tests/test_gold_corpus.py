"""End-to-end GOLD-CORPUS acceptance: the reference repo's own real-world
data (reference eval.py:26-59) — the only non-self-referential truth.

The reference network checkpoint (data/network/LXD_graph.ckpt, a pickle of
GeoDataFrames) is extracted with the stub unpickler (sources/ckpt.py); the
16 real GPS trajectories are matched with the package-boundary matcher and
the resulting vpaths (net.vpath_from_epath == reference base.py:190-193)
are compared against data/trajs/gt.json.

Coverage caveats, pinned here rather than hidden:

* The LXD checkpoint covers only the Wanke-Yuncheng sub-area
  (reference README.md:79) — trajectories fully outside its bbox must
  come back status 3 (no candidates), mirroring the reference's bbox
  assert (matching.py:155-168).
* gt.json was generated against the FULL Shenzhen network
  (reference eval.py:66 loads Shenzhen_graph_pygeos.ckpt), so two covered
  trajectories legitimately differ on the clipped LXD network:
  - traj_4: the expected first gt edge (7834079836 -> 8526860922) does not
    exist in the LXD edge table at all; the reference README's own demo
    output for traj_4 on THIS network is epath [123..135]
    (README.md "输出示例"), which is exactly what we produce — pinned.
  - traj_2: the gt's first node likewise hangs off the clipped boundary;
    our vpath must be a suffix of the gt vpath.
"""

import glob
import json
import os

import numpy as np
import pytest

from st_mapmatching_spark.kernels import hmm
from st_mapmatching_spark.oracle.matcher import match_trajectory
from st_mapmatching_spark.sources.ckpt import reference_network

CKPT = "/root/reference/data/network/LXD_graph.ckpt"
TRAJS = "/root/reference/data/trajs"

pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="reference data not present")

# trajectories fully inside the LXD bbox whose gt vpath is reachable on
# the clipped network -> must match EXACTLY
EXACT = {"traj_3.geojson", "traj_5.geojson", "traj_6.geojson",
         "traj_7.geojson", "traj_8.geojson", "traj_14.geojson"}
README_DEMO_EPATH = list(range(123, 136))  # traj_4, README "输出示例"


@pytest.fixture(scope="module")
def gold():
    net, cfg = reference_network(CKPT)
    gt = {k: [int(v) for v in vs]
          for k, vs in json.load(open(f"{TRAJS}/gt.json")).items()}
    return net, cfg, gt


def _points(name):
    gj = json.load(open(f"{TRAJS}/{name}"))
    return np.array([f["geometry"]["coordinates"] for f in gj["features"]],
                    dtype=np.float64)


def _in_bbox_frac(pts, net, cfg, margin=50.0):
    from st_mapmatching_spark.kernels.projection import project_coords
    xy = project_coords(pts, cfg.lon0, cfg.lat0)
    x0, y0, x1, y1 = net.bbox_xy
    return float(np.mean((xy[:, 0] >= x0 - margin) & (xy[:, 0] <= x1 + margin)
                         & (xy[:, 1] >= y0 - margin) & (xy[:, 1] <= y1 + margin)))


def test_gold_corpus_precision(gold):
    net, cfg, gt = gold
    hits, misses = [], []
    for fn in sorted(glob.glob(f"{TRAJS}/*.geojson")):
        name = os.path.basename(fn)
        pts = _points(name)
        res = match_trajectory(pts, net, cfg)
        frac = _in_bbox_frac(pts, net, cfg)

        if frac == 0.0:
            # fully outside the clipped network: the bbox gate must fire
            assert res["status"] == hmm.STATUS_NO_CANDIDATES, name
            continue
        if frac < 1.0:
            continue  # partially covered: neither matchable nor a bbox case

        vp = net.vpath_from_epath(res["epath"]) if res["epath"] is not None else None
        ok = vp is not None and [int(v) for v in vp] == gt[name]
        (hits if ok else misses).append(name)

        if name in EXACT:
            assert ok, f"{name}: vpath {vp} != gt {gt[name]}"
        elif name == "traj_4.geojson":
            # gt unreachable on LXD; must reproduce the README demo epath
            assert [int(e) for e in res["epath"]] == README_DEMO_EPATH
        elif name == "traj_2.geojson":
            # boundary-clipped head: suffix of the full-network gt vpath
            assert vp is not None and gt[name][-len(vp):] == [int(v) for v in vp]

    # every EXACT trajectory hit; precision on the covered subset >= 0.75
    assert set(hits) >= EXACT
    assert len(hits) / (len(hits) + len(misses)) >= 0.75


def test_checkpoint_edge_lengths_consistent(gold):
    """Engine-recomputed metric edge lengths agree with the reference's
    EPSG:32649 lengths to within projection distortion (<2.5 m absolute;
    <0.5% relative — the equirectangular E-W scale error across the
    bbox's ~0.1 deg latitude span)."""
    from st_mapmatching_spark.sources.ckpt import load_reference_checkpoint
    net, _, _ = gold
    d = load_reference_checkpoint(CKPT)
    ref = d["df_edges"]["dist"].astype(float).to_numpy()
    got = net.edges["dist"].to_numpy()
    assert np.abs(got - ref).max() < 2.5
    nz = ref > 10
    assert (np.abs(got[nz] - ref[nz]) / ref[nz]).max() < 0.005


def test_gold_corpus_spark_engine_matches_oracle(gold, spark):
    """The distributed pipeline (match_points: cell-index candidate join +
    fused scoring + lockstep Viterbi) reproduces the package-boundary
    matcher edge-for-edge on the real LXD network and trajectories."""
    import pandas as pd
    from st_mapmatching_spark.operators.matching import match_points

    net, cfg, _ = gold
    from st_mapmatching_spark.kernels.projection import project_coords
    rows = []
    oracle = {}
    for fn in sorted(glob.glob(f"{TRAJS}/*.geojson")):
        name = os.path.basename(fn)
        pts = _points(name)
        if _in_bbox_frac(pts, net, cfg) < 1.0:
            continue
        res = match_trajectory(pts, net, cfg)
        oracle[name] = (res["status"],
                        None if res["epath"] is None else [int(e) for e in res["epath"]])
        # match_points consumes pre-simplified points (extract_simplify's
        # output); mirror the oracle's internal DP here
        from st_mapmatching_spark.kernels.simplify import simplify_points
        xy = project_coords(pts, cfg.lon0, cfg.lat0)
        if len(xy) > 1:
            xy = xy[simplify_points(xy, cfg.tolerance)]
        for i, (x, y) in enumerate(xy):
            rows.append((name, i, float(x), float(y)))

    pdf = pd.DataFrame(rows, columns=["url", "pid", "x", "y"])
    pdf["pid"] = pdf.pid.astype("int32")  # pipeline contract: pid is int
    points = spark.createDataFrame(pdf)
    out = match_points(spark, points, net, cfg).toPandas()
    got = {r.url: (int(r.status),
                   None if r.epath is None else [int(e) for e in r.epath])
           for r in out.itertuples()}
    assert got == oracle
