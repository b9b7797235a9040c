"""matched_path_geometry / resample_trajectory / match_details
(the reference's transform_res_2_path, geo/ops/resample, details=True)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from st_mapmatching_spark.kernels import metrics as M
from st_mapmatching_spark.operators.candidates import extract_trajs, simplify_trajs
from st_mapmatching_spark.operators.matching import match_pages
from st_mapmatching_spark.operators.postprocess import (match_details,
                                                        matched_path_geometry,
                                                        resample_trajectory,
                                                        substring_frac)


@pytest.fixture(scope="module")
def pages_df(spark, pages):
    return spark.createDataFrame(pages)


@pytest.fixture(scope="module")
def matched(spark, pages_df, net, cfg):
    return match_pages(spark, pages_df, net, cfg).persist()


def test_substring_frac_straight_segment():
    seg = np.array([[0.0, 0.0], [100.0, 0.0]])
    out = substring_frac(seg, 0.25, 0.75)
    assert np.allclose(out[0], [25.0, 0.0])
    assert np.allclose(out[-1], [75.0, 0.0])
    # full range is identity
    assert np.allclose(substring_frac(seg, 0.0, 1.0), seg)


def test_matched_path_geometry_matches_reference_formula(spark, matched, net):
    out = matched_path_geometry(matched, net).toPandas()
    assert len(out) > 0
    want = matched.filter(F.col("epath").isNotNull()).toPandas()
    for r in want.itertuples():
        ep = [int(e) for e in r.epath]
        rows = out[out.url == r.url].sort_values("seq")
        assert rows.eid.tolist() == ep, r.url
        # middle edges keep their full geometry/dist; first/last are cut
        s0 = 0.0 if not np.isfinite(r.step_0) else float(r.step_0)
        sn = 1.0 if not np.isfinite(r.step_n) else float(r.step_n)
        for i, rr in enumerate(rows.itertuples()):
            coords = np.asarray(net.edge_coords[int(rr.eid)], dtype=np.float64)
            full = float(np.linalg.norm(coords[1:] - coords[:-1], axis=1).sum())
            if len(ep) == 1:
                expect = full * (sn - s0)
            elif i == 0:
                expect = full * (1 - s0)
            elif i == len(ep) - 1:
                expect = full * sn
            else:
                expect = full
            assert rr.dist == pytest.approx(expect, rel=1e-9), (r.url, i)
            # row endpoints must lie on the edge's segment span
            c = np.vstack([np.asarray(p) for p in rr.coords])
            assert np.allclose([c[0, 0], c[0, 1]], [rr.x0, rr.y0])
            assert np.allclose([c[-1, 0], c[-1, 1]], [rr.x1, rr.y1])


def test_path_geometry_continuity(spark, matched, net):
    """Consecutive rows of one url must join end-to-start (the stitched
    matched path is a connected polyline)."""
    out = matched_path_geometry(matched, net).toPandas()
    for url, g in out.groupby("url"):
        g = g.sort_values("seq")
        for a, b in zip(g.itertuples(), list(g.itertuples())[1:]):
            assert np.hypot(a.x1 - b.x0, a.y1 - b.y0) < 1e-6, url


def test_resample_trajectory_matches_kernel(spark, pages_df, cfg):
    points = simplify_trajs(extract_trajs(pages_df), cfg)
    got = resample_trajectory(points, step=7.5).toPandas()
    pts = points.toPandas()
    for url, g in pts.groupby("url"):
        xy = g.sort_values("pid")[["x", "y"]].to_numpy()
        want = M.resample_polyline(xy, 7.5)
        sub = got[got.url == url].sort_values("seq")[["x", "y"]].to_numpy()
        assert np.allclose(sub, want), url


def test_match_details_parity_with_oracle(spark, pages_df, pages, net, cfg):
    from st_mapmatching_spark.oracle.matcher import match_trajectory
    from st_mapmatching_spark.sources.extract import extract_points
    det = match_details(spark, pages_df, net, cfg).toPandas()
    assert {"url", "pid_0", "pid_1", "eid_0", "eid_1", "flag", "observ_prob",
            "trans_prob", "dist_prob", "dir_prob"} <= set(det.columns)
    pts = extract_points(pages)
    url = "https://example.com/traj/3"
    r = match_trajectory(pts[pts.url == url][["x", "y"]].to_numpy(), net, cfg)
    want = r["pairs"][["pid_0", "eid_0", "eid_1", "flag", "dist_prob", "trans_prob"]]
    got = det[det.url == url][["pid_0", "eid_0", "eid_1", "flag", "dist_prob", "trans_prob"]]
    m = want.merge(got, on=["pid_0", "eid_0", "eid_1"], suffixes=("_w", "_g"))
    assert len(m) == len(want) == len(got)
    assert (m.flag_w == m.flag_g).all()
    assert np.allclose(m.dist_prob_w, m.dist_prob_g, rtol=1e-9, equal_nan=True)
    assert np.allclose(m.trans_prob_w, m.trans_prob_g, rtol=1e-9, equal_nan=True)
