"""t2/t3: oracle end-to-end over the synthetic fixtures — status codes,
text invariance of the extractor, recovery sanity."""

import hashlib

import numpy as np
import pytest

from st_mapmatching_spark.kernels import hmm
from st_mapmatching_spark.oracle.matcher import match_trajectory
from st_mapmatching_spark.sources.extract import extract_points


def _points_for(pages, url):
    pts = extract_points(pages[pages.url == url])
    return pts[["x", "y"]].to_numpy()


def test_extractor_pure_and_ordered(pages):
    before = [hashlib.sha256(t.encode()).hexdigest() for t in pages.text]
    pts = extract_points(pages)
    after = [hashlib.sha256(t.encode()).hexdigest() for t in pages.text]
    assert before == after  # byte-identical text per url
    for _, grp in pts.groupby("url"):
        assert list(grp.pid_raw) == sorted(grp.pid_raw)
    assert pts.url.nunique() == len(pages)


def test_status_one_point(pages, net, cfg):
    res = match_trajectory(_points_for(pages, "https://example.com/one_point"), net, cfg)
    assert res["status"] == hmm.STATUS_ONE_POINT
    assert len(res["epath"]) == 1


def test_status_no_candidates(pages, net, cfg):
    res = match_trajectory(_points_for(pages, "https://example.com/outside"), net, cfg)
    assert res["status"] == hmm.STATUS_NO_CANDIDATES
    assert res["epath"] is None


def test_status_same_link(pages, net, cfg):
    res = match_trajectory(_points_for(pages, "https://example.com/same_edge"), net, cfg)
    assert res["status"] in (hmm.STATUS_SAME_LINK, hmm.STATUS_ONE_POINT)


def test_duplicates_no_crash(pages, net, cfg):
    res = match_trajectory(_points_for(pages, "https://example.com/duplicates"), net, cfg)
    assert res["status"] in (hmm.STATUS_SUCCESS, hmm.STATUS_SAME_LINK,
                             hmm.STATUS_FAILED, hmm.STATUS_ONE_POINT)


def test_normal_trajs_match(pages, net, cfg):
    urls = [u for u in pages.url if "/traj/" in u]
    assert len(urls) >= 8
    ok = 0
    for u in urls:
        res = match_trajectory(_points_for(pages, u), net, cfg)
        assert res["status"] != hmm.STATUS_UNKNOWN
        if res["status"] in (hmm.STATUS_SUCCESS, hmm.STATUS_SAME_LINK):
            ok += 1
            assert res["epath"] is not None and len(res["epath"]) >= 1
            assert 0.0 <= res["step_0"] <= 1.0 and 0.0 <= res["step_n"] <= 1.0
            # epath edges must be a connected chain in the network
            for a, b in zip(res["epath"][:-1], res["epath"][1:]):
                assert net.edge_dst[a] == net.edge_src[b]
    assert ok >= len(urls) * 0.6  # most noisy walks should match
