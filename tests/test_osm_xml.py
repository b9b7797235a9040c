"""OSM XML -> routable network ETL tests.

Covers the parse (tag semantics per the reference's
parse_osm_xml.py:21-155), the relational post-process (duplicate-way
drop, chain combining with signal exclusion, reverse twins, multi-edge
resolution + resegmentation, geometry assembly), and the end-to-end
criterion: a Network built from XML match-equals the same network built
directly.
"""

import io

import numpy as np
import pandas as pd
import pytest

from st_mapmatching_spark.config import MatchConfig
from st_mapmatching_spark.graph.network import Network
from st_mapmatching_spark.kernels.projection import project_coords
from st_mapmatching_spark.sources.osm_xml import (
    _parse_lanes,
    _parse_maxspeed,
    _parse_oneway,
    build_network_from_osm_xml,
    parse_osm_xml,
)

NODES = {
    1: (114.000, 22.500),
    2: (114.001, 22.500),   # traffic signal
    3: (114.002, 22.500),
    4: (114.002, 22.501),
    5: (114.003, 22.500),
    6: (114.0025, 22.5015),
}


def _fixture_xml() -> str:
    nodes = []
    for nid, (lon, lat) in NODES.items():
        tag = '<tag k="highway" v="traffic_signals"/>' if nid == 2 else ""
        nodes.append(f'<node id="{nid}" lon="{lon}" lat="{lat}">{tag}</node>')

    def way(wid, nds, **tags):
        t = "".join(f'<tag k="{k}" v="{v}"/>' for k, v in tags.items())
        n = "".join(f'<nd ref="{r}"/>' for r in nds)
        return f'<way id="{wid}">{n}{t}</way>'

    ways = [
        # A: signal at node 2 blocks chain combining -> stays 2 edges
        way(1, [1, 2, 3], highway="primary", oneway="yes", maxspeed="60",
            name="Main St", lanes="2"),
        # D: duplicate chain of A, higher level -> dropped
        way(2, [1, 2, 3], highway="secondary", oneway="yes"),
        # B: two-way -> reverse twin
        way(3, [3, 4], highway="residential", oneway="no"),
        # E: oneway=-1 -> node list reversed at parse time (travel 3->5)
        way(4, [5, 3], highway="tertiary", oneway="-1"),
        # F: node 6 is 1-in/1-out -> combines to 4->5 via 6; loses the
        # multi-edge contest to J on dist -> resegmented to (4,6),(6,5)
        way(5, [4, 6, 5], highway="tertiary", oneway="yes", maxspeed="30 mph"),
        # G: footway -> filtered out
        way(6, [1, 3], highway="footway"),
        # I: references a node absent from the file -> dropped
        way(7, [3, 99], highway="primary", oneway="yes"),
        # J: direct 4->5, shorter than F's chain -> wins the multi-edge
        way(9, [4, 5], highway="primary", oneway="yes"),
    ]
    return ("<?xml version='1.0'?><osm>"
            + "".join(nodes) + "".join(ways) + "</osm>")


# (src, dst, way_id, dir) of every edge that must survive the build
EXPECTED_EDGES = [
    (1, 2, 1, 1), (2, 3, 1, 1),          # A split by the signal
    (4, 3, 3, -1), (3, 4, 3, 1),         # B + reverse twin
    (3, 5, 4, 1),                        # E (reversed at parse)
    (4, 6, 5, 1), (6, 5, 5, 1),          # F resegmented
    (4, 5, 9, 1),                        # J beat F on dist
]


def test_tag_parsers():
    assert _parse_oneway(None) == (True, False)      # conservative default
    assert _parse_oneway("yes") == (True, False)
    assert _parse_oneway("no") == (False, False)
    assert _parse_oneway("-1") == (True, True)
    assert _parse_maxspeed("60") == 60
    assert _parse_maxspeed("30 mph") == 48
    assert _parse_maxspeed("50 km/h") == 50
    assert _parse_maxspeed("none") is None
    assert _parse_lanes("2") == 2
    assert _parse_lanes("2;3") == 2
    assert _parse_lanes(None) is None


def test_parse_osm_xml_tags():
    ways, nodes, edges = parse_osm_xml(io.StringIO(_fixture_xml()))
    wids = set(ways.way_id)
    assert 6 not in wids           # footway filtered
    assert 7 not in wids           # missing-node way dropped
    assert set(nodes.nid) == set(NODES)  # node 99 never referenced validly
    assert nodes.set_index("nid").ctrl_type[2] == "signal"
    assert nodes.set_index("nid").ctrl_type.drop(2).isna().all()

    w = ways.set_index("way_id")
    assert w.loc[1, "name"] == "Main St"
    assert w.loc[1, "maxspeed"] == 60 and w.loc[1, "lanes"] == 2
    assert w.loc[5, "maxspeed"] == 48
    assert list(w.loc[4, "nodes"]) == [3, 5]   # oneway=-1 reversed
    assert not w.loc[3, "oneway"] and w.loc[1, "oneway"]
    # per-segment edge rows
    a = edges[edges.way_id == 1].sort_values("order")
    assert list(zip(a.src, a.dst)) == [(1, 2), (2, 3)]


@pytest.fixture(scope="module")
def built(spark):
    cfg = MatchConfig()
    net, edges_pd = build_network_from_osm_xml(
        spark, io.StringIO(_fixture_xml()), cfg)
    return net, edges_pd, cfg


def test_network_build_edges(spark, built):
    _, edges_pd, _ = built
    got = sorted(zip(edges_pd.src, edges_pd.dst, edges_pd.way_id, edges_pd["dir"]))
    assert got == sorted(EXPECTED_EDGES)
    e = edges_pd.set_index(["src", "dst"])
    # chain combining recorded the waypoint chain before resegmentation
    assert list(e.loc[(4, 5), "waypoints"]) == [4, 5]       # J direct
    assert list(e.loc[(2, 3), "waypoints"]) == [2, 3]
    # attributes rode through the whole build
    assert e.loc[(1, 2), "name"] == "Main St"
    assert e.loc[(4, 6), "maxspeed"] == 48
    assert e.loc[(1, 2), "road_type"] == "primary"
    assert e.loc[(3, 4), "speed"] == pytest.approx(30 / 3.6)
    assert e.loc[(3, 5), "speed"] == pytest.approx(40 / 3.6)
    # geometry assembled from node coordinates, reverse twin reversed
    assert np.allclose(e.loc[(4, 3), "geom"], [NODES[4], NODES[3]])
    assert np.allclose(e.loc[(2, 3), "geom"], [NODES[2], NODES[3]])
    # eids deterministic: row_number over (way_id, dir, order)
    assert sorted(edges_pd.eid) == list(range(len(edges_pd)))


def _direct_network(cfg: MatchConfig) -> Network:
    rows = []
    speeds = {1: 80 / 3.6, 3: 30 / 3.6, 4: 40 / 3.6, 5: 40 / 3.6, 9: 80 / 3.6}
    order = {}
    for src, dst, wid, d in EXPECTED_EDGES:
        order.setdefault((wid, d), []).append((src, dst))
    eid = 0
    for (wid, d) in sorted(order):
        for src, dst in order[(wid, d)]:
            rows.append((eid, src, dst, wid, d, speeds[wid],
                         [list(NODES[src]), list(NODES[dst])]))
            eid += 1
    edges = pd.DataFrame(rows, columns=["eid", "src", "dst", "way_id", "dir",
                                        "speed", "geom"])
    nodes = pd.DataFrame([(n, x, y) for n, (x, y) in NODES.items()],
                         columns=["nid", "x", "y"])
    return Network(edges, nodes, cfg)


def test_match_equals_direct_build(spark, built):
    """The verdict's done-criterion: matching on the XML-built network
    equals matching on the identical directly-constructed network."""
    from st_mapmatching_spark.operators.matching import match_points

    net_xml, _, cfg = built
    net_direct = _direct_network(cfg)

    lons = [114.0002, 114.0008, 114.0012, 114.0018, 114.0019]
    pts = project_coords(np.array([[lo, 22.50003] for lo in lons]),
                         cfg.lon0, cfg.lat0)
    pdf = pd.DataFrame({"url": "t0",
                        "pid": np.arange(len(pts), dtype=np.int32),
                        "x": pts[:, 0], "y": pts[:, 1]})
    points = spark.createDataFrame(pdf)

    res = []
    for net in (net_xml, net_direct):
        r = (match_points(spark, points, net, cfg).toPandas()
             .sort_values("url").reset_index(drop=True))
        r["epath"] = r.epath.map(lambda e: None if e is None else [int(x) for x in e])
        res.append(r)
    a, b = res
    assert a.status.iat[0] == 0
    assert a.epath.iat[0] == [0, 1]  # 1->2 then 2->3 along Main St
    pd.testing.assert_frame_equal(a, b)


def test_distributed_parse_equals_driver_parse(spark, tmp_path):
    """Block-split mapInPandas tag scan == driver streaming parse, for
    several block counts (boundary alignment exercises element ownership
    by byte offset; the fixture is a single line, so alignment cannot
    rely on newlines)."""
    import io
    import __spark_entry__ as E
    from st_mapmatching_spark.sources.osm_xml import (parse_osm_xml,
                                                      parse_osm_xml_distributed)
    xml = E._osm_fixture_xml()
    fn = tmp_path / "fixture.osm"
    fn.write_text(xml)

    ways_d, nodes_d, edges_d = parse_osm_xml(io.StringIO(xml))
    for n_blocks in (1, 3, 8, 17):
        ways_b, nodes_b, edges_b = parse_osm_xml_distributed(
            spark, str(fn), n_blocks=n_blocks, max_element_bytes=4096)
        pd.testing.assert_frame_equal(ways_b, ways_d)
        pd.testing.assert_frame_equal(nodes_b, nodes_d)
        pd.testing.assert_frame_equal(edges_b, edges_d)


def test_distributed_parse_large_relations_tail(spark, tmp_path):
    """Round-4 ADVICE repro: a relations section larger than the block
    lookahead used to crash the block-split parser with ET.ParseError
    (the cut fell through to len(data), splitting a relation mid-tag).
    The cut regex now also stops at <relation starts and an oversized
    straddling relation is cut at its own start, so the distributed parse
    must equal the driver parse byte-for-byte."""
    import io
    import __spark_entry__ as E
    from st_mapmatching_spark.sources.osm_xml import (parse_osm_xml,
                                                      parse_osm_xml_distributed)
    xml = E._osm_fixture_xml()
    # ~1.2 MB of relations appended before </osm>: a few huge ones (each
    # far above the 4096-byte lookahead) plus many small ones, all on one
    # line like real exports
    members = "".join(f'<member type="way" ref="{i}" role=""/>'
                      for i in range(12_000))
    big = [f'<relation id="{900 + k}">{members}'
           f'<tag k="type" v="route"/></relation>' for k in range(3)]
    small = [f'<relation id="{100 + k}"><member type="node" ref="1" role=""/>'
             f'</relation>' for k in range(50)]
    tail = "".join(small) + "".join(big)
    assert len(tail) > 1_200_000
    fat = xml.replace("</osm>", tail + "</osm>")
    fn = tmp_path / "fat_relations.osm"
    fn.write_text(fat)

    ways_d, nodes_d, edges_d = parse_osm_xml(io.StringIO(xml))
    for n_blocks in (4, 8):
        ways_b, nodes_b, edges_b = parse_osm_xml_distributed(
            spark, str(fn), n_blocks=n_blocks, max_element_bytes=4096)
        pd.testing.assert_frame_equal(ways_b, ways_d)
        pd.testing.assert_frame_equal(nodes_b, nodes_d)
        pd.testing.assert_frame_equal(edges_b, edges_d)


def test_distributed_parse_oversized_owned_way_raises(spark, tmp_path):
    """An owned <way> larger than max_element_bytes is a genuine
    truncation: the parser must fail loud with ValueError (advice: never
    ET.ParseError from an arbitrary mid-element cut)."""
    from st_mapmatching_spark.sources.osm_xml import parse_osm_xml_distributed
    nodes = "".join(f'<node id="{i}" lon="114.{i:04d}" lat="22.5"/>'
                    for i in range(3000))
    nds = "".join(f'<nd ref="{i}"/>' for i in range(3000))
    way = f'<way id="1">{nds}<tag k="highway" v="primary"/></way>'
    assert len(way) > 4096
    xml = f'<osm>{nodes}{way}</osm>'
    fn = tmp_path / "fat_way.osm"
    fn.write_text(xml)
    with pytest.raises(Exception) as ei:
        parse_osm_xml_distributed(spark, str(fn), n_blocks=8,
                                  max_element_bytes=4096)
    assert "max_element_bytes" in str(ei.value)


def test_build_network_auto_dispatches_distributed(spark, tmp_path, monkeypatch):
    """Default ingest must pick the scale-safe block-split parse above the
    size threshold (round-4 VERDICT item 5) and produce a network identical
    to the driver-parse build."""
    import __spark_entry__ as E
    from st_mapmatching_spark.sources import osm_xml as O
    xml = E._osm_fixture_xml()
    fn = tmp_path / "fixture.osm"
    fn.write_text(xml)

    calls = {"dist": 0, "driver": 0}
    real_dist, real_driver = O.parse_osm_xml_distributed, O.parse_osm_xml

    def spy_dist(*a, **k):
        calls["dist"] += 1
        return real_dist(*a, **k)

    def spy_driver(*a, **k):
        calls["driver"] += 1
        return real_driver(*a, **k)

    monkeypatch.setattr(O, "parse_osm_xml_distributed", spy_dist)
    monkeypatch.setattr(O, "parse_osm_xml", spy_driver)

    # below threshold -> driver parse
    net_small, edges_small = O.build_network_from_osm_xml(spark, str(fn))
    assert calls == {"dist": 0, "driver": 1}

    # force the threshold under the fixture size -> distributed parse
    monkeypatch.setattr(O, "DISTRIBUTED_PARSE_THRESHOLD_BYTES", 10)
    net_big, edges_big = O.build_network_from_osm_xml(spark, str(fn))
    assert calls == {"dist": 1, "driver": 1}
    pd.testing.assert_frame_equal(edges_big, edges_small)
    pd.testing.assert_frame_equal(net_big.edges, net_small.edges)
    pd.testing.assert_frame_equal(net_big.nodes, net_small.nodes)


def test_overpass_downloader_plumbing(tmp_path):
    """Downloader twin (reference osmnet/downloader.py:5-45): URL built
    from a bbox list, response streamed to disk atomically, idempotent on
    an existing file, and the resulting XML feeds the normal parser. The
    transport is injected (no network in this sandbox); the default
    fetcher raises actionable guidance instead of the reference's silent
    False."""
    import io

    import __spark_entry__ as E
    from st_mapmatching_spark.sources.osm_xml import (download_osm_xml,
                                                      parse_osm_xml)

    xml = E._osm_fixture_xml().encode()
    seen = {}

    def mock_fetcher(url):
        seen["url"] = url
        return iter([xml[:100], xml[100:]])

    fn = tmp_path / "cache" / "fixture.osm.xml"
    assert download_osm_xml(fn, [114.038, 22.516, 114.069, 22.565],
                            fetcher=mock_fetcher)
    assert seen["url"] == ("http://overpass-api.de/api/map?"
                           "bbox=114.038,22.516,114.069,22.565")
    assert fn.read_bytes() == xml
    assert not fn.with_suffix(".xml.part").exists()
    ways, nodes, edges = parse_osm_xml(io.StringIO(fn.read_text()))
    assert len(ways) > 0 and len(nodes) > 0

    # idempotent: existing file short-circuits, fetcher not called
    def exploding_fetcher(url):
        raise AssertionError("must not fetch when the file exists")
    assert download_osm_xml(fn, [0, 0, 1, 1], fetcher=exploding_fetcher)

    # no-network default: raises with guidance, never silent False
    import pytest as _pytest
    from st_mapmatching_spark.sources import osm_xml as O
    with _pytest.raises(RuntimeError, match="network"):
        download_osm_xml(tmp_path / "x.osm", "0,0,1,1",
                         fetcher=lambda u: O._default_fetcher("http://127.0.0.1:9/nope"))
