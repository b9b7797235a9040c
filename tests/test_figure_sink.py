"""Figure sink (sources/figure.py): the reference's matplotlib match plot
(match/visualization.py plot_matching_result) as a distributed SVG sink.

Pinned here: well-formed XML, the figure actually contains the layers the
reference plot has (network backdrop, matched path, points, O/D markers,
caption), byte-determinism across runs, one figure per url including
unmatched ones, and the posix save path round-trips."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from st_mapmatching_spark.operators.candidates import extract_simplify
from st_mapmatching_spark.operators.matching import match_pages
from st_mapmatching_spark.sources.figure import match_figures, save_figures

SVG_NS = "{http://www.w3.org/2000/svg}"


@pytest.fixture(scope="module")
def figs_pdf(spark, net, pages, cfg):
    pages_df = spark.createDataFrame(pages[["url", "text"]])
    pts = extract_simplify(pages_df, cfg)
    matched = match_pages(spark, pages_df, net, cfg)
    return (match_figures(pts, matched, net).toPandas()
            .sort_values("url").reset_index(drop=True))


def test_one_figure_per_url_and_valid_xml(figs_pdf, pages):
    assert sorted(figs_pdf.url) == sorted(pages.url)
    for svg in figs_pdf.svg:
        root = ET.fromstring(svg)  # raises on malformed XML
        assert root.tag == f"{SVG_NS}svg"
        assert "viewBox" in root.attrib


def test_layers_present_on_matched_trajectory(figs_pdf, spark, net, pages, cfg):
    pages_df = spark.createDataFrame(pages[["url", "text"]])
    matched = match_pages(spark, pages_df, net, cfg).toPandas()
    ok = matched[matched.status == 0].url.iloc[0]
    svg = figs_pdf[figs_pdf.url == ok].svg.iloc[0]
    root = ET.fromstring(svg)
    polys = root.iter(f"{SVG_NS}polyline")
    widths = sorted({p.attrib["stroke-width"] for p in polys}, key=float)
    # two stroke widths: thin backdrop + thick matched path
    assert len(widths) == 2
    circles = list(root.iter(f"{SVG_NS}circle"))
    assert len(circles) >= 2  # trajectory points
    rects = list(root.iter(f"{SVG_NS}rect"))
    assert len(rects) == 3  # background + O diamond + D square
    texts = list(root.iter(f"{SVG_NS}text"))
    assert len(texts) == 1 and "status=0" in texts[0].text
    assert "prob=" in texts[0].text


def test_unmatched_trajectory_renders_without_path(figs_pdf, spark, net,
                                                   pages, cfg):
    pages_df = spark.createDataFrame(pages[["url", "text"]])
    matched = match_pages(spark, pages_df, net, cfg).toPandas()
    bad = matched[matched.status == 3]
    if len(bad) == 0:
        pytest.skip("fixture has no status-3 trajectory")
    svg = figs_pdf[figs_pdf.url == bad.url.iloc[0]].svg.iloc[0]
    root = ET.fromstring(svg)
    widths = {p.attrib["stroke-width"] for p in root.iter(f"{SVG_NS}polyline")}
    assert len(widths) <= 1  # backdrop only — no matched-path layer
    texts = list(root.iter(f"{SVG_NS}text"))
    assert "status=3" in texts[0].text


def test_deterministic_across_runs(figs_pdf, spark, net, pages, cfg):
    pages_df = spark.createDataFrame(pages[["url", "text"]])
    pts = extract_simplify(pages_df, cfg)
    matched = match_pages(spark, pages_df, net, cfg)
    again = (match_figures(pts, matched, net).toPandas()
             .sort_values("url").reset_index(drop=True))
    assert (again.svg == figs_pdf.svg).all()


def test_save_figures_roundtrip(figs_pdf, spark, net, pages, cfg, tmp_path):
    pages_df = spark.createDataFrame(pages[["url", "text"]])
    pts = extract_simplify(pages_df, cfg)
    matched = match_pages(spark, pages_df, net, cfg)
    figs = match_figures(pts, matched, net)
    n = save_figures(figs, str(tmp_path))
    files = sorted(os.listdir(tmp_path))
    assert n == len(pages) and len(files) == len(pages)
    body = open(tmp_path / files[0]).read()
    assert body.startswith("<svg") and body.rstrip().endswith("</svg>")


def test_save_figures_slug_collision(spark, tmp_path):
    """Urls that differ only in slug-stripped characters ('a/b' vs 'a_b')
    must land in DISTINCT files — the returned count equals files on disk."""
    figs = spark.createDataFrame(
        [("http://x/a/b", "<svg xmlns='http://www.w3.org/2000/svg'></svg>"),
         ("http://x/a_b", "<svg xmlns='http://www.w3.org/2000/svg'></svg>")],
        "url string, svg string")
    n = save_figures(figs, str(tmp_path))
    assert n == 2 and len(os.listdir(tmp_path)) == 2


def test_backdrop_clipped_to_viewport(net):
    """The backdrop must stay O(view): a figure whose trajectory spans a
    corner of the grid must not include far-away edges."""
    from st_mapmatching_spark.sources.figure import render_match_svg
    pts = np.array([[0.0, 0.0], [50.0, 50.0]])
    svg = render_match_svg(pts, [], net.edge_coords)
    root = ET.fromstring(svg)
    n_back = len(list(root.iter(f"{SVG_NS}polyline")))
    assert 0 < n_back < len(net.edge_coords)
