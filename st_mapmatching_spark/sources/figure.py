"""Figure sink — the reference's matplotlib match plots re-expressed as a
dependency-free SVG renderer (SURVEY.md §2.1 "Figure sink"; reference
/root/reference/mapmatching/match/visualization.py:169-234
plot_matching_result and mapmatching/geo/vis/* — matplotlib + PIL tile
basemaps there; pure-text SVG here, since neither matplotlib nor PIL
exists in this sandbox and a figure is a *sink artifact*, not a query
result).

What a figure shows (the reference's plot_matching_result semantics):
the network edges as a light backdrop, the trajectory points, the
matched path (epath with the step_0/step_n fractional cuts applied —
the exact geometry `matched_path_geometry` materializes), O/D markers,
and a status/probability caption.

Scale shape: one cogrouped applyInPandas over (points, matched) keyed by
url — each url renders independently with the (bounded, broadcastable-
regime) network geometry broadcast once; no shuffle beyond the cogroup's
own url partitioning, no driver-side rendering. The svg column is plain
text: at fleet scale you land it in parquet/blob storage like any other
column (`save_figures` is the posix-filesystem convenience for local
inspection, one file per url, written executor-side).
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..graph.network import Network
from ..operators.postprocess import substring_frac

FIGURE_SCHEMA = "url string, svg string"

# palette mirrors the reference's plot choices (visualization.py:196-216:
# grey network, blue-ish points, red matched path, green O / blue D)
_C_EDGE = "#c8c8c8"
_C_POINT = "#1f77b4"
_C_PATH = "#d62728"
_C_O = "#2ca02c"
_C_D = "#17457b"


def _fmt(v: float) -> str:
    return f"{v:.2f}"


def _polyline(coords: np.ndarray, color: str, width: float,
              opacity: float = 1.0) -> str:
    pts = " ".join(f"{_fmt(x)},{_fmt(-y)}" for x, y in coords)
    return (f'<polyline points="{pts}" fill="none" stroke="{color}" '
            f'stroke-width="{width}" stroke-opacity="{opacity}" '
            f'stroke-linecap="round"/>')


def render_match_svg(pts_xy: np.ndarray, path_coords: list[np.ndarray],
                     edge_coords: dict, caption: str = "",
                     size: int = 800, margin_frac: float = 0.08) -> str:
    """One trajectory -> one SVG document (deterministic text).

    pts_xy: (n,2) trajectory points (metric xy); path_coords: list of cut
    edge polylines in path order (may be empty for unmatched);
    edge_coords: eid -> (k,2) polyline map for the backdrop network.
    SVG's y axis points down, so every y is negated."""
    boxes = [pts_xy] + [np.asarray(c) for c in path_coords if len(c)]
    allp = np.concatenate(boxes) if boxes else np.zeros((1, 2))
    x0, y0 = allp.min(axis=0)
    x1, y1 = allp.max(axis=0)
    span = max(x1 - x0, y1 - y0, 1.0)
    pad = span * margin_frac
    x0, x1 = x0 - pad, x1 + pad
    y0, y1 = y0 - pad, y1 + pad
    # stroke/marker sizes in user units so they stay visually constant
    u = (x1 - x0) / size
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
        f'height="{size}" viewBox="{_fmt(x0)} {_fmt(-y1)} '
        f'{_fmt(x1 - x0)} {_fmt(y1 - y0)}">',
        f'<rect x="{_fmt(x0)}" y="{_fmt(-y1)}" width="{_fmt(x1 - x0)}" '
        f'height="{_fmt(y1 - y0)}" fill="white"/>',
        "<g><!-- network backdrop -->",
    ]
    for eid in sorted(edge_coords):
        c = np.asarray(edge_coords[eid], dtype=np.float64)
        # clip the backdrop to the viewport (coarse bbox test) so the
        # figure stays O(view), not O(network)
        if (c[:, 0].max() < x0 or c[:, 0].min() > x1 or
                c[:, 1].max() < y0 or c[:, 1].min() > y1):
            continue
        parts.append(_polyline(c, _C_EDGE, 1.2 * u, opacity=0.8))
    parts.append("</g><g><!-- matched path -->")
    for c in path_coords:
        c = np.asarray(c, dtype=np.float64)
        if len(c) >= 2:
            parts.append(_polyline(c, _C_PATH, 3.0 * u))
    parts.append("</g><g><!-- trajectory points -->")
    for x, y in pts_xy:
        parts.append(f'<circle cx="{_fmt(x)}" cy="{_fmt(-y)}" '
                     f'r="{_fmt(2.2 * u)}" fill="{_C_POINT}" '
                     f'fill-opacity="0.7"/>')
    if len(pts_xy):
        ox, oy = pts_xy[0]
        dx, dy = pts_xy[-1]
        s = 4.0 * u
        parts.append(
            f'<rect x="{_fmt(ox - s / 2)}" y="{_fmt(-oy - s / 2)}" '
            f'width="{_fmt(s)}" height="{_fmt(s)}" fill="white" '
            f'stroke="{_C_O}" stroke-width="{_fmt(1.5 * u)}" '
            f'transform="rotate(45 {_fmt(ox)} {_fmt(-oy)})"/>')
        parts.append(
            f'<rect x="{_fmt(dx - s / 2)}" y="{_fmt(-dy - s / 2)}" '
            f'width="{_fmt(s)}" height="{_fmt(s)}" fill="white" '
            f'stroke="{_C_D}" stroke-width="{_fmt(1.5 * u)}"/>')
    parts.append("</g>")
    if caption:
        parts.append(
            f'<text x="{_fmt(x0 + 2 * u)}" y="{_fmt(-y1 + 14 * u)}" '
            f'font-family="monospace" font-size="{_fmt(12 * u)}" '
            f'fill="#333">{caption}</text>')
    parts.append("</svg>")
    return "\n".join(parts)


def _path_cut_coords(epath, step_0, step_n, edge_coords) -> list[np.ndarray]:
    """epath + fractional cuts -> list of edge polylines, mirroring
    matched_path_geometry's cut rules (postprocess.py:99-123 twin)."""
    if epath is None or len(epath) == 0:
        return []
    ep = [int(x) for x in epath]
    s0 = 0.0 if step_0 is None or not np.isfinite(step_0) else float(step_0)
    sn = 1.0 if step_n is None or not np.isfinite(step_n) else float(step_n)
    n = len(ep)
    out = []
    for i, eid in enumerate(ep):
        c = np.asarray(edge_coords[eid], dtype=np.float64)
        if n == 1:
            c = substring_frac(c, sn, s0)[::-1] if s0 > sn else \
                substring_frac(c, s0, sn)
        elif i == 0:
            c = substring_frac(c, s0, 1.0)
        elif i == n - 1:
            c = substring_frac(c, 0.0, sn)
        out.append(c)
    return out


def match_figures(points: DataFrame, matched: DataFrame, net: Network,
                  size: int = 800) -> DataFrame:
    """(points, matched) -> (url, svg): one SVG figure per trajectory,
    rendered executor-side with the network geometry broadcast once.

    points: (url, pid, x, y) metric points (extract_simplify output);
    matched: the match_pages/match_points result. Trajectories present in
    only one side still render (points-only -> no path; match-only ->
    path + empty point set), matching the reference plotter's tolerance
    of missing layers."""
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(net.edge_coords)

    def render(pts_pdf: pd.DataFrame, m_pdf: pd.DataFrame) -> pd.DataFrame:
        edge_coords = bc.value
        if len(pts_pdf):
            url = pts_pdf.url.iloc[0]
            p = pts_pdf.sort_values("pid")
            pts_xy = p[["x", "y"]].to_numpy(dtype=np.float64)
        else:
            url = m_pdf.url.iloc[0]
            pts_xy = np.zeros((0, 2))
        caption, path_coords = "", []
        if len(m_pdf):
            r = m_pdf.iloc[0]
            path_coords = _path_cut_coords(
                r.get("epath"), r.get("step_0"), r.get("step_n"), edge_coords)
            prob = r.get("prob")
            caption = f"status={int(r.status)}"
            if prob is not None and np.isfinite(prob):
                caption += f" prob={prob:.4f}"
        svg = render_match_svg(pts_xy, path_coords, edge_coords,
                               caption=caption, size=size)
        return pd.DataFrame({"url": [url], "svg": [svg]})

    m = matched.select("url", "status", "epath", "step_0", "step_n", "prob")
    return (points.select("url", "pid", "x", "y").groupBy("url")
            .cogroup(m.groupBy("url"))
            .applyInPandas(render, schema=FIGURE_SCHEMA))


def save_figures(figs: DataFrame, folder: str) -> int:
    """Write one `<slug>.svg` per url under folder (executor-side, posix
    convenience sink — the parquet/blob landing of the svg COLUMN is the
    fleet-scale path). Returns the number of files written."""
    os.makedirs(folder, exist_ok=True)

    def write_part(batches):
        k = 0
        for pdf in batches:
            for r in pdf.itertuples():
                # slug + short url hash: distinct urls that differ only in
                # stripped characters ('a/b' vs 'a_b') must not collide to
                # one filename and silently overwrite each other
                slug = re.sub(r"[^A-Za-z0-9._-]+", "_", r.url).strip("_")
                h = hashlib.sha1(r.url.encode()).hexdigest()[:8]
                with open(os.path.join(folder, f"{slug}-{h}.svg"), "w") as f:
                    f.write(r.svg)
                k += 1
        yield pd.DataFrame({"n": [k]})

    n = (figs.mapInPandas(write_part, schema="n long")
         .agg(F_sum_n()).collect()[0][0])
    return int(n or 0)


def F_sum_n():
    from pyspark.sql import functions as F
    return F.sum("n").alias("n")
