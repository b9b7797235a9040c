"""Deterministic Common-Crawl-style `pages` fixture generator.

Produces the input table of BASELINE.json's input_hint —
pages(url string, warc_ts timestamp, html binary, text string, lang string)
— with an ordered coordinate trail embedded in `text` using the fixed
grammar ``GEO <i> <lon> <lat> <epoch>`` (FIXTURES.md §1). One trajectory
per url, synthesized as a noisy GPS walk over the synthetic network, plus
the degenerate cases the reference's status codes require
(/root/reference/mapmatching/match/status.py:3-9).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

import numpy as np
import pandas as pd

from ..config import MatchConfig
from ..graph.network import Network
from ..kernels.projection import xy_to_lonlat

_FILLER = [
    "<p>Lorem ipsum dolor sit amet, consectetur adipiscing elit.</p>",
    "The quick brown fox jumps over the lazy dog near the waterfront.",
    "Breaking: local transit agency publishes new route telemetry data.",
    "Contact us at example@example.com for api access and rate limits.",
]


def _random_walk_xy(net: Network, rng: np.random.Generator,
                    n_edges: int, step_m: float, noise_m: float) -> np.ndarray:
    """Noisy GPS samples along a random edge walk, in metric coords."""
    srcs = list(net.adj.keys())
    node = int(srcs[rng.integers(len(srcs))])
    coords = []
    prev = None
    for _ in range(n_edges):
        outs = net.adj.get(node)
        if not outs:
            break
        choices = [o for o in outs if prev is None or o[0] != prev] or list(outs)
        dst, _, eid = choices[rng.integers(len(choices))]
        coords.append(net.edge_coords[eid])
        prev, node = node, int(dst)
    if not coords:
        return np.empty((0, 2))
    line = np.concatenate([coords[0]] + [c[1:] for c in coords[1:]])
    seg = np.linalg.norm(line[1:] - line[:-1], axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    n_pts = max(2, int(total // step_m))
    s = np.linspace(0, total, n_pts)
    xs = np.interp(s, cum, line[:, 0])
    ys = np.interp(s, cum, line[:, 1])
    pts = np.stack([xs, ys], axis=1)
    pts += rng.normal(0.0, noise_m, pts.shape)
    return pts


def _render_text(rng: np.random.Generator, lonlat: np.ndarray, t0: int) -> str:
    lines = []
    for i, (lon, lat) in enumerate(lonlat):
        lines.append(_FILLER[rng.integers(len(_FILLER))])
        lines.append(f"GEO {i} {lon:.7f} {lat:.7f} {t0 + 15 * i}")
    lines.append(_FILLER[0])
    return "\n".join(lines)


def make_pages(net: Network, cfg: MatchConfig, n_trajs: int = 12,
               seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    t0 = 1_700_000_000
    rows = []

    def add(url: str, xy: np.ndarray):
        lon, lat = xy_to_lonlat(xy[:, 0], xy[:, 1], cfg.lon0, cfg.lat0)
        text = _render_text(rng, np.stack([lon, lat], axis=1), t0)
        html = (hashlib.md5(url.encode()).hexdigest() * 40).encode()
        rows.append((url, datetime.fromtimestamp(t0, tz=timezone.utc), html, text, "en"))

    for i in range(n_trajs):
        xy = _random_walk_xy(net, rng, n_edges=int(rng.integers(4, 14)),
                             step_m=45.0, noise_m=float(rng.uniform(2.0, 6.0)))
        if len(xy):
            add(f"https://example.com/traj/{i}", xy)

    # degenerate cases (FIXTURES.md §1)
    x0, y0, x1, y1 = net.bbox_xy
    near_edge = net.edge_coords[2][0] + np.array([7.0, 5.0])
    add("https://example.com/one_point", near_edge[None, :])
    add("https://example.com/outside", np.array([[x1 + 5000.0, y1 + 5000.0],
                                                 [x1 + 5100.0, y1 + 5100.0]]))
    e0 = net.edge_coords[0]
    mid = (e0[0] + e0[-1]) / 2
    add("https://example.com/same_edge", np.array([e0[0] * 0.75 + e0[-1] * 0.25,
                                                   mid, e0[0] * 0.25 + e0[-1] * 0.75]))
    walk = _random_walk_xy(net, rng, 6, 30.0, 5.0)
    dup = np.repeat(walk[: max(2, len(walk) // 2)], 2, axis=0)
    add("https://example.com/duplicates", dup)

    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
