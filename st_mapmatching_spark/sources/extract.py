"""Deterministic coordinate extraction from page text.

The graft's replacement for the GeoJSON trajectory reader
(/root/reference/mapmatching/match/io.py:7-26): mine the ordered
coordinate trail from `text` with a fixed grammar. The extractor is a
pure function of `text` — it never mutates it (per-row invariant:
byte-identical extracted text per url) — and is vectorized so the engine
can run it inside `mapInPandas` over Arrow batches.
"""

from __future__ import annotations

import re

import pandas as pd

GEO_LINE = re.compile(r"^GEO (\d+) (-?\d+\.\d+) (-?\d+\.\d+) (\d+)$", re.MULTILINE)


def extract_points(pages: pd.DataFrame) -> pd.DataFrame:
    """pages(url, text, ...) -> points(url, pid_raw, x, y, t_epoch).

    ``pid_raw`` preserves the in-page order (the GEO index); downstream
    stages re-densify to 0..n-1 after simplification. Uses
    Series.str.extractall (C regex loop over the whole Arrow batch — no
    per-row Python).
    """
    hits = pages.set_index("url")["text"].str.extractall(GEO_LINE)
    hits.columns = ["pid_raw", "x", "y", "t_epoch"]
    hits = hits.reset_index(level=0).reset_index(drop=True)
    hits["pid_raw"] = hits.pid_raw.astype("int64")
    hits["x"] = hits.x.astype("float64")
    hits["y"] = hits.y.astype("float64")
    hits["t_epoch"] = hits.t_epoch.astype("int64")
    return hits.sort_values(["url", "pid_raw"]).reset_index(drop=True)
