"""Exercise the reference's REAL trajectory fixtures
(/root/reference/data/trajs/traj_*.geojson + gt.json) through the
Spark GeoJSON loader, datum kernels, and Douglas-Peucker — the loader
must round-trip coordinates exactly (io.py:7-26 semantics)."""

import json
from pathlib import Path

import numpy as np
import pytest

from st_mapmatching_spark.sources.geojson import load_labels, load_points_geojson

TRAJS = Path("/root/reference/data/trajs")

pytestmark = pytest.mark.skipif(not TRAJS.exists(),
                                reason="reference fixtures not present")


def _json_coords(fn: Path) -> np.ndarray:
    feats = json.loads(fn.read_text())["features"]
    return np.array([f["geometry"]["coordinates"] for f in feats])


def test_loader_roundtrips_real_files(spark):
    files = sorted(TRAJS.glob("traj_*.geojson"))
    assert len(files) >= 3
    got = (load_points_geojson(spark, str(TRAJS / "traj_*.geojson"))
           .toPandas().sort_values(["url", "pid_raw"]))
    for fn in files:
        exp = _json_coords(fn)
        g = got[got.url == fn.name]
        # order preserved, coordinates bitwise-exact, one row per feature
        assert list(g.pid_raw) == list(range(len(exp)))
        assert np.array_equal(g[["x", "y"]].to_numpy(), exp)


def test_labels_and_datum_and_simplify(spark, cfg):
    labels = {r["url"]: list(r["vpath"])
              for r in load_labels(spark, str(TRAJS / "gt.json")).collect()}
    raw = json.loads((TRAJS / "gt.json").read_text())
    assert labels.keys() == raw.keys()
    for k in raw:
        assert labels[k] == [int(v) for v in raw[k]]

    # datum: wgs -> gcj -> wgs round-trips within 1e-6 deg (~0.1 m) on
    # real Shenzhen coordinates (coordTransfrom_shp semantics)
    pts = load_points_geojson(spark, str(TRAJS / "traj_0.geojson"),
                              in_sys="wgs", out_sys="gcj").toPandas()
    back = _json_coords(TRAJS / "traj_0.geojson")
    from st_mapmatching_spark.kernels.datum import convert
    x2, y2 = convert(pts.x.to_numpy(), pts.y.to_numpy(), "gcj", "wgs")
    assert np.abs(np.stack([x2, y2], 1) - back).max() < 1e-6
    # the shift itself is real (hundreds of meters in deg terms)
    assert np.abs(pts[["x", "y"]].to_numpy() - back).max() > 1e-5

    # Douglas-Peucker over a real trajectory: endpoints kept, subset kept
    from st_mapmatching_spark.kernels.projection import project_coords
    from st_mapmatching_spark.kernels.simplify import simplify_points
    xy = project_coords(back, cfg.lon0, cfg.lat0)
    idx = simplify_points(xy, tolerance=5.0)
    assert idx[0] == 0 and idx[-1] == len(xy) - 1
    assert 1 < len(idx) <= len(xy)
