"""Reference-checkpoint loader: extract the road network from the
reference's pickled GeoGraph without geopandas/shapely/pyproj.

The reference persists its network as a pickle of the GeoGraph __dict__
(/root/reference/mapmatching/utils/serialization.py:7-16,19-31), whose
DataFrames embed GeoDataFrame/GeometryArray/CRS objects. This sandbox has
none of those libraries, so a custom ``pickle.Unpickler.find_class``
substitutes minimal stand-ins:

* ``GeoDataFrame``            -> plain ``pd.DataFrame`` (same BlockManager
                                 reconstruction path);
* ``GeometryArray``           -> a state-capturing stub, unwrapped to a
                                 plain object ndarray by a wrapped
                                 ``_unpickle_block`` so pandas builds an
                                 ordinary object block;
* ``shapely.io.from_wkb``     -> a 30-line WKB parser (Point/LineString);
* ``pyproj CRS`` / ``Astar``  -> inert attribute buckets;
* ``Int64Index``              -> ``pd.Index`` (removed in pandas 2.x).

``reference_network`` then converts the extracted edge table into this
engine's Network: the checkpoint stores projected EPSG:32649 geometry
(``ll=False`` in the reference build), which is mapped back to lon/lat via
the closed-form inverse transverse Mercator (kernels.tmerc) and
re-projected by the engine's pinned equirectangular plane.
"""

from __future__ import annotations

import pickle
import struct

import numpy as np
import pandas as pd


def parse_wkb(buf):
    """Minimal WKB parser: Point and LineString, either byte order.
    Returns (type_name, (n,2) coord array) or None for empty/unsupported
    payloads (the checkpoint carries a few placeholder buffers)."""
    if buf is None:
        return None
    b = bytes(buf)
    if len(b) < 5:
        return None
    bo = "<" if b[0] == 1 else ">"
    gtype, = struct.unpack_from(bo + "I", b, 1)
    gt = gtype & 0xFF
    if gt == 1:
        x, y = struct.unpack_from(bo + "2d", b, 5)
        return ("Point", np.array([[x, y]]))
    if gt == 2:
        n, = struct.unpack_from(bo + "I", b, 5)
        coords = np.frombuffer(b, dtype=bo + "f8", count=2 * n, offset=9).reshape(n, 2)
        return ("LineString", coords.copy())
    return None


def _from_wkb_stub(arr, **kw):
    out = np.empty(len(arr), dtype=object)
    for i, v in enumerate(arr):
        out[i] = parse_wkb(v)
    return out


class _CRSStub:
    def __init__(self, *a, **k):
        self.args = a

    @classmethod
    def from_user_input(cls, *a, **k):
        return cls(*a)

    def __setstate__(self, st):
        self.state = st


class _AttrBucket:
    def __init__(self, *a, **k):
        pass

    def __setstate__(self, st):
        self.__dict__.update(st if isinstance(st, dict) else {})


class _GeometryArrayStub:
    """Captures (parsed-geometry ndarray, crs); unwrapped to a plain object
    ndarray by the _unpickle_block wrapper."""

    def __new__(cls, *a, **k):
        return object.__new__(cls)

    def __setstate__(self, st):
        self.data = st[0]
        self.crs = st[1] if len(st) > 1 else None


def _unpickle_block_wrap(values, placement, ndim):
    from pandas._libs.internals import _unpickle_block
    if isinstance(values, _GeometryArrayStub):
        values = values.data.reshape(1, -1)
    return _unpickle_block(values, placement, ndim)


class StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):  # noqa: D102
        if (module, name) == ("geopandas.geodataframe", "GeoDataFrame"):
            return pd.DataFrame
        if (module, name) == ("geopandas.array", "GeometryArray"):
            return _GeometryArrayStub
        if (module, name) == ("pandas._libs.internals", "_unpickle_block"):
            return _unpickle_block_wrap
        if (module, name) == ("shapely.io", "from_wkb"):
            return _from_wkb_stub
        if module.startswith("pyproj"):
            return _CRSStub
        if (module, name) == ("pandas.core.indexes.numeric", "Int64Index"):
            return pd.Index
        if module.startswith("mapmatching."):
            return _AttrBucket
        return super().find_class(module, name)


def load_reference_checkpoint(path) -> dict:
    """GeoGraph __dict__ with df_edges / df_nodes / graph / eid_2_od ...
    (geometry columns hold raw WKB bytes — parse with parse_wkb)."""
    with open(path, "rb") as f:
        return StubUnpickler(f).load()


def reference_network(path, cfg=None):
    """(Network, cfg) from a reference checkpoint: EPSG:32649 edge
    geometry -> lon/lat (inverse transverse Mercator) -> the engine's
    pinned equirectangular plane. cfg defaults to MatchConfig pinned at
    the network's rounded centroid."""
    from ..config import MatchConfig
    from ..graph.network import Network
    from ..kernels.tmerc import tmerc_inverse

    d = load_reference_checkpoint(path)
    e = d["df_edges"]
    geoms = [parse_wkb(g)[1] for g in e["geometry"]]
    lls = []
    for g in geoms:
        lon, lat = tmerc_inverse(g[:, 0], g[:, 1], lon_cm=111.0)
        lls.append(np.stack([lon, lat], axis=1))

    if cfg is None:
        lon0 = round(float(np.mean([g[:, 0].mean() for g in lls])), 2)
        lat0 = round(float(np.mean([g[:, 1].mean() for g in lls])), 2)
        cfg = MatchConfig(lon0=lon0, lat0=lat0)

    edges = pd.DataFrame({
        "eid": e["eid"].astype(int).to_numpy(),
        "src": e["src"].astype(int).to_numpy(),
        "dst": e["dst"].astype(int).to_numpy(),
        "way_id": pd.to_numeric(e["way_id"], errors="coerce").fillna(-1).astype(int).to_numpy(),
        "dir": e["dir"].astype(int).to_numpy(),
        "speed": pd.to_numeric(e["speed"], errors="coerce").fillna(30 / 3.6)
                   .astype(float).to_numpy(),
    })
    edges["geom"] = lls
    nodes = pd.DataFrame({"nid": d["df_nodes"]["nid"].astype(int),
                          "x": 0.0, "y": 0.0})
    return Network(edges, nodes, cfg), cfg
