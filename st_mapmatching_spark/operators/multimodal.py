"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched `mapInPandas`.

The decode step is STUBBED in this container (no PIL/ffmpeg/librosa):
`decode_image` raises NotImplementedError unless `fake=True`, in which case
a deterministic byte-derived pseudo-decode runs so the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "url string, kind string, payload binary, width int, height int"
FEATURE_SCHEMA = "url string, kind string, n_bytes int, byte_mean double, byte_std double, feature array<double>"

_HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401
    _HAVE_PIL = True
except Exception:
    pass


def decode_image(payload: bytes, fake: bool = True) -> np.ndarray:
    """Decode an image payload to an array. Real decode requires PIL
    (absent here); fake mode derives a deterministic 8x8 'image' from the
    bytes so downstream shapes are exercised."""
    if not fake:
        if not _HAVE_PIL:
            raise NotImplementedError("image decode requires PIL; run with fake=True in this sandbox")
        raise NotImplementedError("real decode path not wired in this container")
    b = np.frombuffer(payload or b"\0", dtype=np.uint8)
    tiled = np.resize(b, 64).reshape(8, 8)
    return tiled


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """binary payload -> fixed-width feature vector, one Arrow pass,
    fully numpy-vectorized over the batch: payloads concatenate into one
    byte blob; per-doc byte stats come from prefix sums (exact — byte sums
    stay integral in float64), and the 8x8 pseudo-decode's row means come
    from one modular-index gather. No per-row Python in the hot loop.
    Real decode still requires PIL (stubbed in this container) — the
    fake pseudo-decode keeps schema/batch shapes real."""
    if not fake and not _HAVE_PIL:
        raise NotImplementedError("image decode requires PIL; run with fake=True in this sandbox")

    def op(batches):
        for pdf in batches:
            pl = [bytes(p) if p is not None else b"" for p in pdf.payload]
            lens = np.array([len(p) for p in pl], dtype=np.int64)
            n = len(pl)
            blob = np.frombuffer(b"".join(pl), dtype=np.uint8).astype(np.float64)
            starts = np.zeros(n, dtype=np.int64)
            if n > 1:
                starts[1:] = np.cumsum(lens)[:-1]
            cs = np.concatenate([[0.0], np.cumsum(blob)])
            cs2 = np.concatenate([[0.0], np.cumsum(blob * blob)])
            ends = starts + lens
            sums = cs[ends] - cs[starts]
            sums2 = cs2[ends] - cs2[starts]
            nz = lens > 0
            eff = np.maximum(lens, 1).astype(np.float64)
            mean = np.where(nz, sums / eff, 0.0)
            var = np.maximum(sums2 / eff - mean * mean, 0.0)
            std = np.where(nz, np.sqrt(var), 0.0)

            # pseudo-decode: tile each payload to 64 bytes (np.resize
            # semantics; empty -> zeros), 8x8 row means
            if blob.size == 0:
                # all payloads empty/null: gather below would index into an
                # empty array (np.where evaluates both branches)
                feature = np.zeros((n, 8))
            else:
                pos = np.arange(64, dtype=np.int64)
                idx = starts[:, None] + pos[None, :] % np.maximum(lens, 1)[:, None]
                tiled = np.where(nz[:, None], blob[np.minimum(idx, len(blob) - 1)], 0.0)
                feature = tiled.reshape(n, 8, 8).mean(axis=2)

            yield pd.DataFrame({
                "url": pdf.url.to_numpy(), "kind": pdf.kind.to_numpy(),
                "n_bytes": lens.astype(np.int32),
                "byte_mean": mean, "byte_std": std,
                "feature": [row.tolist() for row in feature],
            })

    return media.select("url", "kind", "payload").mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* (indices only — decode is stubbed):
    emits (url, frame_idx) rows for every_n-th frame based on metadata."""
    n_frames = F.greatest((F.length("payload") / 1024).cast("int"), F.lit(1))
    return (media.withColumn("frame_idx",
                             F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))))
            .select("url", "kind", "frame_idx"))


def pages_to_media(pages: DataFrame) -> DataFrame:
    """Treat each page's html payload as an opaque media blob (the fixture
    path for the multimodal plumbing)."""
    return pages.select("url", F.lit("image").alias("kind"),
                        F.col("html").alias("payload"),
                        F.lit(8).alias("width"), F.lit(8).alias("height"))
