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
    """binary payload -> fixed-width feature vector, one Arrow pass.
    The feature is the 8x8 pseudo-decode's row means — deterministic,
    schema-stable, replaceable by a real embedding model."""

    def op(batches):
        for pdf in batches:
            rows = []
            for url, kind, payload in zip(pdf.url, pdf.kind, pdf.payload):
                img = decode_image(bytes(payload or b""), fake=fake)
                b = np.frombuffer(bytes(payload or b"\0"), dtype=np.uint8).astype(np.float64)
                rows.append({
                    "url": url, "kind": kind, "n_bytes": len(payload or b""),
                    "byte_mean": float(b.mean()), "byte_std": float(b.std()),
                    "feature": img.mean(axis=1).astype(np.float64).tolist(),
                })
            yield pd.DataFrame(rows, columns=["url", "kind", "n_bytes",
                                              "byte_mean", "byte_std", "feature"])

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
