"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched `mapInPandas`.

The decode step is CAPABILITY-DISPATCHED (the iceberg_available pattern,
sources/tables.py): `pil_available()` probes for PIL ONCE ON THE DRIVER
and the verdict is pinned into the UDF closure — never re-probed inside
tasks, so identical rows decode identically regardless of which worker
(or retry) runs them. When present the real decode runs, otherwise the
deterministic byte-derived pseudo-decode keeps the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) real and tested.
``fake=True`` forces the pseudo-decode (the reproducible test path
regardless of environment); ``fake=False`` demands the real decode and
raises NotImplementedError where PIL is absent; ``fake=None``
auto-dispatches on the driver probe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "url string, kind string, payload binary, width int, height int"
FEATURE_SCHEMA = "url string, kind string, n_bytes int, byte_mean double, byte_std double, feature array<double>"


def pil_available() -> bool:
    """Capability probe for the real image decode (PIL). Resolved on the
    driver only — the verdict is pinned into UDF closures so a
    heterogeneous cluster or a task retry on a different worker cannot
    change what identical rows decode to."""
    try:  # pragma: no cover - PIL not present in this container
        import PIL.Image  # noqa: F401
        return True
    except Exception:
        return False


def _pseudo_decode(payload: bytes) -> np.ndarray:
    """Deterministic byte-derived 8x8 'image' (np.resize tiling) — the
    no-PIL fallback that keeps downstream shapes exercised."""
    b = np.frombuffer(payload or b"\0", dtype=np.uint8)
    return np.resize(b, 64).reshape(8, 8)


def _real_decode(payload: bytes) -> np.ndarray:
    """PIL decode -> grayscale 8x8 (same output shape as the pseudo-decode
    so downstream feature schemas are identical)."""
    import io

    import PIL.Image
    img = PIL.Image.open(io.BytesIO(payload)).convert("L").resize((8, 8))
    return np.asarray(img, dtype=np.uint8)


def decode_image(payload: bytes, fake: bool | None = None) -> np.ndarray:
    """Decode an image payload to an 8x8 array.

    fake=None auto-dispatches on ``pil_available()``; fake=True forces the
    deterministic pseudo-decode; fake=False requires PIL and raises
    NotImplementedError where it is absent."""
    if fake is None:
        fake = not pil_available()
    if not fake:
        if not pil_available():
            raise NotImplementedError(
                "image decode requires PIL (absent in this container); "
                "fake=None auto-dispatches to the pseudo-decode")
        return _real_decode(payload)
    return _pseudo_decode(payload)


def extract_media_features(media: DataFrame,
                           fake: bool | None = None) -> DataFrame:
    """binary payload -> fixed-width feature vector, one Arrow pass,
    fully numpy-vectorized over the batch: payloads concatenate into one
    byte blob; per-doc byte stats come from prefix sums (exact — byte sums
    stay integral in float64), and the 8x8 pseudo-decode's row means come
    from one modular-index gather. No per-row Python in the hot loop.

    The decode capability is resolved ONCE on the driver and pinned into
    the closure: per-executor probing would make feature values depend on
    which worker ran the task (heterogeneous clusters / task retries →
    non-deterministic outputs, broken persist/recompute consistency).
    fake=None auto-dispatches on the driver's probe; fake=True pins the
    pseudo-decode (deterministic test path); fake=False demands PIL and
    raises where absent. On the real path, a payload PIL cannot decode
    falls back to the deterministic pseudo-decode (documented policy:
    undecodable bytes still produce a stable feature row rather than
    failing the whole batch — filter on n_bytes/kind upstream to audit).
    """
    if fake is False and not pil_available():
        raise NotImplementedError(
            "image decode requires PIL (absent in this container); "
            "fake=None auto-dispatches to the pseudo-decode")
    # pin the dispatch driver-side — every task decodes identically
    use_real = (fake is False) or (fake is None and pil_available())

    def _decode_row(p: bytes) -> np.ndarray:
        # catch DECODE failures only (undecodable bytes -> stable pseudo
        # feature). An ImportError must propagate: a worker without PIL
        # silently pseudo-decoding every row would reintroduce exactly
        # the per-worker nondeterminism the driver-side pinning exists to
        # eliminate — a missing-PIL executor fails loudly instead
        # (r6 ADVICE, medium).
        try:
            return _real_decode(p)
        except ImportError:
            raise
        except Exception:
            return _pseudo_decode(p)

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

            if use_real:
                # real decode: per-payload PIL (codecs are per-row by
                # nature); empty payloads produce a zero image and
                # undecodable payloads fall back to the pseudo-decode
                feature = np.vstack([
                    _decode_row(p).astype(np.float64).mean(axis=1)
                    if len(p) else np.zeros(8)
                    for p in pl]) if n else np.zeros((0, 8))
            # pseudo-decode: tile each payload to 64 bytes (np.resize
            # semantics; empty -> zeros), 8x8 row means
            elif blob.size == 0:
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
