"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode/feature kernels are the only pieces that need media libraries
(not available in this container) — they are STUBBED behind
``decode_available()`` with a deterministic fake so the Spark-side
plumbing (schema, Arrow batch shape, mapInPandas partitioning) is real
and tested. Swapping the fake for PIL/torchaudio is a one-function change.

Schema convention:
    media: struct<data: binary, mime: string, width: int, height: int,
                  duration_ms: int>
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 16


def decode_available() -> bool:
    """True when a real media decoder (PIL etc.) is importable."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_features(data: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector.

    md5-seeded so tests are stable. NOT a real decoder — see module doc.
    """
    if data is None:
        return [0.0] * dim
    h = hashlib.md5(data).digest()
    return [((h[i % 16] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def extract_features(
    df: DataFrame, media_col: str = "media", out_col: str = "features"
) -> DataFrame:
    """Decode + featurize media batches via mapInPandas (Arrow-batched).

    The per-partition generator shape is the real contract: batches stream
    through without materializing the partition, so binary payloads never
    blow executor memory even with multi-MB media values.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )
    use_real = decode_available()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:
                raise NotImplementedError(
                    "real media decode not wired yet — install PIL and "
                    "implement decode here"
                )
            media = pdf[media_col]
            pdf = pdf.copy()
            pdf[out_col] = [
                _fake_features(m["data"] if m is not None else None) for m in media
            ]
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def resize_images(
    df: DataFrame,
    media_col: str = "media",
    *,
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """Resize image payloads (Arrow-batched mapInPandas).

    Decode/re-encode is stubbed (see module doc): the fake produces a
    deterministic byte payload of the right conceptual shape and updates
    the typed metadata (width/height), which is the Spark-side contract.
    """
    schema = df.schema
    use_real = decode_available()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:
                raise NotImplementedError(
                    "real image resize not wired — install PIL and decode here"
                )
            out = pdf.copy()
            new_media = []
            for m in out[media_col]:
                if m is None:
                    new_media.append(None)
                    continue
                d = dict(m)
                seed = hashlib.md5(d.get("data") or b"").digest()
                d["data"] = (seed * ((width * height) // len(seed) + 1))[
                    : width * height // 64
                ]
                d["width"], d["height"] = width, height
                new_media.append(d)
            out[media_col] = new_media
            yield out

    return df.mapInPandas(gen, schema=schema)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    *,
    every_ms: int = 1000,
    out_col: str = "frames",
) -> DataFrame:
    """Sample video payloads into frame arrays (one binary per sample).

    Frame extraction is stubbed; the output schema
    (``array<binary>`` sized from duration/every_ms) and the streaming
    batch shape are the real, tested contract.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.BinaryType()))]
    )
    use_real = decode_available()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:
                raise NotImplementedError(
                    "real frame sampling not wired — add a video decoder here"
                )
            out = pdf.copy()
            frames = []
            for m in out[media_col]:
                if m is None or m.get("duration_ms") is None:
                    frames.append([])
                    continue
                n = max(1, int(m["duration_ms"]) // every_ms)
                seed = hashlib.md5(m.get("data") or b"").digest()
                frames.append(
                    [hashlib.md5(seed + bytes([i % 256])).digest() for i in range(n)]
                )
            out[out_col] = frames
            yield out

    return df.mapInPandas(gen, schema=out_schema)


def media_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Cheap metadata pass — no decode: sizes, mime distribution."""
    m = F.col(media_col)
    return df.select(
        F.col("*"),
        F.octet_length(m.getField("data")).alias("media_bytes"),
        m.getField("mime").alias("media_mime"),
    )
