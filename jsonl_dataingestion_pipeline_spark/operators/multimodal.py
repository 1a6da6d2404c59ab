"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

PNG, PCM-WAV, baseline JPEG, animated GIF, and MJPEG-AVI video
payloads get REAL decode / feature / resize / frame-sample kernels —
pure stdlib + numpy, no media libraries needed (``functions/media.py``,
``functions/jpeg.py``, ``functions/gif.py``, ``functions/avi.py``).
Only native-only video codecs (H.264 & friends, which genuinely
require external libraries)
fall back to a deterministic md5-seeded fake, clearly marked, so the
Spark-side plumbing (schema, Arrow batch shape, mapInPandas streaming
partitioning) is exercised for every mime type and swapping in ffmpeg
later is a per-format one-function change.

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

from ..functions import media as _codecs

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


def decode_available(data: bytes | None = None) -> bool:
    """True when the payload is a format with a real pure-stdlib decoder
    (PNG / PCM-WAV / baseline JPEG / GIF / MJPEG-AVI), or — with no
    payload — always True since those decoders ship with this package."""
    if data is None:
        return True
    return (
        _codecs.is_png(data)
        or _codecs.is_wav(data)
        or _codecs.is_jpeg(data)
        or _codecs.is_avi(data)
        or _codecs.is_gif(data)
    )


def _fake_features(data: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for formats without a stdlib codec
    (inter-frame video): md5-seeded so tests are stable. NOT a real
    decoder."""
    if data is None:
        return [0.0] * dim
    h = hashlib.md5(data).digest()
    return [((h[i % 16] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def _features_of(
    data: bytes | None, dim: int = FEATURE_DIM
) -> tuple[list[float], bool]:
    """(features, synthetic): real features for PNG/JPEG (4×4
    mean-pooled grayscale), WAV (16-segment RMS), and GIF / MJPEG-AVI
    (middle-frame image features on the composited canvas) with
    ``synthetic=False``; md5 fake with ``synthetic=True`` for
    everything else (native-only codecs, corrupt files) so downstream
    consumers can never mistake the stand-in for decode output."""
    if data is not None and _codecs.is_avi(data):
        try:
            jpegs, _fps, _w, _h = _codecs.decode_avi(data)
            mid = _codecs.decode_jpeg(jpegs[len(jpegs) // 2])
            return _codecs.image_features(mid, grid=4)[:dim], False
        except Exception:
            return _fake_features(data, dim), True
    if data is not None and _codecs.is_gif(data):
        try:
            gif_frames, _delays = _codecs.decode_gif(data)
            mid_frame = gif_frames[len(gif_frames) // 2]
            return _codecs.image_features(mid_frame, grid=4)[:dim], False
        except Exception:
            return _fake_features(data, dim), True
    if data is not None and (_codecs.is_png(data) or _codecs.is_jpeg(data)):
        try:
            arr = (
                _codecs.decode_png(data)
                if _codecs.is_png(data)
                else _codecs.decode_jpeg(data)
            )
            return _codecs.image_features(arr, grid=4)[:dim], False
        except Exception:
            return _fake_features(data, dim), True
    if data is not None and _codecs.is_wav(data):
        try:
            samples, _rate = _codecs.decode_wav(data)
            return _codecs.audio_features(samples, dim=dim), False
        except Exception:
            return _fake_features(data, dim), True
    return _fake_features(data, dim), True


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    out_col: str = "features",
    synthetic_col: str = "synthetic",
) -> DataFrame:
    """Decode + featurize media batches via mapInPandas (Arrow-batched).

    The per-partition generator shape is the real contract: batches stream
    through without materializing the partition, so binary payloads never
    blow executor memory even with multi-MB media values. PNG/JPEG/WAV/
    GIF/MJPEG-AVI decode for real; only native-only codecs get the
    documented deterministic fake, flagged ``synthetic=true`` in the
    output so fake features can't be mistaken for decode output
    (VERDICT r3 item 6).
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(out_col, T.ArrayType(T.DoubleType())),
            T.StructField(synthetic_col, T.BooleanType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            pdf = pdf.copy()
            pairs = [
                _features_of(m["data"] if m is not None else None)
                for m in media
            ]
            pdf[out_col] = [p[0] for p in pairs]
            pdf[synthetic_col] = [p[1] for p in pairs]
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

    PNG, baseline-JPEG, and GIF payloads (every frame of an animation)
    are really decoded, nearest-neighbor resized, and re-encoded in
    their own format; formats without a stdlib codec get the
    deterministic fake payload (metadata update is the contract either
    way).
    """
    schema = df.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            new_media = []
            for m in out[media_col]:
                if m is None:
                    new_media.append(None)
                    continue
                d = dict(m)
                data = d.get("data")
                resized = None
                if data is not None and _codecs.is_png(data):
                    try:
                        arr = _codecs.decode_png(data)
                        resized = _codecs.encode_png(
                            _codecs.resize_nearest(arr, width, height)
                        )
                    except Exception:
                        resized = None  # corrupt PNG -> fake payload
                elif data is not None and _codecs.is_jpeg(data):
                    try:
                        arr = _codecs.decode_jpeg(data)
                        resized = _codecs.encode_jpeg(
                            _codecs.resize_nearest(arr, width, height)
                        )
                    except Exception:
                        resized = None  # corrupt/progressive JPEG -> fake
                elif data is not None and _codecs.is_gif(data):
                    try:
                        gframes, delays = _codecs.decode_gif(data)
                        # nearest-neighbor keeps only original pixels, so
                        # the frames stay within the GIF's own palette
                        resized = _codecs.encode_gif(
                            [
                                _codecs.resize_nearest(g, width, height)
                                for g in gframes
                            ],
                            delays,
                        )
                    except Exception:
                        resized = None  # corrupt GIF -> fake payload
                if resized is None:
                    seed = hashlib.md5(data or b"").digest()
                    resized = (seed * ((width * height) // len(seed) + 1))[
                        : width * height // 64
                    ]
                d["data"] = resized
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
    """Sample media payloads into per-interval chunks (one binary each).

    PCM-WAV payloads are really segmented: the audio is decoded, sliced
    into ``every_ms`` windows, and each window re-encoded as a standalone
    WAV. MJPEG-AVI payloads are really sampled: the frame nearest each
    ``every_ms`` boundary is returned as its standalone JPEG bytes (no
    re-encode — MJPEG frames are independent JPEGs). Animated GIFs are
    really composited (transparency + disposal) and each sampled canvas
    re-encoded as a standalone PNG. Other video codecs
    need a native library, so those payloads get deterministic fake
    frames sized from the ``duration_ms`` metadata — the output schema
    and streaming batch shape are the tested contract either way.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.BinaryType()))]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            frames = []
            for m in out[media_col]:
                if m is None:
                    frames.append([])
                    continue
                data = m.get("data")
                if data is not None and _codecs.is_avi(data):
                    try:
                        jpegs, fps, _w, _h = _codecs.decode_avi(data)
                        if jpegs and fps > 0:
                            dur_ms = len(jpegs) / fps * 1000.0
                            picks = [
                                min(int(round(t * fps / 1000.0)), len(jpegs) - 1)
                                for t in range(0, max(int(dur_ms), 1), every_ms)
                            ]
                            frames.append([jpegs[i] for i in picks])
                            continue
                    except Exception:
                        pass  # corrupt AVI -> metadata-sized fake below
                if data is not None and _codecs.is_gif(data):
                    try:
                        gframes, delays = _codecs.decode_gif(data)
                        if gframes:
                            # composited canvases re-encoded as PNG: each
                            # sampled frame is a standalone viewable image
                            starts = []
                            t = 0
                            for d in delays:
                                starts.append(t)
                                t += max(d, 10)
                            picks, nxt = [], 0
                            for tick in range(0, max(t, 1), every_ms):
                                while (
                                    nxt + 1 < len(starts)
                                    and starts[nxt + 1] <= tick
                                ):
                                    nxt += 1
                                picks.append(nxt)
                            frames.append(
                                [
                                    _codecs.encode_png(gframes[i])
                                    for i in picks
                                ]
                            )
                            continue
                    except Exception:
                        pass  # corrupt GIF -> metadata-sized fake below
                if data is not None and _codecs.is_wav(data):
                    try:
                        samples, rate = _codecs.decode_wav(data)
                        step = max(1, (rate * every_ms) // 1000)
                        frames.append(
                            [
                                _codecs.encode_wav(samples[i : i + step], rate)
                                for i in range(0, len(samples), step)
                            ]
                        )
                        continue
                    except Exception:
                        pass  # corrupt WAV -> metadata-sized fake below
                if m.get("duration_ms") is None:
                    frames.append([])
                    continue
                n = max(1, int(m["duration_ms"]) // every_ms)
                seed = hashlib.md5(data or b"").digest()
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


def _gray_frame(data: bytes) -> "pd.Series | None":
    """First decodable image frame as a 2-D float grayscale array, or
    None for non-image / undecodable payloads."""
    import numpy as np

    try:
        if _codecs.is_png(data):
            arr = _codecs.decode_png(data)
        elif _codecs.is_jpeg(data):
            arr = _codecs.decode_jpeg(data)
        elif _codecs.is_gif(data):
            arr = _codecs.decode_gif(data)[0][0]
        else:
            return None
    except ValueError:
        return None
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3 and a.shape[2] >= 3:  # RGB(A) -> luma
        a = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    elif a.ndim == 3:  # single-channel plane
        a = a[..., 0]
    return a


def _ahash64(gray, grid: int = 8) -> int:
    """Average-hash: block-average to grid x grid, bit i = cell > mean.
    Pure integer/float numpy — deterministic across platforms (block
    sums are exact small-int sums; the mean comparison is IEEE)."""
    import numpy as np

    h, w = gray.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    cells = np.empty((grid, grid))
    for i in range(grid):
        for j in range(grid):
            block = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)]
            cells[i, j] = block.mean()
    bits = (cells > cells.mean()).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # to signed 64-bit (Spark LongType)
    return out - (1 << 64) if out >= (1 << 63) else out


def image_ahash(
    df: DataFrame, media_col: str = "media", out_col: str = "ahash"
) -> DataFrame:
    """Perceptual average-hash (aHash) per image payload — the LAION-
    style image-dedup signature: 64 bits from an 8x8 block-averaged
    grayscale thumbnail. Survives re-encoding and mild resizing; pairs
    within a small Hamming distance are near-duplicate images.

    Arrow-batched ``mapInPandas`` over the same streaming-generator
    contract as ``extract_features``; non-image payloads -> NULL.
    Compose with ``operators.dedup.simhash_near_pairs``'s banding (or
    :func:`image_neardup_pairs` below) for the pair join.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            hashes = []
            for m in pdf[media_col]:
                g = _gray_frame(m["data"]) if m is not None else None
                hashes.append(None if g is None else _ahash64(g))
            out[out_col] = pd.array(hashes, dtype="Int64")
            yield out

    return df.mapInPandas(gen, schema=out_schema)


def hash64_neardup_pairs(
    hashed: DataFrame,
    id_col: str,
    hash_col: str,
    *,
    max_hamming: int = 6,
    band_bits: int = 8,
) -> DataFrame:
    """Banded Hamming pair join over any 64-bit signature column
    (image aHash, audio energy hash, ...).

    Pigeonhole banding (64/band_bits bands; two hashes within
    ``max_hamming`` < n_bands share >= 1 exact band) keeps the join
    bucketed — identical plan shape to text SimHash dedup, so the same
    100 TB properties hold: no all-pairs, band buckets shrink as
    corpora diversify.  Returns (id_l, id_r, hamming).
    """
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    bands = hashed.select(
        F.col(id_col).alias("__id"),
        F.col(hash_col).alias("__h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col(hash_col), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select(
        "__id", "__h",
        F.col("b.band").alias("band"), F.col("b.key").alias("key"),
    )
    left = bands.select(
        "band", "key",
        F.col("__id").alias("id_l"), F.col("__h").alias("h_l"),
    )
    right = bands.select(
        "band", "key",
        F.col("__id").alias("id_r"), F.col("__h").alias("h_r"),
    )
    cand = (
        left.join(right, on=["band", "key"])
        .filter(F.col("id_l") < F.col("id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )
    ham = F.bit_count(F.col("h_l").bitwiseXOR(F.col("h_r")))
    return cand.select("id_l", "id_r", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def image_neardup_pairs(
    df: DataFrame,
    id_col: str,
    media_col: str = "media",
    *,
    max_hamming: int = 6,
    band_bits: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs: aHash -> banded Hamming join
    (:func:`hash64_neardup_pairs`). Returns (id_l, id_r, hamming)."""
    hashed = image_ahash(df, media_col).filter(F.col("ahash").isNotNull())
    return hash64_neardup_pairs(
        hashed, id_col, "ahash",
        max_hamming=max_hamming, band_bits=band_bits,
    )


def _energy_hash64(mag, windows: int = 64) -> int:
    """64-bit audio energy-envelope fingerprint from integer sample
    magnitudes (PCM units): bit w = window-w mean magnitude > overall
    mean magnitude, compared as the EXACT integer cross-product
    ``sum_w * n > total * len_w`` — no floating point anywhere, so the
    hash is replayable from the sample formula in SQL and invariant
    under global amplitude scaling (volume normalization), the audio
    analogue of aHash's brightness invariance."""
    import numpy as np

    n = len(mag)
    if n == 0:
        return 0
    mag = np.asarray(mag, dtype=np.int64)
    total = int(mag.sum())
    bounds = np.linspace(0, n, windows + 1).astype(int)
    out = 0
    for w in range(windows):
        lo, hi = bounds[w], max(bounds[w + 1], bounds[w] + 1)
        s = int(mag[lo:hi].sum())
        bit = 1 if s * n > total * (hi - lo) else 0
        out = (out << 1) | bit
    return out - (1 << 64) if out >= (1 << 63) else out


def audio_fingerprint(
    df: DataFrame, media_col: str = "media", out_col: str = "afp"
) -> DataFrame:
    """Energy-envelope fingerprint per PCM-WAV payload — the audio
    near-dup signature: 64 bits from 64 equal time slices of the first
    channel's integer sample magnitudes (see :func:`_energy_hash64`).
    Survives re-encoding and volume scaling; compose with
    :func:`hash64_neardup_pairs` (or :func:`audio_neardup_pairs`) for
    the pair join. Non-WAV payloads -> NULL. Arrow-batched
    ``mapInPandas`` under the same streaming-generator contract as
    ``image_ahash``."""
    import numpy as np

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            fps = []
            for m in pdf[media_col]:
                data = m["data"] if m is not None else None
                if data is None or not _codecs.is_wav(data):
                    fps.append(None)
                    continue
                try:
                    samples, _rate = _codecs.decode_wav(data)
                except (ValueError, NotImplementedError, EOFError):
                    fps.append(None)
                    continue
                # first channel, back to exact integer PCM units
                ch0 = samples[:, 0] if samples.ndim == 2 else samples
                mag = np.rint(np.abs(ch0) * 32768.0).astype(np.int64)
                fps.append(_energy_hash64(mag))
            out[out_col] = pd.array(fps, dtype="Int64")
            yield out

    return df.mapInPandas(gen, schema=out_schema)


def audio_neardup_pairs(
    df: DataFrame,
    id_col: str,
    media_col: str = "media",
    *,
    max_hamming: int = 6,
    band_bits: int = 8,
) -> DataFrame:
    """Near-duplicate audio pairs: energy fingerprint -> banded
    Hamming join (:func:`hash64_neardup_pairs`). Returns
    (id_l, id_r, hamming)."""
    hashed = audio_fingerprint(df, media_col).filter(
        F.col("afp").isNotNull()
    )
    return hash64_neardup_pairs(
        hashed, id_col, "afp",
        max_hamming=max_hamming, band_bits=band_bits,
    )


#: Magic-byte signatures for container sniffing: (mime, hex prefix,
#: byte offset). Crawl pipelines sniff because Content-Type headers
#: lie (~1-2% of CommonCrawl responses per the CC stats); the list
#: covers the containers a training-data pipeline routes on. RIFF and
#: ftyp need a second probe (handled in :func:`sniff_mime`).
MAGIC_SIGNATURES = (
    ("image/jpeg", "ffd8ff", 0),
    ("image/png", "89504e470d0a1a0a", 0),
    ("image/gif", "474946383", 0),       # GIF87a / GIF89a
    ("application/pdf", "25504446", 0),  # %PDF
    ("application/zip", "504b0304", 0),  # also docx/xlsx/epub
    ("application/gzip", "1f8b", 0),
    ("image/webp", "52494646", 0),       # RIFF....WEBP (probed)
    ("audio/wav", "52494646", 0),        # RIFF....WAVE (probed)
    ("video/mp4", "66747970", 4),        # ....ftyp
)


def sniff_mime(data: "Column") -> "Column":
    """Container type from MAGIC BYTES, not the transport header —
    pure Column expressions over the binary prefix (hex-compare; no
    UDF, no decode): the routing step before the media kernels above,
    because at crawl scale the server-declared Content-Type is wrong
    often enough to corrupt a modality split. Returns the sniffed
    mime or ``'application/octet-stream'``.

    RIFF containers (webp vs wav) disambiguate on bytes 8-11; the
    mp4 family keys on ``ftyp`` at offset 4 (any brand). Truncated
    payloads shorter than a signature simply don't match. Zero
    shuffle; at 100 TB this is a scan-bound projection over the
    binary column's FIRST 12 bytes (columnar readers never
    materialize the payload tail for it)."""
    h = F.lower(F.hex(F.substring(data, 1, 12)))
    riff_tag = F.substring(h, 17, 8)  # bytes 8..11 in hex chars
    out = F.lit("application/octet-stream")
    for mime, sig, off in reversed(MAGIC_SIGNATURES):
        cond = F.substring(h, off * 2 + 1, len(sig)) == sig
        if mime == "image/webp":
            cond = cond & (riff_tag == "57454250")  # WEBP
        elif mime == "audio/wav":
            cond = cond & (riff_tag == "57415645")  # WAVE
        out = F.when(cond, F.lit(mime)).otherwise(out)
    return out
