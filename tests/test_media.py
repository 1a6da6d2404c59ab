"""Pure-stdlib PNG/WAV codec kernels + their multimodal operator wiring."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from jsonl_dataingestion_pipeline_spark.functions.media import (
    audio_features,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    image_features,
    is_png,
    is_wav,
    resize_nearest,
    PNG_SIG,
)


def _rng_img(h, w, c, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    img = _rng_img(13, 9, channels)
    out = decode_png(encode_png(img))
    assert out.shape == (13, 9, channels)
    assert np.array_equal(out, img)


def test_png_all_filters_decode():
    """Hand-build a PNG using filters 1-4 and verify against a naive
    per-byte reference reconstruction."""
    h, w, c = 6, 5, 3
    img = _rng_img(h, w, c, seed=3)
    stride = w * c

    # encode each row with filter (y % 4) + 1
    def enc_row(y, prev_row):
        f = (y % 4) + 1
        row = img[y].reshape(-1).astype(int)
        prev = prev_row.reshape(-1).astype(int)
        out = []
        for i in range(stride):
            a = row[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if f == 1:
                out.append((row[i] - a) % 256)
            elif f == 2:
                out.append((row[i] - b) % 256)
            elif f == 3:
                out.append((row[i] - (a + b) // 2) % 256)
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                out.append((row[i] - pred) % 256)
        return bytes([f]) + bytes(out)

    body = b""
    prev = np.zeros((w, c), dtype=np.uint8)
    for y in range(h):
        body += enc_row(y, prev)
        prev = img[y]

    def chunk(typ, payload):
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b"")
    assert np.array_equal(decode_png(png), img)


def test_png_resize_and_features():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:4, :4] = 255  # bright top-left quadrant
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    assert small[0, 0, 0] == 255 and small[3, 3, 0] == 0
    feats = image_features(img, grid=4)
    assert len(feats) == 16
    assert feats[0] == pytest.approx(1.0) and feats[15] == pytest.approx(-1.0)


def test_wav_roundtrip_and_features():
    rate = 8000
    t = np.arange(rate) / rate
    stereo = np.stack([np.sin(2 * np.pi * 440 * t) * 0.5, np.zeros_like(t)], axis=1)
    data = encode_wav(stereo, rate)
    assert is_wav(data) and not is_png(data)
    samples, r = decode_wav(data)
    assert r == rate and samples.shape == (rate, 2)
    assert np.abs(samples[:, 0] - stereo[:, 0]).max() < 1e-3  # 16-bit quantization
    feats = audio_features(samples, dim=16)
    assert len(feats) == 16
    # constant-amplitude sine -> all segments carry the same RMS
    assert max(feats) - min(feats) < 0.01


def test_extract_features_real_png_and_wav(spark):
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import (
        extract_features,
    )

    img = np.full((8, 8, 3), 255, dtype=np.uint8)  # pure white
    png = encode_png(img)
    silence = encode_wav(np.zeros(4000), 8000)
    df = spark.createDataFrame(
        [
            (1, (bytearray(png), "image/png", 8, 8, None)),
            (2, (bytearray(silence), "audio/wav", None, None, 500)),
            (3, (b"not-media", "application/octet-stream", None, None, None)),
        ],
        "id long, media struct<data:binary,mime:string,width:int,height:int,duration_ms:int>",
    )
    rows = {r["id"]: r for r in extract_features(df).collect()}
    feats = {k: r["features"] for k, r in rows.items()}
    assert all(f == pytest.approx(1.0) for f in feats[1])    # white -> +1 cells
    assert all(f == pytest.approx(-1.0) for f in feats[2])   # silence -> -1 RMS
    assert len(feats[3]) == 16                               # fake path still shaped
    # real decodes flagged real; the md5 stand-in flagged synthetic so it
    # can never be mistaken for decode output (VERDICT r3 item 6)
    assert not rows[1]["synthetic"] and not rows[2]["synthetic"]
    assert rows[3]["synthetic"]


def test_resize_images_real_png(spark):
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import resize_images

    img = _rng_img(16, 16, 3)
    df = spark.createDataFrame(
        [(1, (bytearray(encode_png(img)), "image/png", 16, 16, None))],
        "id long, media struct<data:binary,mime:string,width:int,height:int,duration_ms:int>",
    )
    m = resize_images(df, width=4, height=4).first()["media"]
    assert (m["width"], m["height"]) == (4, 4)
    out = decode_png(bytes(m["data"]))
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out, resize_nearest(img, 4, 4))  # real pixels, not fake


def test_sample_frames_real_wav(spark):
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import sample_frames

    rate = 1000
    wavb = encode_wav(np.linspace(-0.5, 0.5, 3500), rate)  # 3.5s at 1 kHz
    df = spark.createDataFrame(
        [(1, (bytearray(wavb), "audio/wav", None, None, 3500))],
        "id long, media struct<data:binary,mime:string,width:int,height:int,duration_ms:int>",
    )
    frames = sample_frames(df, every_ms=1000).first()["frames"]
    assert len(frames) == 4  # 3 full seconds + 0.5s remainder
    first, _ = decode_wav(bytes(frames[0]))
    assert first.shape[0] == 1000  # each chunk is a real standalone WAV


# --- property tests (hypothesis) -------------------------------------------
from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    img = _rng_img(h, w, c, seed=seed)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 3000),
    ch=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    rng = np.random.RandomState(seed)
    x = rng.uniform(-1, 1, size=(n, ch))
    y, r = decode_wav(encode_wav(x, rate))
    assert r == rate and y.shape == (n, ch)
    assert np.abs(y - x).max() < 1e-3


def test_image_ahash_and_neardup_pairs(spark):
    """aHash is stable under mild brightness shift + re-encode; the
    banded Hamming join finds the planted near-dup pair and nothing
    else."""
    import numpy as np

    from jsonl_dataingestion_pipeline_spark.functions.media import encode_png
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import (
        image_ahash,
        image_neardup_pairs,
    )

    rng = np.random.default_rng(3)
    base = (rng.integers(0, 2, (32, 32)) * 255).astype(np.uint8)
    bright = np.clip(base.astype(int) + 10, 0, 255).astype(np.uint8)
    other = (rng.integers(0, 2, (32, 32)) * 255).astype(np.uint8)

    rows = [
        (1, {"data": encode_png(base), "mime": "image/png",
             "width": 32, "height": 32, "duration_ms": None}),
        (2, {"data": encode_png(bright), "mime": "image/png",
             "width": 32, "height": 32, "duration_ms": None}),
        (3, {"data": encode_png(other), "mime": "image/png",
             "width": 32, "height": 32, "duration_ms": None}),
        (4, {"data": b"not an image", "mime": "text/plain",
             "width": None, "height": None, "duration_ms": None}),
    ]
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import (
        MEDIA_STRUCT,
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()),
         T.StructField("media", MEDIA_STRUCT)]
    )
    df = spark.createDataFrame(rows, schema)

    hashes = {r.id: r.ahash for r in image_ahash(df).collect()}
    assert hashes[4] is None
    assert hashes[1] == hashes[2]          # brightness shift: same bits
    assert hashes[1] != hashes[3]

    pairs = image_neardup_pairs(df, "id", max_hamming=6).collect()
    assert {(p.id_l, p.id_r) for p in pairs} == {(1, 2)}
    assert pairs[0].hamming == 0


def test_audio_fingerprint_and_neardup_pairs(spark):
    """The energy-envelope fingerprint is volume-invariant (integer
    cross-product comparison) and the banded Hamming join finds the
    planted 2x-volume twin and nothing else; non-audio -> NULL."""
    import numpy as np

    from jsonl_dataingestion_pipeline_spark.functions.media import encode_wav
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import (
        MEDIA_STRUCT,
        audio_fingerprint,
        audio_neardup_pairs,
    )
    from pyspark.sql import types as T

    rng = np.random.default_rng(9)
    base = rng.integers(-1000, 1001, 2048).astype(np.float64)
    loud = base * 2.0
    other = rng.integers(-1000, 1001, 2048).astype(np.float64)

    def wav(pcm):
        return {"data": encode_wav(pcm / 32767.0, 8000), "mime": "audio/wav",
                "width": None, "height": None, "duration_ms": 256}

    rows = [
        (1, wav(base)), (2, wav(loud)), (3, wav(other)),
        (4, {"data": b"not audio", "mime": "text/plain",
             "width": None, "height": None, "duration_ms": None}),
    ]
    schema = T.StructType(
        [T.StructField("id", T.LongType()),
         T.StructField("media", MEDIA_STRUCT)]
    )
    df = spark.createDataFrame(rows, schema)

    fps = {r.id: r.afp for r in audio_fingerprint(df).collect()}
    assert fps[4] is None
    assert fps[1] == fps[2]            # volume scaling: same bits
    assert fps[1] != fps[3]

    pairs = audio_neardup_pairs(df, "id", max_hamming=6).collect()
    assert {(p.id_l, p.id_r) for p in pairs} == {(1, 2)}
    assert pairs[0].hamming == 0


def test_energy_hash64_matches_integer_replay():
    """Pure-python replay of the integer cross-product definition."""
    import numpy as np

    from jsonl_dataingestion_pipeline_spark.operators.multimodal import (
        _energy_hash64,
    )

    rng = np.random.default_rng(4)
    mag = rng.integers(0, 2000, 1024).astype(np.int64)
    got = _energy_hash64(mag)
    n, total = 1024, int(mag.sum())
    bits = []
    for w in range(64):
        s = int(mag[w * 16:(w + 1) * 16].sum())
        bits.append(1 if s * n > total * 16 else 0)
    exp = 0
    for b in bits:
        exp = (exp << 1) | b
    exp = exp - (1 << 64) if exp >= (1 << 63) else exp
    assert got == exp
    # scale invariance
    assert _energy_hash64(mag * 3) == got
