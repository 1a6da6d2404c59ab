"""MJPEG-in-AVI codec (functions/avi.py) + multimodal frame sampling."""

from __future__ import annotations

import numpy as np
import pytest

from jsonl_dataingestion_pipeline_spark.functions.avi import (
    decode_avi,
    decode_avi_frames,
    encode_avi_mjpeg,
    is_avi,
)
from jsonl_dataingestion_pipeline_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _frames(n=10, h=24, w=32):
    out = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        out.append(
            np.stack(
                [(yy * 8 + t * 20) % 256, (xx * 6) % 256, np.full_like(yy, t * 25)],
                axis=2,
            ).astype(np.uint8)
        )
    return out


def test_avi_roundtrip():
    frames = _frames()
    avi = encode_avi_mjpeg(frames, fps=5.0, quality=92)
    assert is_avi(avi) and not is_avi(b"RIFFxxxxWAVE")
    jpegs, fps, w, h = decode_avi(avi)
    assert (len(jpegs), fps, w, h) == (10, 5.0, 32, 24)
    dec = decode_avi_frames(avi)
    assert all(_psnr(a, b) > 40.0 for a, b in zip(frames, dec))


def test_avi_frames_are_standalone_jpegs():
    avi = encode_avi_mjpeg(_frames(3), fps=10.0)
    jpegs, _, _, _ = decode_avi(avi)
    for j in jpegs:
        assert j[:2] == b"\xff\xd8"
        assert decode_jpeg(j).shape == (24, 32, 3)


def test_mjpeg_missing_dht_uses_default_tables():
    """The MJPEG convention allows frames without DHT segments; the
    decoder must fall back to the Annex-K tables and produce identical
    pixels (the encoder emits exactly those tables)."""
    img = _frames(1)[0]
    j = encode_jpeg(img, 85)
    stripped = bytearray()
    i = 0
    while i < len(j):
        if j[i] == 0xFF and i + 1 < len(j) and j[i + 1] == 0xC4:
            ln = int.from_bytes(j[i + 2 : i + 4], "big")
            i += 2 + ln
            continue
        stripped.append(j[i])
        i += 1
    assert np.array_equal(decode_jpeg(j), decode_jpeg(bytes(stripped)))


def test_corrupt_avi_rejected():
    with pytest.raises(ValueError):
        decode_avi(b"nope")
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], fps=10)


def test_sample_frames_real_avi(spark):
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import sample_frames

    frames = _frames(20)  # 2 s at 10 fps
    avi = encode_avi_mjpeg(frames, fps=10.0, quality=92)
    df = spark.createDataFrame(
        [(1, (bytearray(avi), "video/x-msvideo", 32, 24, 2000))],
        "id long, media struct<data:binary,mime:string,width:int,height:int,duration_ms:int>",
    )
    out = sample_frames(df, every_ms=500).first()["frames"]
    assert len(out) == 4  # t = 0, 500, 1000, 1500 ms
    for t_ms, frame_bytes in zip((0, 500, 1000, 1500), out):
        arr = decode_jpeg(bytes(frame_bytes))  # real standalone JPEG
        src = frames[round(t_ms * 10 / 1000)]
        assert _psnr(src, arr) > 40.0  # the right frame, really decoded


def test_extract_features_real_avi(spark):
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import (
        extract_features,
    )

    white = [np.full((8, 8, 3), 255, np.uint8)] * 3
    avi = encode_avi_mjpeg(white, fps=10.0, quality=95)
    df = spark.createDataFrame(
        [(1, (bytearray(avi), "video/x-msvideo", 8, 8, 300))],
        "id long, media struct<data:binary,mime:string,width:int,height:int,duration_ms:int>",
    )
    feats = extract_features(df).first()["features"]
    assert all(f == pytest.approx(1.0) for f in feats)  # middle frame is white
