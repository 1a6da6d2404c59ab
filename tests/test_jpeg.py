"""Baseline JPEG codec (functions/jpeg.py) + multimodal wiring."""

from __future__ import annotations

import numpy as np
import pytest

from jsonl_dataingestion_pipeline_spark.functions.jpeg import (
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    _encode_table,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 4) % 256, (xx * 4) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spot-check the spec's first diagonal walk
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]


@pytest.mark.parametrize(
    "bits,vals",
    [
        (DC_LUMA_BITS, DC_LUMA_VALS),
        (DC_CHROMA_BITS, DC_CHROMA_VALS),
        (AC_LUMA_BITS, AC_LUMA_VALS),
        (AC_CHROMA_BITS, AC_CHROMA_VALS),
    ],
)
def test_annex_k_tables_are_valid_huffman(bits, vals):
    assert sum(bits) == len(vals)
    table = _encode_table(bits, vals)
    assert len(table) == len(vals)
    # every code fits its declared length; prefix-free by canonical build
    for sym, (code, ln) in table.items():
        assert 0 <= code < (1 << ln)
    # AC tables must contain EOB and ZRL, DC tables categories 0..11
    if len(vals) > 20:
        assert 0x00 in table and 0xF0 in table
    else:
        assert set(vals) == set(range(12))


def test_flat_white_exact():
    img = np.full((16, 16, 3), 255, np.uint8)
    data = encode_jpeg(img, 95)
    assert is_jpeg(data) and not is_jpeg(b"\x89PNG")
    out = decode_jpeg(data)
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out, img)  # flat blocks are DC-only: lossless


def test_color_roundtrip_quality_ladder():
    img = _gradient(64, 64)
    prev = 100.0
    for q, floor in [(95, 50.0), (85, 45.0), (50, 38.0)]:
        out = decode_jpeg(encode_jpeg(img, q))
        p = _psnr(img, out)
        assert p > floor
        assert p <= prev + 1e-9  # lower quality never beats higher
        prev = p


def test_grayscale_roundtrip():
    yy, xx = np.mgrid[0:40, 0:24]
    g = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, 90))
    assert out.shape == (40, 24, 1)
    assert _psnr(g[:, :, None], out) > 50.0


def test_chroma_subsampling_420():
    img = _gradient(48, 40)
    out = decode_jpeg(encode_jpeg(img, 90, subsample=True))
    assert out.shape == (48, 40, 3)
    assert _psnr(img, out) > 40.0


def test_restart_markers_do_not_change_pixels():
    img = _gradient(64, 48)
    plain = decode_jpeg(encode_jpeg(img, 90))
    restarted = decode_jpeg(encode_jpeg(img, 90, restart_interval=2))
    assert np.array_equal(plain, restarted)


def test_non_multiple_of_8_dimensions():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (21, 13, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95))
    assert out.shape == (21, 13, 3)
    assert _psnr(img, out) > 30.0  # noise is the worst case for JPEG


def test_progressive_rejected():
    img = _gradient(16, 16)
    data = bytearray(encode_jpeg(img, 85))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_corrupt_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xffnope")
    with pytest.raises(ValueError):
        decode_jpeg(b"hello")


# --- multimodal operator wiring -------------------------------------------


def test_extract_features_real_jpeg(spark):
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import (
        decode_available,
        extract_features,
    )

    white = encode_jpeg(np.full((8, 8, 3), 255, np.uint8), 95)
    black = encode_jpeg(np.zeros((8, 8, 3), np.uint8), 95)
    assert decode_available(white)
    df = spark.createDataFrame(
        [
            (1, (bytearray(white), "image/jpeg", 8, 8, None)),
            (2, (bytearray(black), "image/jpeg", 8, 8, None)),
        ],
        "id long, media struct<data:binary,mime:string,width:int,height:int,duration_ms:int>",
    )
    feats = {r["id"]: r["features"] for r in extract_features(df).collect()}
    assert all(f == pytest.approx(1.0) for f in feats[1])   # white -> +1 cells
    assert all(f == pytest.approx(-1.0) for f in feats[2])  # black -> -1 cells


def test_resize_images_real_jpeg(spark):
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import resize_images

    img = _gradient(32, 32)
    df = spark.createDataFrame(
        [(1, (bytearray(encode_jpeg(img, 95)), "image/jpeg", 32, 32, None))],
        "id long, media struct<data:binary,mime:string,width:int,height:int,duration_ms:int>",
    )
    m = resize_images(df, width=8, height=8).first()["media"]
    assert (m["width"], m["height"]) == (8, 8)
    out = decode_jpeg(bytes(m["data"]))  # payload is a real standalone JPEG
    assert out.shape == (8, 8, 3)


# --- property test --------------------------------------------------------
from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    gray=st.booleans(),
    q=st.integers(60, 100),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_property(h, w, gray, q, seed):
    rng = np.random.RandomState(seed)
    # smooth-ish content: random low-res upsampled, JPEG's favorable case
    base = rng.randint(0, 256, ((h + 3) // 4, (w + 3) // 4, 1 if gray else 3))
    img = np.clip(
        np.kron(base, np.ones((4, 4, 1)))[:h, :w], 0, 255
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, q))
    assert out.shape == (h, w, 1 if gray else 3)
    assert _psnr(img, out) > 22.0


def test_decode_tolerates_fill_bytes(spark=None):
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker."""
    import numpy as np

    from jsonl_dataingestion_pipeline_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.full((16, 16, 3), 99, np.uint8)
    data = encode_jpeg(img)
    # inject fill bytes before the DQT marker (FF DB)
    i = data.index(b"\xff\xdb")
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(data))
