"""GIF codec tests: LZW, roundtrip, and the inter-frame composition
model (transparency + disposal) decoded from hand-built streams."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from jsonl_dataingestion_pipeline_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    _sub_blocks,
    decode_gif,
    encode_gif,
    is_gif,
)


def test_lzw_roundtrip_random_streams():
    rng = random.Random(11)
    for _ in range(40):
        m = rng.choice([2, 3, 4, 8])
        seq = [rng.randrange(1 << m) for _ in range(rng.randint(0, 5000))]
        assert _lzw_decode(m, _lzw_encode(m, seq), len(seq)) == seq


def test_lzw_dictionary_overflow_resets():
    """> 4096 distinct phrases forces the encoder's clear-code reset."""
    rng = random.Random(5)
    seq = [rng.randrange(4) for _ in range(60000)]
    assert _lzw_decode(2, _lzw_encode(2, seq), len(seq)) == seq


def test_gif_roundtrip_animation():
    f0 = np.zeros((8, 10, 3), np.uint8)
    f0[:, :5] = [255, 0, 0]
    f1 = f0.copy()
    f1[2:5, 3:8] = [0, 255, 0]
    data = encode_gif([f0, f1], [40, 60])
    assert is_gif(data)
    frames, delays = decode_gif(data)
    assert delays == [40, 60]
    assert np.array_equal(frames[0], f0)
    assert np.array_equal(frames[1], f1)


def test_gif_rejects_too_many_colors():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    with pytest.raises(ValueError):
        encode_gif([img])


def _hand_gif(frames_spec, screen=(4, 4), gct=((0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255))):
    """Minimal hand-assembled GIF89a: frames_spec is a list of dicts with
    rect=(left, top, w, h), idx (2D list), disposal, transparent."""
    w, h = screen
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0)  # 4-entry GCT
    for c in gct:
        out += bytes(c)
    for spec in frames_spec:
        gflags = (spec.get("disposal", 0) & 7) << 2
        tidx = spec.get("transparent")
        if tidx is not None:
            gflags |= 1
        out += b"\x21\xf9" + struct.pack("<BBHBB", 4, gflags, 0, tidx or 0, 0)
        left, top, iw, ih = spec["rect"]
        out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, 0)
        flat = [v for row in spec["idx"] for v in row]
        out.append(2)  # min code size
        out += _sub_blocks(_lzw_encode(2, flat))
    out += b"\x3b"
    return bytes(out)


def test_gif_transparency_composites_over_previous():
    full_red = {"rect": (0, 0, 4, 4), "idx": [[1] * 4] * 4}
    # 2x2 patch at (1,1): green except one transparent pixel
    patch = {
        "rect": (1, 1, 2, 2),
        "idx": [[2, 0], [2, 2]],
        "transparent": 0,
    }
    frames, _ = decode_gif(_hand_gif([full_red, patch]))
    assert np.array_equal(frames[0], np.tile([255, 0, 0], (4, 4, 1)))
    f1 = frames[1]
    assert tuple(f1[1, 1]) == (0, 255, 0)
    assert tuple(f1[1, 2]) == (255, 0, 0)  # transparent -> red shows through
    assert tuple(f1[2, 1]) == (0, 255, 0) and tuple(f1[2, 2]) == (0, 255, 0)
    assert tuple(f1[0, 0]) == (255, 0, 0)  # outside the rect untouched


def test_gif_disposal_background_and_previous():
    full_red = {"rect": (0, 0, 4, 4), "idx": [[1] * 4] * 4, "disposal": 1}
    # frame 2: blue square, disposal=2 -> its rect restores to background
    blue = {"rect": (0, 0, 2, 2), "idx": [[3, 3], [3, 3]], "disposal": 2}
    green_dot = {"rect": (3, 3, 1, 1), "idx": [[2]]}
    frames, _ = decode_gif(_hand_gif([full_red, blue, green_dot]))
    # during frame 2 the blue square is visible over red
    assert tuple(frames[1][0, 0]) == (0, 0, 255)
    # frame 3: blue rect was disposed to background (black), red elsewhere
    f2 = frames[2]
    assert tuple(f2[0, 0]) == (0, 0, 0)
    assert tuple(f2[3, 3]) == (0, 255, 0)
    assert tuple(f2[0, 3]) == (255, 0, 0)

    # disposal=3 restores the pre-frame canvas instead
    blue3 = dict(blue, disposal=3)
    frames3, _ = decode_gif(_hand_gif([full_red, blue3, green_dot]))
    assert tuple(frames3[2][0, 0]) == (255, 0, 0)  # red restored


def test_gif_features_and_frame_sampling(spark):
    from jsonl_dataingestion_pipeline_spark.functions.media import decode_png
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import (
        extract_features,
        sample_frames,
    )

    f0 = np.zeros((6, 6, 3), np.uint8)
    f1 = np.full((6, 6, 3), 200, np.uint8)
    gif = encode_gif([f0, f1], [1000, 1000])
    df = spark.createDataFrame(
        [(1, (bytearray(gif), "image/gif", 6, 6, 2000))],
        "media_id long, media struct<data:binary,mime:string,width:int,height:int,duration_ms:int>",
    )
    feats = extract_features(df).head().features
    # middle frame of 2 is index 1 (all-200); features are [-1, 1] gray
    assert abs(feats[0] - (200 / 255 * 2.0 - 1.0)) < 1e-6
    out = sample_frames(df, every_ms=1000).head().frames
    assert len(out) == 2
    assert np.array_equal(decode_png(bytes(out[0])), f0)
    assert np.array_equal(decode_png(bytes(out[1])), f1)


def test_encode_gif_rejects_mismatched_delays():
    f = np.zeros((2, 2, 3), np.uint8)
    with pytest.raises(ValueError):
        encode_gif([f, f, f], [100, 100])


def test_gif_tolerates_oversized_graphic_control():
    """Nonstandard GCE size=5 (seen from buggy encoders): extra byte is
    skipped, fields still honored."""
    full_red = {"rect": (0, 0, 4, 4), "idx": [[1] * 4] * 4}
    data = bytearray(_hand_gif([full_red]))
    i = bytes(data).index(b"\x21\xf9")
    # rewrite GCE: size 5 with one trailing junk byte before terminator
    # original: 21 f9 04 <gflags> <delay lo> <delay hi> <tidx> 00
    gce = data[i : i + 8]
    new = bytes([0x21, 0xF9, 0x05]) + bytes(gce[3:7]) + b"\x7f\x00"
    data[i : i + 8] = new
    frames, _ = decode_gif(bytes(data))
    assert np.array_equal(frames[0], np.tile([255, 0, 0], (4, 4, 1)))


def test_gif_real_resize(spark):
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import (
        resize_images,
    )

    f0 = np.zeros((8, 8, 3), np.uint8)
    f0[:4] = [255, 0, 0]
    f1 = np.zeros((8, 8, 3), np.uint8)
    f1[:, :4] = [0, 0, 255]
    gif = encode_gif([f0, f1], [50, 50])
    df = spark.createDataFrame(
        [(1, (bytearray(gif), "image/gif", 8, 8, 100))],
        "media_id long, media struct<data:binary,mime:string,width:int,height:int,duration_ms:int>",
    )
    out = resize_images(df, "media", width=4, height=4).head().media
    assert out.width == 4 and out.height == 4
    frames, delays = decode_gif(bytes(out.data))
    assert delays == [50, 50]
    assert np.array_equal(frames[0][:2], np.tile([255, 0, 0], (2, 4, 1)))
    assert np.array_equal(frames[1][:, :2], np.tile([0, 0, 255], (4, 2, 1)))


def test_gif_truncation_raises_valueerror_everywhere():
    """Truncating a valid GIF at ANY byte yields ValueError (or a valid
    shorter decode) — never IndexError/struct.error."""
    f0 = np.zeros((4, 4, 3), np.uint8)
    f1 = np.full((4, 4, 3), 60, np.uint8)
    data = encode_gif([f0, f1], [30, 30])
    for cut in range(6, len(data)):
        try:
            decode_gif(data[:cut])
        except ValueError:
            pass
