"""Pure-stdlib MJPEG-in-AVI video codec (RIFF container + baseline JPEG).

Motion-JPEG stores each video frame as an independent baseline JPEG
inside a RIFF/AVI container — the one mainstream video format a
pure-stdlib engine can decode for real, since it needs no inter-frame
prediction, just the container walk plus the JPEG codec in
``functions/jpeg.py``. Everything here is public-spec knowledge
(Microsoft RIFF/AVI container layout, OpenDML): no code from any AVI
library.

Scope:
- decode: RIFF walk, ``movi`` LIST, ``??dc``/``??db`` frame chunks,
  word-alignment padding, fps/size from ``avih``/``strh``. Frames whose
  JPEG omits DHT segments (allowed by the MJPEG convention) decode with
  the Annex-K default tables (handled inside ``decode_jpeg``).
- encode: minimal single-video-stream AVI with an ``idx1`` index, each
  frame a self-contained baseline JPEG — what this module's own
  ``sample_frames`` consumers read back.

Other video codecs (H.264 & friends) genuinely need native libraries and
keep the documented deterministic-fake path in ``operators/multimodal.py``.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


def is_avi(data: bytes | None) -> bool:
    return (
        bool(data)
        and len(data) >= 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"AVI "
    )


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size); handles word padding."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(data: bytes) -> tuple[list[bytes], float, int, int]:
    """Parse an MJPEG AVI -> (jpeg_frames, fps, width, height).

    Frames are returned as raw JPEG byte strings (each independently
    decodable with ``decode_jpeg``).
    """
    if not is_avi(data):
        raise ValueError("not an AVI")
    frames: list[bytes] = []
    fps = 0.0
    width = height = 0
    usec_per_frame = 0

    def walk_list(start: int, end: int) -> None:
        nonlocal fps, width, height, usec_per_frame
        for fourcc, off, size in _walk_chunks(data, start, end):
            if fourcc == b"LIST":
                walk_list(off + 4, off + size)  # skip the list-type fourcc
            elif fourcc == b"avih" and size >= 40:
                usec_per_frame = struct.unpack("<I", data[off : off + 4])[0]
                width, height = struct.unpack("<II", data[off + 32 : off + 40])
            elif fourcc == b"strh" and size >= 32:
                if data[off : off + 4] == b"vids":
                    scale, rate = struct.unpack("<II", data[off + 20 : off + 28])
                    if scale:
                        fps = rate / scale
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(bytes(data[off : off + size]))

    riff_size = struct.unpack("<I", data[4:8])[0]
    walk_list(12, min(8 + riff_size, len(data)))
    if not fps and usec_per_frame:
        fps = 1_000_000.0 / usec_per_frame
    return frames, fps, width, height


def decode_avi_frames(data: bytes) -> list[np.ndarray]:
    """Decode every MJPEG frame to a (h, w, c) uint8 array."""
    frames, _fps, _w, _h = decode_avi(data)
    return [decode_jpeg(f) for f in frames]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: float = 10.0, quality: int = 85
) -> bytes:
    """Encode uint8 frame arrays as a minimal MJPEG AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality) for f in frames]

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1_000_000 / fps),  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(jpegs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            int(round(fps)),  # dwRate
            0,  # dwStart
            len(jpegs),  # dwLength
            0,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality
            0,  # dwSampleSize
            0,  # rcFrame (packed as one dword pair-of-shorts x2 -> 0)
        )
        + struct.pack("<HH", w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        struct.unpack("<I", b"MJPG")[0],  # biCompression
        w * h * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)

    # idx1: one entry per frame chunk; offsets are relative to the start
    # of the 'movi' list type fourcc (the common convention)
    idx_entries = []
    off = 4  # skip the b"movi" type fourcc
    for j in jpegs:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
