"""Pure-stdlib media codecs: PNG, PCM WAV, baseline JPEG, GIF, MJPEG-AVI.

The container has no PIL/torchaudio, but PNG and PCM-WAV need nothing
beyond stdlib ``zlib``/``wave`` plus numpy; baseline JPEG is a
self-contained Huffman+IDCT pipeline (``functions/jpeg.py``); GIF is a
self-contained LZW + frame-composition pipeline (``functions/gif.py``,
real inter-frame disposal/transparency); and MJPEG-AVI rides the JPEG
decoder (``functions/avi.py``). All five formats get REAL decode/encode
kernels. Only native-only video codecs (H.264 & friends) stay honestly
stubbed — those can't be reimplemented responsibly here.

Scope: PNG bit depth 8, color types 0/2/4/6 (gray, RGB, gray+alpha,
RGBA), non-interlaced — the overwhelmingly common case and everything our
own encoder emits. All five scanline filters are supported on decode.

Reference parity note: the reference repo never decodes media at all (it
has no multimodal surface); these kernels back the *extension* operators
in ``operators/multimodal.py``.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

from .avi import (  # noqa: F401  (facade re-export)
    decode_avi,
    decode_avi_frames,
    encode_avi_mjpeg,
    is_avi,
)
from .gif import decode_gif, encode_gif, is_gif  # noqa: F401  (facade re-export)
from .jpeg import decode_jpeg, encode_jpeg, is_jpeg  # noqa: F401  (facade re-export)

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes | None) -> bool:
    return bool(data) and data[:8] == PNG_SIG


def is_wav(data: bytes | None) -> bool:
    return bool(data) and len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------
def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to a (height, width, channels) uint8 array."""
    if not is_png(data):
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    w = h = bit_depth = color_type = interlace = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8 supported)")
    if interlace:
        raise NotImplementedError("interlaced PNG not supported")
    channels = _CHANNELS.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type} (palette unsupported)")

    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    c = channels
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub: prefix sum along each channel lane
            cur = (
                np.cumsum(line.reshape(-1, c), axis=0, dtype=np.uint64) % 256
            ).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype == 3:  # Average: sequential in the pixel direction
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - c]) if i >= c else 0
                cur[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth: sequential in the pixel direction
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, channels)


def _chunk(typ: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (h, w) or (h, w, channels) uint8 array as PNG (filter 0)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = b"".join(
        b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (the stdlib-only choice)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def image_features(arr: np.ndarray, grid: int = 4) -> list[float]:
    """``grid × grid`` mean-pooled grayscale in [-1, 1] (grid=4 -> 16 dims)."""
    gray = arr.astype(np.float64).mean(axis=2) if arr.ndim == 3 else arr.astype(np.float64)
    h, w = gray.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    feats = []
    for i in range(grid):
        for j in range(grid):
            cell = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            feats.append(float(cell.mean()) / 255.0 * 2.0 - 1.0)
    return feats


# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------
def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV to (samples[n, channels] float64 in [-1, 1], rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        n_ch = f.getnchannels()
        width = f.getsampwidth()
        rate = f.getframerate()
        frames = f.readframes(f.getnframes())
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {width}")
    return x.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode float samples in [-1, 1] as 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_features(samples: np.ndarray, dim: int = 16) -> list[float]:
    """Per-segment RMS energy over ``dim`` equal time slices, in [-1, 1]."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return [0.0] * dim
    bounds = np.linspace(0, n, dim + 1).astype(int)
    feats = []
    for i in range(dim):
        seg = mono[bounds[i] : max(bounds[i + 1], bounds[i] + 1)]
        rms = float(np.sqrt(np.mean(seg * seg)))
        feats.append(min(rms, 1.0) * 2.0 - 1.0)
    return feats
