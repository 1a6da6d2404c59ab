"""Pure-stdlib GIF codec (87a/89a): LZW, palettes, animation.

Decode handles the full composition model that makes animated GIF an
*inter-frame* format: frames are partial rectangles composited onto the
logical-screen canvas, honoring per-frame transparency and disposal
methods (1 = leave, 2 = restore background, 3 = restore previous), plus
interlaced images and local color tables. Encode writes a real
variable-code-size LZW stream (not the uncompressed-GIF trick), one
global palette, full-frame images.

Like the PNG/JPEG/AVI kernels, this exists so the multimodal operators
run a REAL decode for one more wire format; the reference repo has no
media surface at all (extension operator).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")
_MAX_CODE = 4096


def is_gif(data: bytes | None) -> bool:
    return bool(data) and len(data) >= 6 and bytes(data[:6]) in GIF_SIGS


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------
def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, tuple[int, ...]] = {i: (i,) for i in range(clear)}
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < code_size and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)
            else:
                raise ValueError("corrupt LZW stream")
            if next_code < _MAX_CODE:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out.extend(entry)
        prev = entry
    return out[:n_pixels]


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            # encoder grows AFTER assigning 2^code_size (decoder lags one)
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = (int(k),)
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------
def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(data: bytes) -> tuple[list[np.ndarray], list[int]]:
    """Decode all frames -> (list of (H, W, 3) uint8 canvases, delays ms).

    Each returned frame is the fully composited logical screen after
    that image, exactly what a viewer shows — disposal and transparency
    applied across frames.
    """
    if not is_gif(data):
        raise ValueError("not a GIF")
    data = bytes(data)

    def need(p: int, n: int) -> None:
        if p + n > len(data):
            raise ValueError("truncated GIF")

    need(6, 7)
    w, h, flags, bg_idx, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        need(pos, 3 * n)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    if gct is not None:
        bg_rgb = gct[bg_idx % len(gct)]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.tile(bg_rgb, (h, w, 1)).astype(np.uint8)

    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay_cs = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            need(pos, 1)
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                need(pos, 1)
                size = data[pos]
                if size >= 4:
                    need(pos + 1, 4)
                    gflags, delay_cs, tidx = struct.unpack(
                        "<BHB", data[pos + 1 : pos + 5]
                    )
                    disposal = (gflags >> 2) & 0x07
                    transparent = tidx if (gflags & 0x01) else None
                pos += 1 + size
                need(pos, 1)
                while data[pos] != 0:  # tolerate nonstandard extra blocks
                    pos += 1 + data[pos]
                    need(pos, 1)
                pos += 1  # terminator
            else:  # skip any other extension's sub-blocks
                while True:
                    need(pos, 1)
                    size = data[pos]
                    pos += 1 + size
                    if size == 0:
                        break
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")

        need(pos, 9)
        left, top, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        palette = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            need(pos, 3 * n)
            palette = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image without any color table")
        need(pos, 1)
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            need(pos, 1)
            size = data[pos]
            pos += 1
            if size == 0:
                break
            need(pos, size)
            lzw += data[pos : pos + size]
            pos += size

        idx = np.array(
            _lzw_decode(min_code, bytes(lzw), iw * ih), np.int32
        ).reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx)

        before = canvas.copy()
        rgb = palette[np.clip(idx, 0, len(palette) - 1)]
        region = canvas[top : top + ih, left : left + iw]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            canvas[top : top + ih, left : left + iw] = np.where(
                mask, rgb, region
            )
        else:
            canvas[top : top + ih, left : left + iw] = rgb

        frames.append(canvas.copy())
        delays.append(delay_cs * 10)

        if disposal == 2:  # restore background in the frame's rect
            canvas[top : top + ih, left : left + iw] = bg_rgb
        elif disposal == 3:  # restore what was there before this frame
            canvas = before
        transparent = None
        disposal = 0
        delay_cs = 0

    return frames, delays


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------
def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames: list[np.ndarray], delays_ms: list[int] | None = None) -> bytes:
    """Encode (H, W, 3) uint8 frames as an animated GIF89a with one
    global palette built from the frames' distinct colors (<= 256)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors; GIF allows 256")
    # palette size must be a power of two >= 2
    bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    n_pal = 1 << bits
    palette = np.zeros((n_pal, 3), np.uint8)
    palette[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += palette.tobytes()
    if delays_ms is None:
        delays_ms = [100] * len(frames)
    if len(delays_ms) != len(frames):
        raise ValueError(
            f"{len(delays_ms)} delays for {len(frames)} frames"
        )
    min_code = max(2, bits)
    for frame, delay in zip(frames, delays_ms):
        out += b"\x21\xf9"  # graphic control: disposal=1 (leave), no transp
        out += struct.pack("<BBHBB", 4, 0x04, max(0, delay // 10), 0, 0)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        idx = [lut[tuple(px)] for px in frame.reshape(-1, 3)]
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(min_code, idx))
    out += b"\x3b"
    return bytes(out)
