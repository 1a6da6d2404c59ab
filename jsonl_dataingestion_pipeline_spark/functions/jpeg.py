"""Pure-stdlib+numpy baseline JPEG codec (ITU-T T.81).

Decoder: baseline sequential DCT (SOF0, and SOF1 which shares the
structure) — Huffman entropy decode, dequantize, 8x8 IDCT, chroma
upsampling (4:4:4 / 4:2:2 / 4:2:0), YCbCr->RGB (BT.601), restart
markers, byte stuffing. Progressive (SOF2) and arithmetic coding raise
``NotImplementedError`` — they are different entropy pipelines, not a
tolerance knob.

Encoder: baseline JPEG with the Annex-K example quantization tables
(IJG quality scaling) and the Annex-K "typical" Huffman tables — the
same defaults libjpeg emits — supporting grayscale, 4:4:4 and 4:2:0
color, and optional restart intervals. The encoder exists so the
decoder can be roundtrip-tested without any media library in the
container, and so ``resize_images`` can re-emit JPEG payloads.

Everything here is public-spec knowledge (T.81 Annex F/K); no code is
taken from any JPEG library. The reference repo has no media surface
(this backs the extension operators in ``operators/multimodal.py``).

Performance note: entropy decode is a per-bit Python loop — fine for
the Arrow-batched ``mapInPandas`` feature-extraction path where decode
cost is per-payload and embarrassingly parallel across executors, but
this is the slow path by design; swap in a native codec for production
imagery via the one-function facade in ``functions/media.py``.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> natural (row-major) index
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 1-D DCT-II basis; T.81's C(u)/2 scaling for N=8 is exactly
# this matrix, so FDCT = T @ x @ T.T and IDCT = T.T @ F @ T.
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
        )

# ---------------------------------------------------------------------------
# Annex K example tables (public spec)
# ---------------------------------------------------------------------------
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def is_jpeg(data: bytes | None) -> bool:
    return bool(data) and len(data) >= 3 and data[:2] == b"\xff\xd8" and data[2] == 0xFF


# ---------------------------------------------------------------------------
# Huffman code construction (canonical, T.81 Annex C)
# ---------------------------------------------------------------------------
def _encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, c): s for s, (c, ln) in _encode_table(bits, vals).items()}


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _BitReader:
    __slots__ = ("bits", "pos", "n")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0
        self.n = len(self.bits)

    def read_bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("JPEG entropy data truncated")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, s: int) -> int:
        if s == 0:
            return 0
        if self.pos + s > self.n:
            raise ValueError("JPEG entropy data truncated")
        v = 0
        for b in self.bits[self.pos : self.pos + s]:
            v = (v << 1) | int(b)
        self.pos += s
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to a (h, w, channels) uint8 array.

    channels is 3 (RGB) for YCbCr files, 1 for grayscale.
    """
    if not is_jpeg(data):
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}  # tq -> natural-order 64 table
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    comps: list[dict] = []
    W = H = None
    restart_interval = 0
    scan_comps: list[dict] = []
    scan_data_start = None

    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # optional fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment")
        ln = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    raw = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    raw = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = raw
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended sequential
            _prec, H, W, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            if nc == 1:  # sampling factors are irrelevant for 1-comp scans
                comps[0]["h"] = comps[0]["v"] = 1
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: progressive/hierarchical/arithmetic "
                "coding not supported (baseline only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                scan_comps.append({**comp, "td": tt >> 4, "ta": tt & 15})
            scan_data_start = pos + ln
            break
        pos += ln

    if W is None or scan_data_start is None:
        raise ValueError("JPEG missing SOF/SOS")
    if len(scan_comps) != len(comps):
        raise NotImplementedError("non-interleaved multi-scan JPEG not supported")

    # MJPEG convention: DHT may be omitted, implying the Annex-K tables
    # (table id 0 = luma, 1 = chroma)
    for key, bits, vals in (
        ((0, 0), DC_LUMA_BITS, DC_LUMA_VALS),
        ((1, 0), AC_LUMA_BITS, AC_LUMA_VALS),
        ((0, 1), DC_CHROMA_BITS, DC_CHROMA_VALS),
        ((1, 1), AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        huff.setdefault(key, _decode_table(bits, vals))

    # split entropy-coded data at restart markers, undo byte stuffing
    segments: list[bytes] = []
    cur = bytearray()
    i = scan_data_start
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in scan_comps
    ]
    # collect quantized coefficient blocks, batch-IDCT at the end
    blocks: list[list[np.ndarray]] = [[] for _ in scan_comps]
    positions: list[list[tuple[int, int]]] = [[] for _ in scan_comps]

    reader = _BitReader(segments[0])
    seg_idx = 0
    dc_pred = [0] * len(scan_comps)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segments[seg_idx])
            dc_pred = [0] * len(scan_comps)
        mcy, mcx = divmod(m, mcus_x)
        for ci, c in enumerate(scan_comps):
            q = qt[c["tq"]]
            dct = huff[(0, c["td"])]
            act = huff[(1, c["ta"])]
            for j in range(c["v"] * c["h"]):
                s = reader.huff(dct)
                dc_pred[ci] += _extend(reader.receive(s), s)
                zz = np.zeros(64, dtype=np.int64)
                zz[0] = dc_pred[ci]
                k = 1
                while k < 64:
                    rs = reader.huff(act)
                    run, size = rs >> 4, rs & 15
                    if size == 0:
                        if run == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("JPEG AC index out of range")
                    zz[k] = _extend(reader.receive(size), size)
                    k += 1
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                blocks[ci].append((nat * q).reshape(8, 8))
                by, bx = mcy * c["v"] + j // c["h"], mcx * c["h"] + j % c["h"]
                positions[ci].append((by * 8, bx * 8))

    out_planes = []
    for ci, c in enumerate(scan_comps):
        coef = np.stack(blocks[ci]).astype(np.float64)
        spatial = np.einsum("ij,njk,kl->nil", _DCT.T, coef, _DCT) + 128.0
        for (y0, x0), blk in zip(positions[ci], spatial):
            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
        # upsample to full resolution (pixel replication), crop to (H, W)
        ry, rx = vmax // c["v"], hmax // c["h"]
        p = planes[ci]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        out_planes.append(p[:H, :W])

    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(out_planes) != 3:
        raise NotImplementedError(f"{len(out_planes)}-component JPEG not supported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.nbits = 0


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables (natural order)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def sc(t):
        return np.clip((t * scale + 50) // 100, 1, 255)
    return sc(QT_LUMA), sc(QT_CHROMA)


def _fdct_quant(plane: np.ndarray, q_nat: np.ndarray) -> np.ndarray:
    """Blocked forward DCT + quantization -> (n_by, n_bx, 64) zigzag ints."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    x = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).astype(np.float64) - 128.0
    f = np.einsum("ij,nmjk,kl->nmil", _DCT, x, _DCT.T)
    qz = np.round(f / q_nat.reshape(8, 8)).astype(np.int64)
    # clip to baseline category limits (DC<=11 bits handled by diff; AC<=10)
    qz = np.clip(qz, -1023, 1023)
    return qz.reshape(by, bx, 64)[..., ZIGZAG]


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    dc_pred: int,
    dc_map: dict[int, tuple[int, int]],
    ac_map: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    diff = dc - dc_pred
    s = int(abs(diff)).bit_length()
    code, ln = dc_map[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_map[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = int(abs(v)).bit_length()
        code, ln = ac_map[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_map[0x00]  # EOB
        w.write(code, ln)
    return dc


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 array as baseline JPEG.

    arr: (h, w) or (h, w, 1) grayscale, or (h, w, 3) RGB.
    subsample=True emits 4:2:0 chroma (2x2-mean downsampled); default 4:4:4.
    restart_interval emits DRI + RSTn markers every that many MCUs.
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    ql, qc = _quality_tables(quality)
    a = arr.astype(np.float64)
    if nc == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ys = _pad_to(y, 16, 16)
            cbp = _pad_to(cb, 16, 16)
            crp = _pad_to(cr, 16, 16)
            cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [ys, cbs, crs]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [_pad_to(p, 8, 8) for p in (y, cb, cr)]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
        tsel = [0, 1, 1]  # huffman table ids
    else:
        planes = [_pad_to(a[:, :, 0], 8, 8)]
        samp = [(1, 1)]
        qsel = [0]
        tsel = [0]

    zz_planes = [
        _fdct_quant(p, ql if qs == 0 else qc) for p, qs in zip(planes, qsel)
    ]

    dc_maps = [
        _encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_maps = [
        _encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
        _encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (zigzag order on the wire)
    def dqt(tq, nat):
        payload = bytes([tq]) + bytes(int(nat[ZIGZAG[i]]) for i in range(64))
        return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload
    out += dqt(0, ql)
    if nc == 3:
        out += dqt(1, qc)
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT
    def dht(tc, th, bits, vals):
        payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if nc == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    writer = _BitWriter()
    dc_pred = [0] * nc
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            out += writer.buf
            writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            dc_pred = [0] * nc
        mcy, mcx = divmod(m, mcus_x)
        for ci in range(nc):
            sh, sv = samp[ci]
            for j in range(sv * sh):
                by, bx = mcy * sv + j // sh, mcx * sh + j % sh
                dc_pred[ci] = _encode_block(
                    writer,
                    zz_planes[ci][by, bx],
                    dc_pred[ci],
                    dc_maps[tsel[ci]],
                    ac_maps[tsel[ci]],
                )
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)
