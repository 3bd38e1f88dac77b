"""Baseline JPEG (ITU T.81 / JFIF) codec in pure NumPy + stdlib.

Closes the last stubbed image format (``functions/multimodal.py`` round-4
status: "JPEG ... remain documented stubs"): no PIL/libjpeg in this
container, so the codec is implemented from the public spec — baseline
sequential DCT, 8-bit, Huffman entropy coding, the Annex K quantization /
Huffman tables, restart-marker support.

Coverage (honest split):

- ``decode_jpeg``: baseline SOF0, 8-bit, grayscale or YCbCr, ANY integer
  sampling factors whose ratio to the max divides evenly (covers 4:4:4,
  4:2:2, 4:2:0 — the web's JPEGs), multiple DQT/DHT segments, restart
  intervals (DRI/RSTn). Progressive (SOF2), arithmetic coding, 12-bit,
  and hierarchical modes raise ``ValueError`` (callers fall back to the
  stub path, same contract as ``decode_bmp``/``decode_png``).
- ``encode_jpeg``: baseline 4:4:4 (or 1-component grayscale), quality
  1-100 via the conventional 5000/q | 200-2q table scaling, standard
  Annex K Huffman tables, no subsampling — the synthesis side for tests
  and the deterministic ``synth_jpeg_media`` fixtures.

Exactness anchor (what the DuckDB oracle can verify): a FLAT gray block
at quality 100 (all quantizer steps 1) round-trips EXACTLY — the DCT of a
constant block is a lone DC coefficient, quantization is a no-op, and the
IDCT reconstructs the constant within 1e-13 before the final round. The
``jpeg_image_stats`` driver query synthesizes flat gray JPEGs whose
decoded means are therefore closed-form in SQL, the same oracle pattern
as PNG's ``png_image_stats``.

Execution shape: the DCT/IDCT run as one einsum over ALL blocks of a
component (vectorized); entropy coding is a per-symbol Python loop —
the honest cost of Huffman in pure Python, measured and reported in
BENCH (the PNG/BMP paths stay the throughput kings).
"""

from __future__ import annotations

import struct

import numpy as np

# --- public ITU T.81 Annex K constants -------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: C[k, x] = a(k) cos((2x+1)kπ/16)
_DCT = np.array([
    [(np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
     * np.cos((2 * x + 1) * k * np.pi / 16) for x in range(8)]
    for k in range(8)
])


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Conventional quality → table scaling: 5000/q below 50, 200-2q
    above; q=100 gives all-ones tables (lossless for flat blocks)."""
    if not 1 <= quality <= 100:
        raise ValueError("JPEG quality must be in 1..100")
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


class _HuffTable:
    """Canonical Huffman table from (BITS, HUFFVAL) — both directions."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.bits = bits
        self.vals = vals
        # decoder side: per code length l (1-based), the smallest and
        # largest code and the index of the first symbol of that length
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        # encoder side: symbol -> (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        for l in range(1, 17):
            self.valptr[l] = k
            self.mincode[l] = code
            for _ in range(bits[l - 1]):
                self.enc[vals[k]] = (code, l)
                code += 1
                k += 1
            self.maxcode[l] = code - 1
            code <<= 1


DC_LUMA = _HuffTable(_DC_LUMA_BITS, _DC_LUMA_VALS)
DC_CHROMA = _HuffTable(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
AC_LUMA = _HuffTable(_AC_LUMA_BITS, _AC_LUMA_VALS)
AC_CHROMA = _HuffTable(_AC_CHROMA_BITS, _AC_CHROMA_VALS)


# --- bit I/O ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad


class _BitReader:
    """Bit reader over one entropy-coded segment (stuffing pre-removed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map s received bits to the signed coefficient."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_symbol(br: _BitReader, tbl: _HuffTable) -> int:
    code = 0
    for l in range(1, 17):
        code = (code << 1) | br.bit()
        if tbl.maxcode[l] >= code >= tbl.mincode[l] and tbl.bits[l - 1]:
            return tbl.vals[tbl.valptr[l] + code - tbl.mincode[l]]
    raise ValueError("bad JPEG Huffman code")


# --- encoder ----------------------------------------------------------------


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc: _HuffTable, ac: _HuffTable) -> int:
    """Entropy-encode one zigzagged quantized block; returns the new DC
    predictor."""
    dcv = int(zz[0])
    diff = dcv - pred
    s = int(abs(diff)).bit_length()
    code, ln = dc.enc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac.enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = int(abs(v)).bit_length()
        code, ln = ac.enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac.enc[0x00]  # EOB
        bw.write(code, ln)
    return dcv


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane, H/W multiples of 8 -> (nb, 8, 8) blocks in
    raster MCU order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 array -> baseline JFIF bytes. ``(H, W)``/``(H, W, 1)``
    encodes 1-component grayscale, ``(H, W, 3)`` RGB as YCbCr — 4:4:4
    by default, 4:2:0 (2x2 box-averaged chroma) with ``subsample=True``.
    Standard Annex K Huffman tables, quality-scaled Annex K quantizers.
    ``restart_interval=k`` emits DRI + RSTn every k MCUs (exercises the
    decoder's restart resynchronization)."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg expects a uint8 array")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    if pixels.ndim != 3 or pixels.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg expects (H, W[, 1|3]) uint8")
    h, w, ncomp = pixels.shape
    if h <= 0 or w <= 0:
        raise ValueError("bad JPEG dimensions")
    ql, qc = _quality_tables(quality)

    px = pixels.astype(np.float64)
    if ncomp == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
        ]
        sampling = [(2, 2), (1, 1), (1, 1)] if subsample \
            else [(1, 1)] * 3
    else:
        planes = [px[:, :, 0]]
        sampling = [(1, 1)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    tables = [(DC_LUMA, AC_LUMA, ql)] + [(DC_CHROMA, AC_CHROMA, qc)] * 2
    comp_zz = []  # per component: (by, bx, 64) zigzagged quantized grid
    for ci, plane in enumerate(planes):
        hi, vi = sampling[ci]
        if (hi, vi) != (hmax, vmax):
            # downsample by box average on an edge-padded-to-even plane
            fy, fx = vmax // vi, hmax // hi
            ph = (h + fy - 1) // fy * fy
            pw = (w + fx - 1) // fx * fx
            p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th_, tw_ = mcuy * vi * 8, mcux * hi * 8
        pad = np.pad(plane, ((0, th_ - plane.shape[0]),
                             (0, tw_ - plane.shape[1])), mode="edge")
        blocks = _plane_blocks(pad) - 128.0
        coef = np.einsum("ky,nyx,xl->nkl", _DCT, blocks, _DCT.T)
        q = tables[ci][2]
        zz = np.round(coef / q).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
        comp_zz.append(zz.reshape(th_ // 8, tw_ // 8, 64))

    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci in range(len(planes)):
            hi, vi = sampling[ci]
            dc, ac, _ = tables[ci]
            for by in range(vi):
                for bx in range(hi):
                    zz = comp_zz[ci][my * vi + by, mx * hi + bx]
                    preds[ci] = _encode_block(bw, zz, preds[ci], dc, ac)
    bw.flush()

    def chunk(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += chunk(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in [(0, ql)] + ([(1, qc)] if ncomp == 3 else []):
        out += chunk(0xFFDB, bytes([tid])
                     + bytes(q.reshape(64)[ZIGZAG].astype(np.uint8)))
    if restart_interval:
        out += chunk(0xFFDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = sampling[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += chunk(0xFFC0, sof)
    for tc, th, tbl in [(0, 0, DC_LUMA), (1, 0, AC_LUMA)] + (
            [(0, 1, DC_CHROMA), (1, 1, AC_CHROMA)] if ncomp == 3 else []):
        out += chunk(0xFFC4, bytes([(tc << 4) | th]) + bytes(tbl.bits)
                     + bytes(tbl.vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += chunk(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, C) uint8 (C = 1 gray, 3 RGB).

    Supports SOF0 (baseline sequential Huffman), 8-bit, 1 or 3
    components, any sampling factors with integer upsampling ratios
    (4:4:4 / 4:2:2 / 4:2:0), restart intervals. Raises ``ValueError``
    on progressive/arithmetic/12-bit streams or corruption."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    restart = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (may hold several tables)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 15
                if pq != 0:
                    raise ValueError("only 8-bit JPEG quantizers supported")
                tab = np.zeros(64)
                tab[ZIGZAG] = np.frombuffer(body[b + 1:b + 65], np.uint8)
                qt[tq] = tab.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 15
                bits = list(body[b + 1:b + 17])
                nv = sum(bits)
                vals = list(body[b + 17:b + 17 + nv])
                huff[(tc, th)] = _HuffTable(bits, vals)
                b += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, ih, iw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (ih, iw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG is supported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            nc = body[0]
            sel = []
            for ci in range(nc):
                cs, tt = body[1 + 2 * ci], body[2 + 2 * ci]
                sel.append((cs, tt >> 4, tt & 15))
            scan = (sel, pos + 2 + ln)
            break
        pos += 2 + ln
    if sof is None or scan is None:
        raise ValueError("missing JPEG SOF0/SOS")
    ih, iw, comps = sof
    if ih <= 0 or iw <= 0 or len(comps) not in (1, 3):
        raise ValueError("unsupported JPEG geometry")
    sel, dpos = scan

    # split the entropy stream into restart segments, un-stuffing 0xFF00
    segs: list[bytearray] = [bytearray()]
    p = dpos
    while p < len(payload):
        b = payload[p]
        if b != 0xFF:
            segs[-1].append(b)
            p += 1
            continue
        nxt = payload[p + 1] if p + 1 < len(payload) else 0xD9
        if nxt == 0x00:
            segs[-1].append(0xFF)
            p += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytearray())
            p += 2
        else:
            break  # EOI or next marker

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (iw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (ih + 8 * vmax - 1) // (8 * vmax)
    order = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    planes_zz = []
    tabs = []
    for cs, td, ta in sel:
        if cs not in order:
            raise ValueError("JPEG scan references unknown component")
        hi, vi, tq = order[cs]
        if (tq not in qt or (0, td) not in huff or (1, ta) not in huff
                or hmax % hi or vmax % vi):
            raise ValueError("JPEG scan tables/sampling unsupported")
        planes_zz.append(np.zeros((mcuy * vi, mcux * hi, 64)))
        tabs.append((huff[(0, td)], huff[(1, ta)], qt[tq], hi, vi))

    si = 0
    br = _BitReader(bytes(segs[0]))
    preds = [0] * len(sel)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            si += 1
            if si >= len(segs):
                raise ValueError("missing JPEG restart segment")
            br = _BitReader(bytes(segs[si]))
            preds = [0] * len(sel)
        my, mx = divmod(m, mcux)
        for ci, (dc, ac, _q, hi, vi) in enumerate(tabs):
            for by in range(vi):
                for bx in range(hi):
                    s = _decode_symbol(br, dc)
                    preds[ci] += _extend(br.receive(s), s)
                    zz = planes_zz[ci][my * vi + by, mx * hi + bx]
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_symbol(br, ac)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break
                        k += r
                        if k > 63:
                            raise ValueError("bad JPEG AC run")
                        zz[k] = _extend(br.receive(s), s)
                        k += 1

    out_planes = []
    for ci, (_dc, _ac, q, hi, vi) in enumerate(tabs):
        by, bx = planes_zz[ci].shape[:2]
        coef = np.zeros((by * bx, 64))
        coef[:, ZIGZAG] = planes_zz[ci].reshape(-1, 64)
        coef = coef.reshape(-1, 8, 8) * q
        pix = np.einsum("yk,nkl,lx->nyx", _DCT.T, coef, _DCT) + 128.0
        plane = (pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(by * 8, bx * 8))
        plane = np.repeat(np.repeat(plane, vmax // vi, 0), hmax // hi, 1)
        out_planes.append(plane[:ih, :iw])

    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
