"""Pure-stdlib/numpy baseline JPEG codec — REAL lossy-image decode
without PIL, following the ops/png.py precedent.

Scope (the dominant web variant): baseline sequential DCT (SOF0/SOF1),
8-bit samples, Huffman entropy coding, grayscale / 4:4:4 / 4:2:2 /
4:2:0 chroma sampling, restart intervals.  Progressive (SOF2),
hierarchical, arithmetic coding and 12-bit precision raise loudly.

Design notes (all public-spec / textbook techniques):
* Entropy decode uses a 65536-entry prefix lookup table per Huffman
  table (peek 16 bits → (symbol, code length) in one numpy index), so
  the per-symbol Python cost is a dict-free O(1) step.
* Everything after entropy decode is vectorized: dequantization and
  inverse zigzag are batched fancy-index ops over an ``(nblocks, 64)``
  int32 array, the IDCT is two ``(n,8,8)`` matmuls against the
  orthonormal DCT-II basis, plane assembly is a transpose/reshape, and
  chroma upsampling is ``np.repeat``.
* The encoder exists for fixtures and round-trips: standard Annex-K
  quantization tables (IJG quality scaling) and Annex-K Huffman tables,
  byte stuffing, optional 4:2:0 subsampling and restart markers.

Tables below are from the public JPEG specification (ITU-T T.81
Annex K) — they are spec constants, not code from any implementation.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

# scan position k -> natural (row-major) index: gather in the encoder
# (scan = nat[ZZ]), scatter in the decoder (nat[ZZ] = scan)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], np.int64)

# Annex K.1 / K.2 base quantization tables (natural order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32)

# Annex K.3 Huffman specs: (BITS counts for code lengths 1..16, HUFFVAL)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)))
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)))
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
     0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
     0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
     0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
     0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
     0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
     0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
     0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
     0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
     0xf9, 0xfa])
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
     0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
     0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
     0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
     0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
     0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
     0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
     0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
     0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
     0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
     0xf9, 0xfa])

# orthonormal 8-point DCT-II basis: T @ T.T == I; forward F = T B T',
# inverse B = T' F T
_k = np.arange(8)
_DCT_T = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) / 2.0
_DCT_T[0, :] = 1.0 / np.sqrt(8.0)


def _canonical_codes(bits: list[int], values: list[int]):
    """BITS/HUFFVAL → {symbol: (code, length)} (T.81 C.2 canonical)."""
    out, code, vi = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return out


def _prefix_lut(bits: list[int], values: list[int]) -> np.ndarray:
    """BITS/HUFFVAL → 65536-entry uint16 LUT: peek 16 bits, index, get
    ``(symbol << 5) | code_length`` (0 = invalid prefix)."""
    lut = np.zeros(65536, np.uint16)
    code, vi = 0, 0
    for length in range(1, 17):
        span = 1 << (16 - length)
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            lut[lo:lo + span] = (values[vi] << 5) | length
            code += 1
            vi += 1
        code <<= 1
    return lut


def _quality_tables(quality: int):
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def s(base):
        return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)
    return s(QUANT_LUMA), s(QUANT_CHROMA)


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.buf >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.buf &= (1 << self.n) - 1

    def pad_to_byte(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


class _BitReader:
    """MSB-first reader over an unstuffed entropy segment (peek16 +
    skip drive the prefix-LUT decode)."""

    __slots__ = ("d", "pos", "buf", "n")

    def __init__(self, data: bytes):
        self.d = data + b"\x00\x00\x00"   # padding: safe peeks at EOS
        self.pos = 0
        self.buf = 0
        self.n = 0

    def peek16(self) -> int:
        while self.n < 16:
            self.buf = (self.buf << 8) | self.d[self.pos]
            self.pos += 1
            self.n += 8
        return (self.buf >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int):
        self.n -= k
        self.buf &= (1 << self.n) - 1

    def get(self, k: int) -> int:
        while self.n < k:
            self.buf = (self.buf << 8) | self.d[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= k
        v = self.buf >> self.n
        self.buf &= (1 << self.n) - 1
        return v


def _extend(r: int, s: int) -> int:
    """T.81 F.12: s-bit magnitude → signed value."""
    return r - (1 << s) + 1 if r < (1 << (s - 1)) else r


def _mag_bits(v: int) -> tuple[int, int]:
    """signed value → (size, magnitude bits) for the encoder."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


# ---------------------------------------------------------------- encode

def _rgb_to_ycbcr(rgb: np.ndarray):
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _fdct_quant(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Padded plane → (nblocks, 64) quantized coefficients in zigzag
    order (blocks in row-major block order), fully vectorized."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(bh * bw, 8, 8) - 128.0)
    coef = _DCT_T @ blocks @ _DCT_T.T
    q = coef / qtbl.reshape(8, 8)
    # round half away from zero, clamp to the Annex-K size range
    qz = np.trunc(q + np.copysign(0.5, q)).astype(np.int32)
    qz[:, 0, 0] = np.clip(qz[:, 0, 0], -2047, 2047)
    qz = qz.reshape(-1, 64)
    qz[:, 1:] = np.clip(qz[:, 1:], -1023, 1023)
    return qz[:, ZIGZAG]


def _encode_block(w: _BitWriter, scan: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(scan[0])
    s, mag = _mag_bits(dc - pred)
    code, ln = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(mag, s)
    nz = np.nonzero(scan[1:])[0] + 1
    k = 1
    for idx in nz:
        run = int(idx) - k
        while run >= 16:
            w.put(*ac_codes[0xF0])     # ZRL
            run -= 16
        s, mag = _mag_bits(int(scan[idx]))
        w.put(*ac_codes[(run << 4) | s])
        w.put(mag, s)
        k = int(idx) + 1
    if k < 64:
        w.put(*ac_codes[0x00])         # EOB
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """(h, w, 3) RGB or (h, w) / (h, w, 1) grayscale uint8 → baseline
    JFIF bytes.  ``subsample=True`` emits 4:2:0 chroma."""
    if img.dtype != np.uint8:
        raise ValueError("expected uint8 image")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("expected (h, w, 1|3) image")
    h, w, nc = img.shape
    qy, qc = _quality_tables(quality)
    gray = nc == 1

    if gray:
        comps = [dict(cid=1, hs=1, vs=1, plane=img[:, :, 0]
                      .astype(np.float64), qid=0, qt=qy, hid=0)]
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        # luma sampling factors: 4:4:4 → (1,1); 4:2:0 → (2,2); 4:2:2 →
        # (2,1); chroma planes box-mean-downsampled by the same factors
        sx, sy = {False: (1, 1), None: (1, 1), True: (2, 2),
                  "420": (2, 2), "422": (2, 1)}[subsample]
        if sx > 1 or sy > 1:
            ph2, pw2 = -(-h // sy) * sy, -(-w // sx) * sx
            def down(p):
                return (_pad_to(p, ph2, pw2)
                        .reshape(ph2 // sy, sy, pw2 // sx, sx)
                        .mean(axis=(1, 3)))
            cb, cr = down(cb), down(cr)
        comps = [dict(cid=1, hs=sx, vs=sy, plane=y, qid=0, qt=qy, hid=0),
                 dict(cid=2, hs=1, vs=1, plane=cb, qid=1, qt=qc, hid=1),
                 dict(cid=3, hs=1, vs=1, plane=cr, qid=1, qt=qc, hid=1)]

    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        bw, bh = mcux * c["hs"], mcuy * c["vs"]
        c["bw"] = bw
        c["scan"] = _fdct_quant(_pad_to(c["plane"], bh * 8, bw * 8),
                                c["qt"])

    dc_specs = [DC_LUMA_SPEC, DC_CHROMA_SPEC]
    ac_specs = [AC_LUMA_SPEC, AC_CHROMA_SPEC]
    dc_codes = [_canonical_codes(*s) for s in dc_specs]
    ac_codes = [_canonical_codes(*s) for s in ac_specs]

    bw_ = _BitWriter()
    preds = [0] * len(comps)
    entropy = bytearray()
    rst = 0
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw_.pad_to_byte()
            entropy += bw_.out
            entropy += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw_ = _BitWriter()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["vs"]):
                for bx in range(c["hs"]):
                    bi = (my * c["vs"] + by) * c["bw"] + mx * c["hs"] + bx
                    preds[ci] = _encode_block(
                        bw_, c["scan"][bi], preds[ci],
                        dc_codes[c["hid"]], ac_codes[c["hid"]])
    bw_.pad_to_byte()
    entropy += bw_.out

    out = bytearray(JPEG_MAGIC)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qts = bytes([0]) + bytes(qy[ZIGZAG].tolist())
    if not gray:
        qts += bytes([1]) + bytes(qc[ZIGZAG].tolist())
    out += _seg(0xDB, qts)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += bytes([c["cid"], (c["hs"] << 4) | c["vs"], c["qid"]])
    out += _seg(0xC0, sof)
    dht = b""
    for hid in range(max(c["hid"] for c in comps) + 1):
        bits, vals = dc_specs[hid]
        dht += bytes([0x00 | hid]) + bytes(bits) + bytes(vals)
        bits, vals = ac_specs[hid]
        dht += bytes([0x10 | hid]) + bytes(bits) + bytes(vals)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["cid"], (c["hid"] << 4) | c["hid"]])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- decode

_SOF_UNSUPPORTED = {
    0xC2: "progressive DCT (SOF2)", 0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _split_scan(data: bytes, pos: int):
    """Entropy bytes from ``pos`` → (restart segments with stuffing
    removed, position of the terminating marker)."""
    segs, cur = [], bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = data[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, pos


def _decode_block_scan(bits: _BitReader, dclut: np.ndarray,
                       aclut: np.ndarray, pred: int, out: list) -> int:
    """One 8×8 block → 64 zigzag coefficients appended to ``out``."""
    coef = [0] * 64
    v = int(dclut[bits.peek16()])
    ln = v & 31
    if ln == 0:
        raise ValueError("corrupt JPEG: invalid DC Huffman prefix")
    bits.skip(ln)
    s = v >> 5
    pred += _extend(bits.get(s), s) if s else 0
    coef[0] = pred
    k = 1
    while k < 64:
        v = int(aclut[bits.peek16()])
        ln = v & 31
        if ln == 0:
            raise ValueError("corrupt JPEG: invalid AC Huffman prefix")
        bits.skip(ln)
        rs = v >> 5
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break                       # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC run past block end")
        coef[k] = _extend(bits.get(s), s)
        k += 1
    out.append(coef)
    return pred


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 1|3) uint8 array."""
    if data[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    luts: dict[tuple[int, int], np.ndarray] = {}
    frame = None
    restart_interval = 0
    planes = None
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:              # fill byte
            pos -= 1
            continue
        if marker == 0xD9:              # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} not supported — "
                "baseline sequential Huffman (SOF0/SOF1) only")
        if marker == 0xDB:              # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                o += 1
                if pq:                  # 16-bit precision
                    vals = np.frombuffer(body[o:o + 128],
                                         ">u2").astype(np.int32)
                    o += 128
                else:
                    vals = np.frombuffer(body[o:o + 64],
                                         np.uint8).astype(np.int32)
                    o += 64
                nat = np.zeros(64, np.int32)
                nat[ZIGZAG] = vals
                qtabs[tq] = nat
        elif marker == 0xC4:            # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                o += 1
                bits = list(body[o:o + 16])
                o += 16
                nvals = sum(bits)
                vals = list(body[o:o + nvals])
                o += nvals
                luts[(tc, th)] = _prefix_lut(bits, vals)
        elif marker in (0xC0, 0xC1):    # SOF0/1
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append(dict(cid=cid, hs=hv >> 4, vs=hv & 15, tq=tq))
            frame = dict(h=fh, w=fw, comps=comps)
        elif marker == 0xDD:            # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:            # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = body[0]
            sel = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 15)
            planes, pos = _decode_scan(data, pos, frame, sel, qtabs,
                                       luts, restart_interval)
    if planes is None:
        raise ValueError("corrupt JPEG: no scan data")
    return _reassemble(frame, planes)


def _decode_scan(data, pos, frame, sel, qtabs, luts, restart_interval):
    comps = frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    segs, pos = _split_scan(data, pos)
    per_comp = [[] for _ in comps]      # block coef lists, MCU order
    order = [[] for _ in comps]         # block index per appended block
    n_mcu = mcux * mcuy
    mi = 0
    for seg in segs:
        bits = _BitReader(seg)
        preds = [0] * len(comps)
        end = min(n_mcu, mi + restart_interval) \
            if restart_interval else n_mcu
        while mi < end:
            my, mx = divmod(mi, mcux)
            for ci, c in enumerate(comps):
                dcl = luts[(0, sel[c["cid"]][0])]
                acl = luts[(1, sel[c["cid"]][1])]
                bwc = mcux * c["hs"]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        preds[ci] = _decode_block_scan(
                            bits, dcl, acl, preds[ci], per_comp[ci])
                        order[ci].append(
                            (my * c["vs"] + by) * bwc
                            + mx * c["hs"] + bx)
            mi += 1
        if mi >= n_mcu:
            break
    if mi < n_mcu:
        raise ValueError("corrupt JPEG: truncated scan")

    planes = []
    for ci, c in enumerate(comps):
        bwc, bhc = mcux * c["hs"], mcuy * c["vs"]
        scan = np.asarray(per_comp[ci], np.int32)
        deq = scan * qtabs[c["tq"]][ZIGZAG][None, :]
        nat = np.zeros_like(deq)
        nat[:, ZIGZAG] = deq
        # scatter into MCU-raster block positions, then batched IDCT
        arranged = np.zeros((bhc * bwc, 64), np.int32)
        arranged[np.asarray(order[ci], np.int64)] = nat
        blocks = arranged.reshape(-1, 8, 8).astype(np.float64)
        pix = _DCT_T.T @ blocks @ _DCT_T + 128.0
        plane = (pix.reshape(bhc, bwc, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bhc * 8, bwc * 8))
        planes.append((plane, hmax // c["hs"], vmax // c["vs"]))
    return planes, pos


def _reassemble(frame, planes) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    chans = []
    for plane, rx, ry in planes:
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        chans.append(plane[:h, :w])
    if len(chans) == 1:
        g = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = chans
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
