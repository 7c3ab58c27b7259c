"""Pure-stdlib PNG codec — REAL compressed-image decode without PIL.

PNG's container is chunks + zlib (both stdlib) + five per-row byte
filters (numpy).  This closes the "codec decode is environment-bound"
gap for the most common lossless web format: the media pipeline can
ingest actual .png payloads end-to-end in this container.  Scope:
8-bit truecolor (RGB / RGBA), non-interlaced — the dominant variant;
palette/16-bit/interlaced raise loudly.

Encoder (filter-0 rows) exists for fixtures and for writing decoded /
resized outputs back out.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(rgb: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3|4) uint8 array → non-interlaced 8-bit PNG bytes."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) uint8")
    h, w, c = rgb.shape
    color_type = 2 if c == 3 else 6
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, level))
            + chunk(b"IEND", b""))


_FP_MAX_PASSES = 48


def _leftscan_exact(f: int, row_l: list, prev_l: list, c: int) -> list:
    """Sequential reference decode of an Average/Paeth row — pure-Python
    ints over lists (≈10× the numpy-scalar-indexing loop it replaced)."""
    stride = len(row_l)
    cl = [0] * stride
    for i in range(stride):
        a = cl[i - c] if i >= c else 0
        b = prev_l[i]
        cc = prev_l[i - c] if i >= c else 0
        if f == 3:
            pred = (a + b) >> 1
        else:
            pp = a + b - cc
            pa_ = pp - a if pp >= a else a - pp
            pb_ = pp - b if pp >= b else b - pp
            pc_ = pp - cc if pp >= cc else cc - pp
            pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                (b if pb_ <= pc_ else cc)
        cl[i] = (row_l[i] + pred) & 0xFF
    return cl


def _defilter_avg_paeth(f: int, row: np.ndarray, prev: np.ndarray,
                        c: int) -> np.ndarray:
    """EXACT vectorized Average/Paeth via fixed-point iteration of the
    left-recurrence.  The shifted map G(u)[i] = (row[i] +
    pred(u[i-c], prev[i], prev[i-c])) & 255 has the true row as its
    unique fixed point (induction on i: positions < c have no left
    input, so any u with G(u) = u matches the sequential decode
    pixel-by-pixel).  Each pass is one numpy sweep; prediction errors
    damp (Average halves them), so typical rows settle in ~10 passes.
    Pathological rows (long pred=left chains) hit the pass cap and take
    the exact sequential fallback."""
    zeros = np.zeros(c, np.int32)
    cprev = np.concatenate([zeros, prev[:-c]])
    guess = row & 0xFF
    for _ in range(_FP_MAX_PASSES):
        left = np.concatenate([zeros, guess[:-c]])
        if f == 3:
            nxt = (row + ((left + prev) >> 1)) & 0xFF
        else:
            pp = left + prev - cprev
            pa_ = np.abs(pp - left)
            pb_ = np.abs(pp - prev)
            pc_ = np.abs(pp - cprev)
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                            np.where(pb_ <= pc_, prev, cprev))
            nxt = (row + pred) & 0xFF
        if np.array_equal(nxt, guess):
            return guess
        guess = nxt
    return np.array(_leftscan_exact(f, row.tolist(), prev.tolist(), c),
                    np.int32)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3|4) uint8 array.  All five row filters
    supported and all vectorized: Up/Sub directly, Average/Paeth via an
    exact fixed-point sweep (sequential fallback on pathological
    rows)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos, idat = 8, []
    w = h = ct = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ct, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or ct not in (2, 6) or interlace:
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG supported "
                    f"(depth={depth}, color_type={ct}, "
                    f"interlace={interlace})")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    c = 3 if ct == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1).astype(np.int32)
        p += 1 + stride
        if f == 0:                       # None
            cur = row
        elif f == 2:                     # Up
            cur = (row + prev) & 0xFF
        elif f == 1:                     # Sub: per-lane cumsum mod 256
            lanes = row.reshape(w, c)
            cur = (np.cumsum(lanes, axis=0, dtype=np.int64) & 0xFF) \
                .astype(np.int32).reshape(stride)
        elif f in (3, 4):                # Average / Paeth
            cur = _defilter_avg_paeth(f, row, prev, c)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c)
