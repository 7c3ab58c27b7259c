"""Pure-stdlib animated-GIF codec — REAL multi-frame decode without
PIL/ffmpeg.

GIF89a is the one genuinely multi-frame format decodable with stdlib
alone (container walk + variable-width LZW + palette lookup), so it
closes the "video frame sampling is environment-bound" gap the same way
ops/png.py and ops/jpeg.py closed still-image decode: the frame-sample
pipeline can ingest actual animated .gif payloads and emit true pixel
frames end-to-end in this container.  Scope: global color table,
progressive OR 4-pass interlaced rows, no local color tables (the
encoder's own output classes); local-table variants raise loudly.

Encoder: full variable-width LZW with dictionary growth, 12-bit cap and
mid-stream CLEAR resets, one Graphic Control Extension per frame.  The
decoder is additionally cross-checked in tests against a SECOND,
independent encoding path (``_lzw_encode_flat`` — a valid LZW stream
that clears before every symbol and never uses the dictionary), so an
encoder/decoder bug pair cannot cancel silently.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF89a"
_MAX_CODE = 4095


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, LSB-first bit packing)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int):
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF LZW: emit CLEAR, grow the dictionary to 12 bits, CLEAR and
    reset when full.  Widens the code width the moment ``next_code``
    reaches the current ceiling — the mirror of the decoder's
    ``len(table) == 1 << width`` bump."""
    clear = 1 << mcs
    eoi = clear + 1
    bw = _BitWriter()
    width = mcs + 1
    bw.write(clear, width)
    table: dict = {}
    next_code = eoi + 1
    seq = indices.tolist()
    w_code = seq[0]
    for k in seq[1:]:
        wk = (w_code << 8) | k
        c = table.get(wk)
        if c is not None:
            w_code = c
            continue
        bw.write(w_code, width)
        if next_code <= _MAX_CODE:
            table[wk] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            bw.write(clear, width)
            table = {}
            next_code = eoi + 1
            width = mcs + 1
        w_code = k
    bw.write(w_code, width)
    bw.write(eoi, width)
    return bw.done()


def _lzw_encode_flat(indices: np.ndarray, mcs: int) -> bytes:
    """Independent no-dictionary LZW stream (CLEAR before every symbol):
    ~0% compression, but a spec-valid stream produced WITHOUT any of
    ``_lzw_encode``'s dictionary logic — the decoder cross-check."""
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    bw = _BitWriter()
    bw.write(clear, width)
    for k in indices.tolist():
        bw.write(int(k), width)
        bw.write(clear, width)
    bw.write(eoi, width)
    return bw.done()


def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev = -1
    acc = 0
    n = 0
    pos = 0
    ln = len(data)
    while len(out) < n_pixels:
        while n < width:
            if pos >= ln:
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(table[prev] + entry[:1])
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = code
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("LZW output short of pixel count")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """GIF89a 4-pass interlace row order (start/step pairs)."""
    return np.concatenate([np.arange(s, h, t, dtype=np.int64)
                           for s, t in _INTERLACE_PASSES])


def encode_gif(frames: list[np.ndarray], palette: np.ndarray,
               delay_cs: int = 10, interlace: bool = False) -> bytes:
    """``frames``: list of (h, w) uint8 palette-index arrays;
    ``palette``: (n, 3) uint8 with n a power of two ≥ 2."""
    if not frames:
        raise ValueError("need ≥1 frame")
    n_colors = len(palette)
    bits = max((n_colors - 1).bit_length(), 1)
    if (1 << bits) != n_colors:
        raise ValueError("palette size must be a power of two")
    h, w = frames[0].shape
    out = bytearray(GIF_MAGIC)
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4)
                       | (bits - 1), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    mcs = max(bits, 2)
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share dimensions")
        if int(fr.max(initial=0)) >= n_colors:
            raise ValueError("index outside palette")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) \
            + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                      0x40 if interlace else 0)
        out.append(mcs)
        rows = fr[_interlace_order(h)] if interlace else fr
        out += _sub_blocks(_lzw_encode(rows.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)


def decode_gif(payload: bytes) -> list[np.ndarray]:
    """GIF bytes → list of (h, w, 3) uint8 RGB frames (full-canvas,
    global-palette, non-interlaced — what encode_gif emits)."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if not packed & 0x80:
        raise ValueError("global color table required")
    n_colors = 2 << (packed & 0x07)
    palette = np.frombuffer(payload[pos:pos + 3 * n_colors],
                            np.uint8).reshape(-1, 3)
    pos += 3 * n_colors
    frames: list[np.ndarray] = []
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:                       # trailer
            break
        if b == 0x21:                       # extension: skip sub-blocks
            pos += 1
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:                     # image descriptor
            left, top, fw, fh, ip = struct.unpack("<HHHHB",
                                                  payload[pos:pos + 9])
            pos += 9
            if ip & 0x80:
                raise NotImplementedError("local color tables")
            if (left, top, fw, fh) != (0, 0, w, h):
                raise NotImplementedError("partial-canvas frames")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = _lzw_decode(bytes(data), mcs, fw * fh).reshape(fh, fw)
            if ip & 0x40:                # de-interlace: invert row map
                rows = np.empty(fh, np.int64)
                rows[_interlace_order(fh)] = np.arange(fh)
                idx = idx[rows]
            frames.append(palette[idx])
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    return frames
