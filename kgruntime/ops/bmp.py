"""Minimal REAL BMP codec — stdlib ``struct`` + numpy only.

Scope (documented, loud on anything else): uncompressed 24-bit BI_RGB
``BITMAPINFOHEADER`` files — the interchange baseline every image tool
emits.  Rows are stored bottom-up, BGR, each padded to a 4-byte
boundary; the decoder also accepts top-down files (negative height), as
the spec allows.

No reference-parser counterpart (the reference is a text parser); this
extends the repo's media codec family (png.py, jpeg.py, gif.py,
wav.py) for the multimodal-column pipeline.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")     # magic, size, res1, res2, offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP."""
    assert rgb.ndim == 3 and rgb.shape[2] == 3 and rgb.dtype == np.uint8
    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), np.uint8)
    # bottom-up rows, BGR channel order
    body[:, :w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    off = _FILE_HDR.size + _INFO_HDR.size
    info = _INFO_HDR.pack(_INFO_HDR.size, w, h, 1, 24, 0,
                          row_bytes * h, 2835, 2835, 0, 0)
    head = _FILE_HDR.pack(b"BM", off + row_bytes * h, 0, 0, off)
    return head + info + body.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP into an (H, W, 3) uint8 RGB array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    _, _, _, _, off = _FILE_HDR.unpack_from(data, 0)
    (hdr_size, w, h, planes, bpp, comp, _, _, _, _, _) = \
        _INFO_HDR.unpack_from(data, _FILE_HDR.size)
    if hdr_size < _INFO_HDR.size or planes != 1:
        raise NotImplementedError("unsupported BMP header variant")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB supported (got bpp={bpp}, comp={comp})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    body = np.frombuffer(data, np.uint8, count=row_bytes * h,
                         offset=off).reshape(h, row_bytes)
    px = body[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
    return (px if top_down else px[::-1]).copy()
