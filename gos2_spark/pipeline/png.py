"""Minimal real PNG codec (pure stdlib zlib/struct + numpy).

This container has no PIL/ffmpeg, but PNG needs neither: the format is
zlib-inflate + five per-scanline byte filters (PNG spec, RFC 2083 §6).
``decode_png`` is the REAL decoder behind ``multimodal.decode_real`` —
actual payload bytes in, pixel array out — so the media feature pipeline
exercises bytes -> pixels -> features end to end. ``encode_png`` (filter 0,
non-interlaced) exists so tests and synthetic tables can produce valid
payloads deterministically.

Scale note: decode runs inside mapInPandas tasks, one image per call —
CPU per byte is what it is for any codec; the distributed contract
(bounded Arrow batches, no driver involvement) lives in multimodal.py.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced. Anything else raises ValueError with the
offending field named.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (height, width, channels)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 2:  # Up — fully vectorized
            cur = (line.astype(np.int16) + prev) .astype(np.uint8)
        elif ftype == 1:  # Sub — per-lane cumulative sum mod 256
            cur = (np.cumsum(line.reshape(-1, ch), axis=0, dtype=np.uint64)
                   % 256).astype(np.uint8).reshape(-1)
        elif ftype in (3, 4):  # Average / Paeth — left+up dependence
            li, pi = line.tolist(), prev.tolist()
            buf = [0] * stride
            for x in range(stride):
                a = buf[x - ch] if x >= ch else 0
                b = pi[x]
                if ftype == 3:
                    buf[x] = (li[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = pi[x - ch] if x >= ch else 0
                    buf[x] = (li[x] + _paeth(a, b, c)) & 0xFF
            cur = np.array(buf, dtype=np.uint8)
        else:
            raise ValueError(f"bad filter type {ftype} at row {y}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """uint8 (H, W) or (H, W, {1,2,3,4}) array -> PNG bytes (filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(a[y].tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + chunk(b"IEND", b"")
    )
