"""Pure-stdlib/numpy baseline JPEG codec (ITU-T T.81).

Second REAL codec for the multimodal decode hook (the first is png.py):

* ``parse_jpeg``      — marker walker: dimensions, components, sampling,
                        DQT tables (dezigzagged), progressive/baseline flag.
                        Works on ANY JPEG, including progressive.
* ``decode_jpeg``     — full baseline decode (Huffman -> dequant -> IDCT ->
                        YCbCr->RGB) for non-subsampled (4:4:4 / grayscale)
                        baseline streams; Huffman tables are read from the
                        file's own DHT segments, so any spec-conformant
                        baseline 4:4:4 JPEG decodes, not just ours.
                        Subsampled / progressive inputs raise
                        NotImplementedError (parse_jpeg still reports them).
* ``encode_jpeg``     — baseline encoder (Annex K tables, libjpeg quality
                        scaling) used to build deterministic test fixtures
                        executor-side; grayscale and RGB (4:4:4).

Per-8x8-block work is plain Python + numpy — this is correctness plumbing
for fixtures and the decode hook, which runs inside mapInPandas on
executors; a production deployment swaps in libjpeg-turbo via PIL without
touching the surrounding pipeline (multimodal.py contract).
"""

from __future__ import annotations

import math
import struct

import numpy as np

# stream order -> (row, col) of the 8x8 block (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 / K.2 reference quantization tables (row-major)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
     0xF9, 0xFA],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
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
     0xF9, 0xFA],
)

# orthonormal 8-point DCT-II basis: M[u, x] = C(u)/2 * cos((2x+1) u pi / 16)
_DCT = np.array([
    [0.5 * (math.sqrt(0.5) if u == 0 else 1.0)
     * math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
])

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _canonical_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} (T.81 Annex C)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _quality_tables(quality: int):
    """libjpeg quality scaling of the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:           # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:        # stuffed byte
                    self.pos += 1
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: skip, continue
                    self.pos += 1
                    b = self.data[self.pos]
                    self.pos += 1
                else:                  # EOI or next segment: pad with 1s
                    self.pos -= 1
                    b = 0xFF
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v


def _extend(bits: int, size: int) -> int:
    """magnitude bits -> signed value (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _mag(value: int) -> tuple[int, int]:
    """signed value -> (size, magnitude bits)."""
    size = int(abs(value)).bit_length()
    bits = value if value >= 0 else value + (1 << size) - 1
    return size, bits


def parse_jpeg(data: bytes) -> dict:
    """Marker-segment walk: dimensions, components, DQT (dezigzagged),
    baseline/progressive flag, restart interval. No entropy decode —
    works on any JPEG."""
    b = bytes(data)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    info: dict = {"format": "jpeg", "dqt": {}, "progressive": False,
                  "restart_interval": 0, "components": [], "n_dht": 0}
    i = 2
    while i < len(b) - 1:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xFF, 0x00) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2 if marker != 0xFF else 1
            continue
        if marker == 0xD9:  # EOI
            break
        length = struct.unpack(">H", b[i + 2:i + 4])[0]
        seg = b[i + 4:i + 2 + length]
        if marker in _SOF_MARKERS:
            info["progressive"] = marker in (0xC2, 0xC6, 0xCA, 0xCE)
            info["precision"] = seg[0]
            info["height"], info["width"] = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            info["components"] = comps
        elif marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    vals = np.frombuffer(
                        seg[j:j + 128], dtype=">u2"
                    ).astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(
                        seg[j:j + 64], dtype=np.uint8
                    ).astype(np.int64)
                    j += 64
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = vals     # store row-major
                info["dqt"][tq] = table
        elif marker == 0xC4:  # DHT
            info["n_dht"] += 1
        elif marker == 0xDD:  # DRI
            info["restart_interval"] = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS: entropy data follows; skip to EOI scan
            info["sos_at"] = i
            break
        i += 2 + length
    if "width" not in info:
        raise ValueError("no SOF marker found")
    return info


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline non-subsampled JPEG -> (H, W, C) uint8 (C = 1 or 3, RGB).

    Huffman tables come from the stream's own DHT segments; quant tables
    from its DQT. Progressive or subsampled streams raise
    NotImplementedError (use parse_jpeg for their metadata)."""
    b = bytes(data)
    info = parse_jpeg(b)
    if info["progressive"]:
        raise NotImplementedError("progressive JPEG decode not implemented")
    if any(c["h"] != 1 or c["v"] != 1 for c in info["components"]):
        raise NotImplementedError("chroma-subsampled JPEG decode not implemented")
    if info["precision"] != 8:
        raise NotImplementedError("only 8-bit precision supported")

    # second walk for DHT + SOS (parse_jpeg stops at SOS)
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    scan_comps: list[tuple[int, int, int]] = []  # (comp_idx, td, ta)
    i = 2
    data_start = -1
    while i < len(b) - 1:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xFF, 0x00) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2 if marker != 0xFF else 1
            continue
        if marker == 0xD9:
            break
        length = struct.unpack(">H", b[i + 2:i + 4])[0]
        seg = b[i + 4:i + 2 + length]
        if marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                nvals = sum(bits)
                vals = list(seg[j + 17:j + 17 + nvals])
                # decode map: (length, code) -> symbol
                table = {}
                code = 0
                k = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                (ac_tables if tc else dc_tables)[th] = table
                j += 17 + nvals
        elif marker == 0xDA:
            ns = seg[0]
            comp_by_id = {c["id"]: idx for idx, c in enumerate(info["components"])}
            for s in range(ns):
                cid = seg[1 + 2 * s]
                td_ta = seg[2 + 2 * s]
                scan_comps.append((comp_by_id[cid], td_ta >> 4, td_ta & 15))
            data_start = i + 2 + length
            break
        i += 2 + length
    if data_start < 0:
        raise ValueError("no SOS marker found")

    h, w = info["height"], info["width"]
    ncomp = len(info["components"])
    bh, bw = (h + 7) // 8, (w + 7) // 8
    reader = _BitReader(b, data_start)
    planes = np.zeros((ncomp, bh * 8, bw * 8), dtype=np.float64)
    pred = [0] * ncomp

    def read_symbol(table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    for by in range(bh):
        for bx in range(bw):
            for ci, td, ta in scan_comps:
                dct = dc_tables[td]
                act = ac_tables[ta]
                zz = np.zeros(64, dtype=np.int64)
                size = read_symbol(dct)
                diff = _extend(reader.read(size), size)
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    sym = read_symbol(act)
                    run, size = sym >> 4, sym & 15
                    if size == 0:
                        if run == 15:  # ZRL: 16 zeros
                            k += 16
                            continue
                        break          # EOB
                    k += run
                    zz[k] = _extend(reader.read(size), size)
                    k += 1
                q = info["dqt"][info["components"][ci]["tq"]]
                block = np.zeros(64, dtype=np.float64)
                block[ZIGZAG] = zz * q[ZIGZAG]   # both stored zigzag-stream order
                block = block.reshape(8, 8)
                pix = _DCT.T @ block @ _DCT + 128.0
                planes[ci, by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = pix

    planes = np.clip(planes[:, :h, :w], 0, 255)
    # round-to-nearest (truncation would bias every pixel -0.5)
    if ncomp == 1:
        return np.round(planes[0]).astype(np.uint8)[..., None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.round(
        np.clip(np.stack([r, g, bl], axis=-1), 0, 255)
    ).astype(np.uint8)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(H, W) / (H, W, 1) grayscale or (H, W, 3) RGB uint8 -> baseline
    JFIF bytes (4:4:4, Annex K Huffman tables, libjpeg quality scaling)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    h, w, ch = img.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    ql, qc = _quality_tables(quality)

    if ch == 3:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        comps = [(y, ql, 0), (cb, qc, 1), (cr, qc, 1)]
    else:
        comps = [(img[..., 0].astype(np.float64), ql, 0)]

    out = bytearray(b"\xff\xd8")                      # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])   # APP0
    # DQT (zigzag stream order)
    for tq, tbl in ([(0, ql)] if ch == 1 else [(0, ql), (1, qc)]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(tbl[z]) for z in ZIGZAG)
    # SOF0
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * ch) + bytes([8])
    out += struct.pack(">HH", h, w) + bytes([ch])
    for c in range(ch):
        out += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    # DHT
    huff = {}
    tables = ([(0x00, DC_LUMA), (0x10, AC_LUMA)] if ch == 1 else
              [(0x00, DC_LUMA), (0x10, AC_LUMA),
               (0x01, DC_CHROMA), (0x11, AC_CHROMA)])
    for tid, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tid])
        out += bytes(bits) + bytes(vals)
        huff[tid] = _canonical_codes(bits, vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ch) + bytes([ch])
    for c in range(ch):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += bytes([0, 63, 0])

    bh, bw = (h + 7) // 8, (w + 7) // 8
    writer = _BitWriter()
    pred = [0] * ch
    padded = []
    for plane, _, _ in comps:
        p = np.empty((bh * 8, bw * 8), dtype=np.float64)
        p[:h, :w] = plane
        p[h:, :w] = plane[h - 1:h, :]        # edge replicate
        p[:, w:] = p[:, w - 1:w]
        padded.append(p - 128.0)
    for by in range(bh):
        for bx in range(bw):
            for ci, (plane, qt, chroma) in enumerate(comps):
                block = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _DCT @ block @ _DCT.T
                zz = np.round(
                    coef.reshape(-1)[ZIGZAG] / qt[ZIGZAG]
                ).astype(np.int64)
                dc_h = huff[0x01 if chroma else 0x00]
                ac_h = huff[0x11 if chroma else 0x10]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size, bits_v = _mag(diff)
                code, ln = dc_h[size]
                writer.write(code, ln)
                writer.write(bits_v, size)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if k > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_h[0xF0]     # ZRL
                        writer.write(code, ln)
                        run -= 16
                    size, bits_v = _mag(v)
                    code, ln = ac_h[(run << 4) | size]
                    writer.write(code, ln)
                    writer.write(bits_v, size)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_h[0x00]         # EOB
                    writer.write(code, ln)
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"                            # EOI
    return bytes(out)
