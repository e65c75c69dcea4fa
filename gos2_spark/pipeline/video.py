"""Pure-stdlib MJPEG-in-AVI video codec — the fourth REAL codec behind
the multimodal decode hook (png.py / jpeg.py images, audio.py WAV).

Motion-JPEG is the simplest real video coding: an AVI RIFF container
whose '00dc' chunks each hold one complete baseline JPEG. That makes
video decode = container walk + per-frame jpeg.decode_jpeg, and frame
SAMPLING (the thing a training-data pipeline actually does to video) can
seek straight to the wanted chunks without decoding the rest.

* ``parse_avi``          — header walk: width/height, usec-per-frame
                           (fps), total frames, codec fourcc, and the
                           byte ranges of every video frame chunk.
* ``decode_avi_frame``   — decode frame k to an (H, W, C) uint8 array.
* ``sample_avi_frames``  — decode every k-th frame for a wanted sampling
                           period (only the sampled chunks are decoded).
* ``encode_avi_mjpeg``   — fixture writer: list of uint8 arrays -> AVI.

Non-MJPEG fourccs raise NotImplementedError (parse_avi still reports the
container metadata); interframe codecs (H.264 etc.) need pyav, absent in
this container, and swap in at multimodal.decode hooks without touching
the Spark-side pipeline.
"""

from __future__ import annotations

import struct

import numpy as np


def _walk(b: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size, list_type) within
    [start, end); list_type is set for LIST/RIFF chunks."""
    i = start
    while i + 8 <= end:
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid in (b"RIFF", b"LIST"):
            yield cid, i + 12, size - 4, b[i + 8:i + 12]
        else:
            yield cid, i + 8, size, None
        i += 8 + size + (size & 1)


def parse_avi(data: bytes) -> dict:
    """AVI container walk: stream geometry + frame chunk byte ranges."""
    b = bytes(data)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    info: dict = {"format": "avi", "frames": []}

    def visit(start: int, end: int) -> None:
        for cid, ps, sz, ltype in _walk(b, start, end):
            if cid in (b"RIFF", b"LIST"):
                if ltype in (b"hdrl", b"strl", b"movi"):
                    visit(ps, ps + sz)
            elif cid == b"avih":
                (usec, _mbps, _pad, _flags, total, _init, _nstr, _buf,
                 w, h) = struct.unpack("<10I", b[ps:ps + 40])
                info.update(usec_per_frame=usec, total_frames=total,
                            width=w, height=h)
            elif cid == b"strh":
                fcc_type = b[ps:ps + 4]
                if fcc_type == b"vids":
                    info["codec"] = b[ps + 4:ps + 8].decode("ascii", "replace")
            elif cid[2:4] in (b"dc", b"db"):
                info["frames"].append((ps, sz))

    visit(12, len(b))
    if "width" not in info:
        raise ValueError("no avih header found")
    info["n_frames"] = len(info["frames"])
    return info


def decode_avi_frame(data: bytes, info: dict, k: int) -> np.ndarray:
    """Decode frame ``k`` (0-based) to (H, W, C) uint8 via the baseline
    JPEG decoder. Only this frame's bytes are touched."""
    if info.get("codec", "MJPG").upper() not in ("MJPG", "MJPEG"):
        raise NotImplementedError(
            f"video codec {info.get('codec')!r} not supported (MJPG only)"
        )
    from .jpeg import decode_jpeg

    ps, sz = info["frames"][k]
    return decode_jpeg(bytes(data)[ps:ps + sz])


def sample_avi_frames(
    data: bytes, every_ms: int = 1000
) -> tuple[dict, list[np.ndarray]]:
    """Decode one frame per ``every_ms`` of video time (always including
    frame 0) — the training-pipeline sampling primitive. Returns
    (container info, list of decoded frames); unsampled chunks are never
    decoded."""
    info = parse_avi(data)
    usec = max(1, info.get("usec_per_frame", 33333))
    step = max(1, int(round(every_ms * 1000.0 / usec)))
    idx = list(range(0, info["n_frames"], step))
    return info, [decode_avi_frame(data, info, k) for k in idx]


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: float = 25.0, quality: int = 95
) -> bytes:
    """uint8 frame arrays (all same shape) -> MJPEG AVI bytes."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    payloads = [encode_jpeg(f, quality=quality) for f in frames]
    usec = int(round(1_000_000.0 / fps))

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I", usec, 0, 0, 0x10, len(frames), 0, 1, max(map(len, payloads)),
        w, h, 0, 0, 0, 0,
    )
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, int(round(fps)), 0, len(frames),
        max(map(len, payloads)), 0xFFFFFFFF, 0,
    ) + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"movi" + b"".join(chunk(b"00dc", p) for p in payloads)
    movi = chunk(b"LIST", movi_body)
    # idx1: one entry per frame (offset relative to 'movi' fourcc)
    idx_entries = []
    off = 4
    for p in payloads:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(p)))
        off += 8 + len(p) + (len(p) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
