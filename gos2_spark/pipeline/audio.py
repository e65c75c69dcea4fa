"""Pure-stdlib WAV (RIFF PCM) audio codec — the third REAL codec behind
the multimodal decode hook (png.py, jpeg.py are the image two).

* ``parse_wav``  — RIFF chunk walker: sample rate, channels, bit depth,
                   frame count, duration; tolerates extra chunks (LIST,
                   fact, cue) the way real encoders emit them.
* ``decode_wav`` — PCM payload -> (n_frames, channels) float64 in [-1, 1)
                   for 8/16/24/32-bit integer PCM and 32-bit float PCM.
* ``encode_wav`` — int16 PCM writer for deterministic executor-side
                   fixtures.

Decode is a few numpy reshapes over the raw data chunk (no per-sample
Python); compressed codecs (MP3/AAC/OGG) still raise NotImplementedError
from the dispatch in multimodal.decode_real — swapping in torchaudio
changes that one function, not the pipeline.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunks(b: bytes):
    """Yield (fourcc, payload) for each top-level RIFF sub-chunk."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        yield cid, b[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)  # chunks are word-aligned


def parse_wav(data: bytes) -> dict:
    """Header walk: format tag, channels, rate, bit depth, frames,
    duration_ms. Works on any spec-conformant RIFF/WAVE container."""
    b = bytes(data)
    info: dict = {"format": "wav"}
    data_len = None
    for cid, payload in _chunks(b):
        if cid == b"fmt ":
            (tag, ch, rate, _brate, block, bits) = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            info.update(
                audio_format=tag, channels=ch, sample_rate=rate,
                block_align=block, bits_per_sample=bits,
            )
        elif cid == b"data":
            data_len = len(payload)
    if "channels" not in info or data_len is None:
        raise ValueError("missing fmt or data chunk")
    frames = data_len // max(1, info["block_align"])
    info["n_frames"] = frames
    info["duration_ms"] = int(round(1000.0 * frames / info["sample_rate"]))
    return info


def decode_wav(data: bytes) -> np.ndarray:
    """WAV bytes -> (n_frames, channels) float64 waveform in [-1, 1).

    Integer PCM divides by 2^(bits-1) (so int16 -32768 -> -1.0 exactly);
    float PCM passes through. Non-PCM format tags raise."""
    b = bytes(data)
    info = parse_wav(b)
    raw = None
    for cid, payload in _chunks(b):
        if cid == b"data":
            raw = payload
            break
    tag, ch, bits = info["audio_format"], info["channels"], info["bits_per_sample"]
    if tag == 1:  # integer PCM
        if bits == 8:  # unsigned
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            u = np.frombuffer(raw, dtype=np.uint8)
            u = u[: len(u) - len(u) % 3].reshape(-1, 3).astype(np.int64)
            v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"PCM bit depth {bits} not supported")
    elif tag == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} (bits={bits}) not supported — PCM only"
        )
    n = (len(x) // ch) * ch
    return x[:n].reshape(-1, ch)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n_frames,) or (n_frames, channels) int16 -> RIFF/WAVE bytes."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    ch = s.shape[1]
    raw = s.astype("<i2").tobytes()
    block = 2 * ch
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block,
                      block, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body
