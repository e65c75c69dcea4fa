"""Pure-Python model of XXH64 (as used by Spark's xxhash64, seed 42),
validated against Spark itself by tools/xxh64_validate.py."""

M = (1 << 64) - 1
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & M
    return (_rotl(acc, 31) * P1) & M


def _merge_round(acc: int, val: int) -> int:
    val = _round(0, val)
    acc ^= val
    return (acc * P1 + P4) & M


def _u64le(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 8], "little")


def _u32le(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 4], "little")


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 32:
            v1 = _round(v1, _u64le(data, i))
            v2 = _round(v2, _u64le(data, i + 8))
            v3 = _round(v3, _u64le(data, i + 16))
            v4 = _round(v4, _u64le(data, i + 24))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 8:
        h ^= _round(0, _u64le(data, i))
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i <= n - 4:
        h ^= (_u32le(data, i) * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64_signed(s: str, seed: int = 42) -> int:
    """Spark LongType view of xxh64 over the UTF-8 bytes."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h
