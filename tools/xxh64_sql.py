"""Generate a DuckDB SQL expression computing Spark's xxhash64 (XXH64,
seed 42, signed-int64 view) for every element of a list<varchar>.

ASCII-only inputs (byte == codepoint, verified for the testdata corpus).
All 64-bit wrapping arithmetic runs in HUGEINT with explicit % 2^64.
HUGEINT is a SIGNED 128-bit type, so a full 64x64 product overflows;
mulmod splits the variable operand into 32-bit halves:
  (a*b) % 2^64 = (a_lo*b + ((a_hi*b) % 2^32) * 2^32) % 2^64.
rotl(x,r) = ((x*2^r) % 2^64) + (x >> (64-r)) since the parts are disjoint;
xor() is DuckDB's HUGEINT-capable bitwise xor. The only true loop (32-byte
stripes) is a list_reduce over stripe structs; 8/4/1-byte tails are
unrolled (<= 3 / 1 / 3 iterations by construction).

Validated against tools/xxh64_model.py (itself validated against Spark).
"""

M = 1 << 64
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
SEED = 42


def _m(e: str) -> str:
    return f"(({e}) % {M})"


def _mul(a: str, b: int) -> str:
    """(a * b) % 2^64 without overflowing signed int128."""
    return (
        f"((((({a}) % 4294967296) * {b})"
        f" + (((({a}) // 4294967296) * {b}) % 4294967296) * 4294967296)"
        f" % {M})"
    )


def _rotl(e: str, r: int) -> str:
    return _m(f"((({e}) * {1 << r}) % {M}) + (({e}) // {1 << (64 - r)})")


def _word(b: str, o: str, nbytes: int = 8) -> str:
    """little-endian word from 1-based byte list ``b`` starting at 1-based
    offset expression ``o`` (o points just before the first byte)."""
    return "(" + " + ".join(
        f"({b})[({o}) + {k + 1}] * {1 << (8 * k)}" for k in range(nbytes)
    ) + ")"


def _round(acc: str, w: str) -> str:
    """XXH64 round: rotl31(acc + w*P2) * P1, all mod 2^64."""
    inner = _m(f"({acc}) + {_mul(w, P2)}")
    return _mul(_rotl(inner, 31), P1)


def xxh64_list_sql(list_expr: str) -> str:
    """list<varchar> -> list<bigint> of Spark-compatible xxhash64 values."""
    # stage 1: bind n and the byte list
    s1 = (
        f"list_transform({list_expr}, g -> struct_pack("
        f"n := length(g), "
        f"b := list_transform(generate_series(1, length(g)),"
        f" p -> CAST(ascii(substr(g, p, 1)) AS HUGEINT))))"
    )
    # stage 2: stripe phase -> pre-tail h (+ carried n/b)
    stripe_structs = (
        "list_transform(generate_series(0, (t.n // 32) - 1), s -> struct_pack("
        + ", ".join(
            f"w{q + 1} := {_word('t.b', f'(s * 32 + {q * 8})')}"
            for q in range(4)
        )
        + "))"
    )
    init = "struct_pack(" + ", ".join(
        f"w{q + 1} := CAST('{v}' AS HUGEINT)"
        for q, v in enumerate([
            (SEED + P1 + P2) % M, (SEED + P2) % M, SEED % M, (SEED - P1) % M,
        ])
    ) + ")"
    reduced = (
        f"list_reduce(list_prepend({init}, {stripe_structs}), (a, x) ->"
        " struct_pack("
        + ", ".join(f"w{q} := {_round(f'a.w{q}', f'x.w{q}')}" for q in (1, 2, 3, 4))
        + "))"
    )
    s2a = (
        f"list_transform({s1}, t -> struct_pack(n := t.n, b := t.b,"
        f" r := {reduced}))"
    )
    conv = _m(
        " + ".join(_rotl(f"t.r.w{q}", r) for q, r in ((1, 1), (2, 7), (3, 12), (4, 18)))
    )
    h_big = conv
    for q in (1, 2, 3, 4):
        rq = _round("0", "t.r.w%d" % q)
        h_big = _m(_mul("xor(%s, %s)" % (h_big, rq), P1) + " + %d" % P4)
    s2 = (
        f"list_transform({s2a}, t -> struct_pack(n := t.n, b := t.b,"
        f" h := (CASE WHEN t.n >= 32 THEN {h_big}"
        f" ELSE CAST('{(SEED + P5) % M}' AS HUGEINT) END + t.n) % {M}))"
    )
    # stage 3: 8-byte tail (up to 3 words), from offset i0 = 32*(n//32)
    def step8(h: str, o: str) -> str:
        x = f"xor({h}, {_round('0', _word('t.b', o))})"
        return _m(f"{_mul(_rotl(x, 27), P1)} + {P4}")

    h = "t.h"
    for w in range(3):
        off = f"(32 * (t.n // 32) + {8 * w})"
        h = (
            f"CASE WHEN (t.n % 32) // 8 >= {w + 1}"
            f" THEN {step8(h, off)} ELSE {h} END"
        )
        # re-bind after each conditional step to keep expression growth linear
        s2 = (
            f"list_transform({s2}, t -> struct_pack(n := t.n, b := t.b,"
            f" h := {h}))"
        )
        h = "t.h"
    s3 = s2
    # stage 4: 4-byte tail
    i1 = "(t.n - (t.n % 8))"
    u32 = _word("t.b", i1, 4)
    h4 = _m(f"{_mul(_rotl(f'xor(t.h, {_mul(u32, P1)})', 23), P2)} + {P3}")
    s4 = (
        f"list_transform({s3}, t -> struct_pack(n := t.n, b := t.b,"
        f" h := CASE WHEN (t.n % 8) >= 4 THEN {h4} ELSE t.h END))"
    )
    # up to 3 single bytes
    i2 = "(t.n - (t.n % 4))"
    for w in range(3):
        hb = f"xor(t.h, {_mul(f't.b[{i2} + {w + 1}]', P5)})"
        stepb = _mul(_rotl(hb, 11), P1)
        s4 = (
            f"list_transform({s4}, t -> struct_pack(n := t.n, b := t.b,"
            f" h := CASE WHEN (t.n % 4) >= {w + 1} THEN {stepb} ELSE t.h END))"
        )
    # avalanche
    s5 = (
        f"list_transform({s4}, t -> struct_pack("
        f"h := {_mul(f'xor(t.h, t.h // {1 << 33})', P2)}))"
    )
    s6 = (
        f"list_transform({s5}, t -> struct_pack("
        f"h := {_mul(f'xor(t.h, t.h // {1 << 29})', P3)}))"
    )
    final = f"xor(t.h, t.h // {1 << 32})"
    signed = (
        f"CASE WHEN ({final}) >= {1 << 63}"
        f" THEN CAST(({final}) - {M} AS BIGINT)"
        f" ELSE CAST(({final}) AS BIGINT) END"
    )
    return f"list_transform({s6}, t -> {signed})"


if __name__ == "__main__":
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import duckdb

    from xxh64_model import xxh64_signed

    con = duckdb.connect()
    strs = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "hello world", "x" * 31, "y" * 32, "z" * 33, "q" * 40,
        "w" * 64, "m" * 100, "the quick brown fox jumps over the lazy dog",
    ]
    lit = "[" + ",".join("'" + s + "'" for s in strs) + "]"
    got = con.execute(f"SELECT {xxh64_list_sql(lit)}").fetchone()[0]
    bad = 0
    for s, g in zip(strs, got):
        m = xxh64_signed(s)
        if m != g:
            bad += 1
            print("MISMATCH", repr(s), "sql", g, "model", m)
    print(f"{bad} mismatches of {len(strs)}")
    # corpus check: tokens of sampled sf0.01 documents
    toks = con.execute("""
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
    """).fetch_df()
    import random

    random.seed(7)
    sample = random.sample(list(toks.itertuples(index=False)), 40)
    total_bad = 0
    for row in sample:
        arr = list(row.t)
        lit = "[" + ",".join("'" + s.replace("'", "''") + "'" for s in arr) + "]"
        got = con.execute(f"SELECT {xxh64_list_sql(lit)}").fetchone()[0]
        for s, g in zip(arr, got):
            if xxh64_signed(s) != g:
                total_bad += 1
                print("DOC MISMATCH", repr(s))
    print(f"corpus sample: {total_bad} mismatches")
    sys.exit(1 if bad or total_bad else 0)
