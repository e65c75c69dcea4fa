"""DuckDB oracle-SQL builders for the hash-based pipeline operators.

These generate plain-SQL equivalents (for the driver's value-level
correctness gate) of the engine's xxhash64-based dedup/fingerprint ops:
Spark's xxhash64 (XXH64, seed 42) is reimplemented as a pure DuckDB
expression over HUGEINT arithmetic — validated bit-for-bit against Spark
itself via tools/xxh64_model.py + tools/xxh64_sql.py (this module embeds
the same generator). ASCII inputs only (byte == codepoint; true for the
testdata corpus by construction).

This is ORACLE code: the engine never executes it; it exists so that
minhash/simhash/fingerprint results are value-checkable rather than
rows-only.
"""

from __future__ import annotations

M = 1 << 64
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
SEED = 42
MERSENNE = (1 << 31) - 1


def _m(e: str) -> str:
    return f"(({e}) % {M})"


def _mul(a: str, b: int) -> str:
    """(a * b) % 2^64 without overflowing signed int128: split a into
    32-bit halves."""
    return (
        f"((((({a}) % 4294967296) * {b})"
        f" + (((({a}) // 4294967296) * {b}) % 4294967296) * 4294967296)"
        f" % {M})"
    )


def _rotl(e: str, r: int) -> str:
    # the shifted-out high bits and shifted-in low bits are disjoint -> '+'
    return _m(f"((({e}) * {1 << r}) % {M}) + (({e}) // {1 << (64 - r)})")


def _word(b: str, o: str, nbytes: int = 8) -> str:
    """little-endian word from 1-based byte list ``b``; ``o`` is the
    0-based offset of the word's first byte."""
    return "(" + " + ".join(
        f"({b})[({o}) + {k + 1}] * {1 << (8 * k)}" for k in range(nbytes)
    ) + ")"


def _round(acc: str, w: str) -> str:
    inner = _m(f"({acc}) + {_mul(w, P2)}")
    return _mul(_rotl(inner, 31), P1)


def xxh64_list_sql(list_expr: str) -> str:
    """list<varchar> -> list<bigint>: Spark-compatible xxhash64 of every
    element. The 32-byte stripe loop is a list_reduce; tails unrolled."""
    s1 = (
        f"list_transform({list_expr}, g -> struct_pack("
        f"n := length(g), "
        f"b := list_transform(generate_series(1, length(g)),"
        f" p -> CAST(ascii(substr(g, p, 1)) AS HUGEINT))))"
    )
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
    h_big = _m(
        " + ".join(_rotl(f"t.r.w{q}", r) for q, r in ((1, 1), (2, 7), (3, 12), (4, 18)))
    )
    for q in (1, 2, 3, 4):
        rq = _round("0", "t.r.w%d" % q)
        h_big = _m(_mul("xor(%s, %s)" % (h_big, rq), P1) + " + %d" % P4)
    s2 = (
        f"list_transform({s2a}, t -> struct_pack(n := t.n, b := t.b,"
        f" h := (CASE WHEN t.n >= 32 THEN {h_big}"
        f" ELSE CAST('{(SEED + P5) % M}' AS HUGEINT) END + t.n) % {M}))"
    )

    def step8(o: str) -> str:
        x = f"xor(t.h, {_round('0', _word('t.b', o))})"
        return _m(f"{_mul(_rotl(x, 27), P1)} + {P4}")

    for w in range(3):
        off = f"(32 * (t.n // 32) + {8 * w})"
        s2 = (
            f"list_transform({s2}, t -> struct_pack(n := t.n, b := t.b,"
            f" h := CASE WHEN (t.n % 32) // 8 >= {w + 1}"
            f" THEN {step8(off)} ELSE t.h END))"
        )
    i1 = "(t.n - (t.n % 8))"
    u32 = _word("t.b", i1, 4)
    h4 = _m(f"{_mul(_rotl(f'xor(t.h, {_mul(u32, P1)})', 23), P2)} + {P3}")
    s4 = (
        f"list_transform({s2}, t -> struct_pack(n := t.n, b := t.b,"
        f" h := CASE WHEN (t.n % 8) >= 4 THEN {h4} ELSE t.h END))"
    )
    i2 = "(t.n - (t.n % 4))"
    for w in range(3):
        hb = f"xor(t.h, {_mul(f't.b[{i2} + {w + 1}]', P5)})"
        stepb = _mul(_rotl(hb, 11), P1)
        s4 = (
            f"list_transform({s4}, t -> struct_pack(n := t.n, b := t.b,"
            f" h := CASE WHEN (t.n % 4) >= {w + 1} THEN {stepb} ELSE t.h END))"
        )
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


def _unsigned(h: str) -> str:
    """signed-int64 expr -> HUGEINT in [0, 2^64)."""
    return (
        f"(CASE WHEN ({h}) < 0 THEN CAST(({h}) AS HUGEINT) + {M}"
        f" ELSE CAST(({h}) AS HUGEINT) END)"
    )


def simhash_oracle_sql(max_doc_id: int = 500) -> str:
    """Mirror of pipeline.dedup.simhash: tokens -> xxhash64 -> 64 bit votes
    (+1/-1, bit set iff sum > 0). Output (key, simhash)."""
    toks = "regexp_split_to_array(trim(text), '\\s+')"
    sig_u = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN"
        f" ({_unsigned('h')} // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)) > 0"
        f" THEN CAST('{1 << b}' AS HUGEINT) ELSE 0 END)"
        for b in range(64)
    )
    signed = (
        f"CASE WHEN sig_u >= {1 << 63} THEN CAST(sig_u - {M} AS BIGINT)"
        f" ELSE CAST(sig_u AS BIGINT) END"
    )
    return f"""
        WITH d AS (
          SELECT doc_id AS key, {toks} AS toks
          FROM documents WHERE doc_id < {max_doc_id}
        ),
        h AS (SELECT key, {xxh64_list_sql('toks')} AS hs FROM d),
        s AS (SELECT key, ({sig_u}) AS sig_u FROM h)
        SELECT key, {signed} AS simhash FROM s ORDER BY key
    """


def simhash_candidates_oracle_sql(
    max_doc_id: int = 500, max_hamming: int = 6
) -> str:
    """Mirror of pipeline.dedup.simhash_candidates: the multi-table banded
    layout is guaranteed-COMPLETE for hamming <= k (block pigeonhole), and
    at oracle scale no bucket exceeds the cap, so the engine's banded join
    must equal the all-pairs hamming filter over the same signatures."""
    sig = simhash_oracle_sql(max_doc_id)
    return f"""
        WITH sig AS ({sig})
        SELECT a.key AS key_a, b.key AS key_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sig a JOIN sig b ON a.key < b.key
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
        ORDER BY key_a, key_b
    """


def fingerprint_sizes_oracle_sql(max_doc_id: int = 200, k: int = 7, window: int = 4) -> str:
    """Mirror of pipeline.text.fingerprint: k-gram rolling xxhash64 ->
    window minima -> distinct count. Output (doc_id, fp_size)."""
    toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    return f"""
        WITH d AS (
          SELECT doc_id, {toks} AS toks FROM documents
          WHERE doc_id < {max_doc_id}
        ),
        g AS (
          SELECT doc_id, greatest(len(toks) - {k - 1}, 0) AS ng,
                 list_transform(
                   generate_series(1, greatest(len(toks) - {k - 1}, 0)),
                   i -> array_to_string(list_slice(toks, i, i + {k - 1}), ' ')
                 ) AS gs
          FROM d
        ),
        h AS (SELECT doc_id, ng, {xxh64_list_sql('gs')} AS grams FROM g),
        w AS (
          SELECT doc_id, ng, grams, greatest(ng - {window - 1}, 0) AS nw,
                 list_transform(
                   generate_series(1, greatest(ng - {window - 1}, 0)),
                   i -> list_min(list_slice(grams, i, i + {window - 1}))
                 ) AS mins
          FROM h
        )
        SELECT doc_id,
               CAST(CASE WHEN nw > 0 THEN len(list_distinct(mins))
                         WHEN ng > 0 THEN len(list_distinct(grams))
                         ELSE 0 END AS INT) AS fp_size
        FROM w ORDER BY doc_id
    """


def minhash_groups_oracle_sql(
    max_doc_id: int = 500,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    rounds: int = 10,
) -> str:
    """Mirror of pipeline.dedup.minhash_dedup_groups: shingle xxhash64 ->
    64-perm MinHash -> 16-band LSH candidates -> est_jaccard filter ->
    min-label propagation. ``rounds`` equals the engine's max_iterations
    (10): the engine stops early only when labels are stable, so running
    the full fixed count yields identical labels. Output (key, group_key)."""
    import random

    rnd = random.Random(42)
    perms = []
    for _ in range(num_perm):
        a = rnd.randrange(1, MERSENNE)
        b = rnd.randrange(0, MERSENNE)
        perms.append((a, b))
    rows_per_band = num_perm // bands

    toks = "regexp_split_to_array(trim(text), '\\s+')"
    # NOTE: the engine's shingle_hashes fallback hashes the RAW text column
    # (dedup.py: otherwise(array(xxhash64(text_col)))), not the trimmed one.
    shingle_strs = (
        f"CASE WHEN len(toks) >= {shingle_n} THEN list_transform("
        f"generate_series(1, len(toks) - {shingle_n - 1}),"
        f" i -> array_to_string(list_slice(toks, i, i + {shingle_n - 1}), ' '))"
        f" ELSE [rawtext] END"
    )
    pm = f"(((s % {MERSENNE}) + {MERSENNE}) % {MERSENNE})"
    sig_elems = ", ".join(
        f"list_min(list_transform(sh, s -> ({a} * {pm} + {b}) % {MERSENNE}))"
        for a, b in perms
    )
    band_strs = ", ".join(
        "concat_ws(':', "
        + ", ".join(
            f"CAST(sig[{b * rows_per_band + r + 1}] AS VARCHAR)"
            for r in range(rows_per_band)
        )
        + ")"
        for b in range(bands)
    )
    # MATERIALIZED is load-bearing on every multiply-referenced CTE: each
    # propagation round reads the previous labels twice, so inlined CTEs
    # re-evaluate the whole upstream hash pipeline 2^rounds times.
    label_cte = """
        l0 AS MATERIALIZED (SELECT key, key AS label FROM keys)
    """
    prev = "l0"
    for t in range(rounds):
        label_cte += f""",
        l{t + 1} AS MATERIALIZED (
          SELECT k.key,
                 least(k.label, coalesce(min(n.label), k.label)) AS label
          FROM {prev} k
          LEFT JOIN edges e ON e.key_a = k.key
          LEFT JOIN {prev} n ON n.key = e.key_b
          GROUP BY k.key, k.label
        )
        """
        prev = f"l{t + 1}"
    return f"""
        WITH d AS (
          SELECT doc_id AS key, {toks} AS toks, text AS rawtext
          FROM documents WHERE doc_id < {max_doc_id}
        ),
        sh0 AS (SELECT key, {shingle_strs} AS gs FROM d),
        shh AS MATERIALIZED (SELECT key, {xxh64_list_sql('gs')} AS sh FROM sh0),
        sig AS MATERIALIZED (SELECT key, [{sig_elems}] AS sig FROM shh),
        bandstr AS (SELECT key, sig, [{band_strs}] AS bs FROM sig),
        bandh AS MATERIALIZED (
          SELECT key, sig, {xxh64_list_sql('bs')} AS bh FROM bandstr
        ),
        banded AS MATERIALIZED (
          SELECT key, sig, u.b AS band, bh[u.b] AS band_hash
          FROM bandh, generate_series(1, {bands}) AS u(b)
        ),
        pairs AS MATERIALIZED (
          SELECT DISTINCT a.key AS key_a, b.key AS key_b, a.sig AS sig_a, b.sig AS sig_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.band_hash = b.band_hash AND a.key < b.key
        ),
        accepted AS MATERIALIZED (
          SELECT key_a, key_b FROM pairs
          WHERE CAST(len(list_filter(list_zip(sig_a, sig_b),
                       p -> p[1] = p[2])) AS DOUBLE) / {num_perm} >= {threshold}
        ),
        edges AS MATERIALIZED (
          SELECT key_a, key_b FROM accepted
          UNION ALL SELECT key_b, key_a FROM accepted
        ),
        keys AS MATERIALIZED (SELECT key FROM d),
        {label_cte}
        SELECT key, label AS group_key FROM {prev} ORDER BY key
    """


def _hilbert_rounds(src: str, carry: list[str], prefix: str,
                    face: str = "face", i: str = "i", j: str = "j") -> tuple[str, str]:
    """CTE chain fragment encoding leaf (face, i, j) -> n (61-bit Hilbert
    position) via the 8 lookup rounds (cellid.go:416-438). Returns
    (cte_text_without_leading_comma, final_cte_name); the final CTE carries
    ``carry`` + i/j + n. biased leaf id = 2*(n - 2^62) + 1."""
    from ..kernels import hilbert as H

    lookup = "[" + ",".join(str(int(v)) for v in H.LOOKUP_POS) + "]"
    carry_sql = ", ".join(carry)
    text = (
        f"{prefix}8 AS (SELECT {carry_sql}, {i} AS hi, {j} AS hj,"
        f" (CAST({face} AS BIGINT) * {1 << (H.POS_BITS - 1)}) AS n,"
        f" (CAST({face} AS BIGINT) & 1) AS bits FROM {src})"
    )
    prev = f"{prefix}8"
    for k in range(7, -1, -1):
        key = (
            f"(bits + ((hi >> {k * 4}) & 15) * 64 + ((hj >> {k * 4}) & 15) * 4)"
        )
        text += (
            f", {prefix}{k} AS (SELECT {carry_sql}, hi, hj,"
            f" (n | ((CAST(({lookup})[{key} + 1] AS BIGINT) >> 2)"
            f" * {1 << (k * 8)})) AS n,"
            f" (CAST(({lookup})[{key} + 1] AS BIGINT) & 3) AS bits"
            f" FROM {prev})"
        )
        prev = f"{prefix}{k}"
    return text, prev


def _biased_leaf(n: str = "n") -> str:
    """biased(2n+1) as signed BIGINT == 2*(n - 2^62) + 1 for valid n."""
    return f"(2 * (({n}) - 4611686018427387904) + 1)"


def _token(cell: str) -> str:
    """biased signed id -> gos2 hex token (cellid.go:100-108)."""
    return (
        f"rtrim(lower(lpad(to_hex(xor({cell},"
        f" (-9223372036854775807 - 1))), 16, '0')), '0')"
    )


def edge_neighbors_l8_oracle_sql(points_cte: str, level: int = 8) -> str:
    """Oracle for the EdgeNeighbors op (cellid.go:210-220) at ``level``:
    4 edge-adjacent same-level cells per distinct occupied cell.
    Output (token, nbr_token); see edge_neighbors_cte_sql for the body."""
    return f"""
        WITH {edge_neighbors_cte_sql(points_cte, level)}
        SELECT {_token('cell_l')} AS token, {_token('nbr')} AS nbr_token
        FROM nb_all ORDER BY token, nbr_token
    """


def edge_neighbors_cte_sql(points_cte: str, level: int = 8) -> str:
    """Composable WITH-body ending in ``nb_all(cell_l, nbr)`` — the 4
    edge-adjacent level-L cells of every distinct occupied level-L cell.

    Works from each point's own leaf (face,i,j) — any leaf inside a cell
    yields the same level-L neighbors after the final parent-at-L, so no
    inverse-Hilbert decode is needed. In-range offsets re-encode on the
    same face; out-of-range offsets go through the exact
    cellIDFromFaceIJWrap float path (uv projection -> xyz -> new face/uv
    -> st -> ij, cellid.go:440-469)."""
    size = 1 << (30 - level)
    lsb = 1 << (2 * (30 - level))
    parent = lambda c: f"(({c}) & -{lsb}) | {lsb}"  # noqa: E731
    offs = [("0", f"-{size}"), (f"{size}", "0"), ("0", f"{size}"), (f"-{size}", "0")]

    # distinct occupied level-L cells with one representative leaf:
    # min(i), min(j) is the corner leaf of the cell's ij square.
    base = f"""
        nb_base AS MATERIALIZED (
          SELECT {parent('cell_id')} AS cell_l, min(face) AS face,
                 min(i) AS i, min(j) AS j
          FROM cells GROUP BY 1
        )
    """
    pieces = [base]
    unions = []
    for idx, (di, dj) in enumerate(offs):
        cand = f"""
        nb_c{idx} AS (
          SELECT cell_l, face, (i + {di}) AS ni, (j + {dj}) AS nj
          FROM nb_base
        ),
        nb_s{idx} AS (
          SELECT cell_l, face, ni, nj,
                 (ni >= 0 AND ni < {1 << 30} AND nj >= 0 AND nj < {1 << 30})
                   AS same
          FROM nb_c{idx}
        )"""
        # same-face branch
        same_rounds, same_final = _hilbert_rounds(
            f"(SELECT * FROM nb_s{idx} WHERE same)", ["cell_l"],
            f"nb_e{idx}_", face="face", i="ni", j="nj",
        )
        # wrap branch: clip, uv, xyz, new face/uv, st, ij, encode
        wrap = f"""
        nb_w{idx} AS (
          SELECT cell_l,
                 face AS oface,
                 greatest(-1, least({1 << 30}, ni)) AS ci,
                 greatest(-1, least({1 << 30}, nj)) AS cj
          FROM nb_s{idx} WHERE NOT same
        ),
        nb_wu{idx} AS (
          SELECT cell_l, oface,
            greatest(-{1.0000000000000002!r}, least({1.0000000000000002!r},
              {1.0 / (1 << 30)!r} * CAST(2 * ci + 1 - {1 << 30} AS DOUBLE))) AS u,
            greatest(-{1.0000000000000002!r}, least({1.0000000000000002!r},
              {1.0 / (1 << 30)!r} * CAST(2 * cj + 1 - {1 << 30} AS DOUBLE))) AS v
          FROM nb_w{idx}
        ),
        nb_wx{idx} AS (
          SELECT cell_l,
            CASE oface WHEN 0 THEN 1.0 WHEN 1 THEN -u WHEN 2 THEN -u
                       WHEN 3 THEN -1.0 WHEN 4 THEN v ELSE v END AS x,
            CASE oface WHEN 0 THEN u WHEN 1 THEN 1.0 WHEN 2 THEN -v
                       WHEN 3 THEN -v WHEN 4 THEN -1.0 ELSE u END AS y,
            CASE oface WHEN 0 THEN v WHEN 1 THEN v WHEN 2 THEN 1.0
                       WHEN 3 THEN -u WHEN 4 THEN -u ELSE -1.0 END AS z
          FROM nb_wu{idx}
        ),
        nb_wf{idx} AS (
          SELECT cell_l, x, y, z,
                 CASE WHEN abs(z) > greatest(abs(x), abs(y)) THEN 2
                      WHEN abs(y) > abs(x) THEN 1 ELSE 0 END AS fid
          FROM nb_wx{idx}
        ),
        nb_wg{idx} AS (
          SELECT cell_l, x, y, z,
                 CASE WHEN (CASE WHEN fid = 2 THEN z WHEN fid = 1 THEN y
                            ELSE x END) < 0 THEN fid + 3 ELSE fid END AS face
          FROM nb_wf{idx}
        ),
        nb_wv{idx} AS (
          SELECT cell_l, face,
            CASE face WHEN 0 THEN y / x WHEN 1 THEN -x / y WHEN 2 THEN -x / z
                      WHEN 3 THEN z / x WHEN 4 THEN z / y ELSE -y / z END AS nu,
            CASE face WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN -y / z
                      WHEN 3 THEN y / x WHEN 4 THEN -x / y ELSE -x / z END AS nv
          FROM nb_wg{idx}
        ),
        nb_wij{idx} AS (
          SELECT cell_l, face,
            CAST(greatest(0, least({(1 << 30) - 1},
              floor({float(1 << 30)!r} * (0.5 * (nu + 1.0))))) AS BIGINT) AS wi,
            CAST(greatest(0, least({(1 << 30) - 1},
              floor({float(1 << 30)!r} * (0.5 * (nv + 1.0))))) AS BIGINT) AS wj
          FROM nb_wv{idx}
        )"""
        wrap_rounds, wrap_final = _hilbert_rounds(
            f"nb_wij{idx}", ["cell_l"], f"nb_x{idx}_",
            face="face", i="wi", j="wj",
        )
        pieces.append(cand)
        pieces.append(same_rounds)
        pieces.append(wrap)
        pieces.append(wrap_rounds)
        unions.append(
            f"SELECT cell_l, {parent(_biased_leaf())} AS nbr FROM {same_final}"
        )
        unions.append(
            f"SELECT cell_l, {parent(_biased_leaf())} AS nbr FROM {wrap_final}"
        )
    all_cte = ",\n".join(pieces)
    return f"""{points_cte},
        {all_cte},
        nb_all AS ({" UNION ALL ".join(unions)})
    """


def ann_lsh_oracle_sql(
    dim: int = 64, k: int = 10, num_planes: int = 16, bands: int = 8,
    seed: int = 42,
) -> str:
    """Oracle for the LSH-banded ANN query (pipeline.similarity.lsh_topk):
    the hyperplanes depend only on (dim, num_planes, seed), so they are
    embedded as float64 literals; signatures, band buckets, the any-band
    candidate join, and the exact cosine rerank are all plain SQL.

    The engine computes dots with a numpy GEMM while SQL sums
    sequentially — a sign could differ only for |dot| ~ 1e-16 (never
    observed; validated empirically at sf0.01 and sf0.1)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    H = rng.normal(size=(num_planes, dim))
    H = H / np.linalg.norm(H, axis=1, keepdims=True)
    bits_per_band = num_planes // bands

    def dot(vec: str, row: int) -> str:
        lits = "[" + ",".join(repr(float(v)) for v in H[row]) + "]"
        return (
            f"list_sum(list_transform(list_zip({vec}, {lits}),"
            f" p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )

    def sig(vec: str) -> str:
        return "(" + " + ".join(
            f"(CASE WHEN {dot(vec, i)} > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(num_planes)
        ) + ")"

    band_cols = ", ".join(
        f"((sig >> {b * bits_per_band}) & {(1 << bits_per_band) - 1}) AS band_{b}"
        for b in range(bands)
    )
    any_band = " OR ".join(f"d.band_{b} = q.band_{b}" for b in range(bands))
    norm = (
        "list_transform({v}, x -> CAST(x AS DOUBLE) / greatest(sqrt("
        "list_sum(list_transform({v}, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)"
        "))), 1e-12))"
    )
    cos = (
        f"list_sum(list_transform(list_zip({norm.format(v='d.emb')},"
        f" {norm.format(v='q.emb')}), p -> p[1] * p[2]))"
    )
    return f"""
        WITH ds AS MATERIALIZED (
          SELECT vec_id AS key, embedding AS emb,
                 {sig('embedding')} AS sig
          FROM embeddings WHERE vec_id > 1
        ),
        d AS MATERIALIZED (SELECT key, emb, {band_cols} FROM ds),
        qs AS MATERIALIZED (
          SELECT CASE vec_id WHEN 0 THEN 'q0' ELSE 'q1' END AS qid,
                 embedding AS emb, {sig('embedding')} AS sig
          FROM embeddings WHERE vec_id IN (0, 1)
        ),
        q AS MATERIALIZED (SELECT qid, emb, {band_cols} FROM qs),
        cand AS MATERIALIZED (
          SELECT DISTINCT q.qid, d.key, {cos} AS score
          FROM d JOIN q ON {any_band}
        ),
        ranked AS (
          SELECT qid, key,
                 CAST(row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, key ASC
                 ) AS INT) AS rank,
                 round(score, 6) AS score
          FROM cand
        )
        SELECT qid, key, rank, score FROM ranked
        WHERE rank <= {k} ORDER BY qid, rank
    """


def ann_ivf_oracle_sql(
    dim: int = 64, k: int = 10, num_centroids: int = 16, nprobe: int = 8,
    seed: int = 7,
) -> str:
    """Oracle for the IVF ANN query (pipeline.similarity.ivf_topk with the
    ``ivf_fixed_centroids`` quantizer): centroids are a pure function of
    (dim, num_centroids, seed), embedded as float64 literals; list
    assignment (argmax of centroid dots, ties to the lowest index — the
    np.argmax convention), per-query nprobe probe selection, the
    probed-list candidate join, and the exact cosine rerank are all plain
    SQL.

    Engine/SQL float caveat is the same as the LSH oracle: the engine
    normalizes data rows before the assignment GEMM while SQL uses raw
    dots (argmax is invariant under the row's positive rescale), and dots
    are summed in different orders — an assignment or rank could flip only
    for scores equal to ~1e-15 (never observed; validated empirically at
    sf0.01 and sf0.1)."""
    import numpy as np

    from .similarity import ivf_fixed_centroids

    C = ivf_fixed_centroids(dim, num_centroids, seed)

    def dot(vec: str, row: np.ndarray) -> str:
        lits = "[" + ",".join(repr(float(v)) for v in row) + "]"
        return (
            f"list_sum(list_transform(list_zip({vec}, {lits}),"
            f" p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )

    s_cols = ", ".join(f"{dot('embedding', C[c])} AS s_{c}"
                       for c in range(num_centroids))
    best = "greatest(" + ", ".join(f"s_{c}" for c in range(num_centroids)) + ")"
    argmax = "CASE " + " ".join(
        f"WHEN s_{c} = best THEN {c}" for c in range(num_centroids)
    ) + " END"
    probe_scores = " UNION ALL ".join(
        f"SELECT qid, {c} AS list_id, s_{c} AS s FROM qsig"
        for c in range(num_centroids)
    )
    norm = (
        "list_transform({v}, x -> CAST(x AS DOUBLE) / greatest(sqrt("
        "list_sum(list_transform({v}, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)"
        "))), 1e-12))"
    )
    cos = (
        f"list_sum(list_transform(list_zip({norm.format(v='d.emb')},"
        f" {norm.format(v='q.emb')}), p -> p[1] * p[2]))"
    )
    return f"""
        WITH dsig AS MATERIALIZED (
          SELECT vec_id AS key, embedding AS emb, {s_cols}
          FROM embeddings WHERE vec_id > 1
        ),
        d AS MATERIALIZED (
          SELECT key, emb, {argmax.replace('best', f'({best})')} AS list_id
          FROM dsig
        ),
        qsig AS MATERIALIZED (
          SELECT CASE vec_id WHEN 0 THEN 'q0' ELSE 'q1' END AS qid,
                 embedding AS emb, {s_cols}
          FROM embeddings WHERE vec_id IN (0, 1)
        ),
        probes AS (
          SELECT qid, list_id FROM (
            SELECT qid, list_id,
                   row_number() OVER (
                     PARTITION BY qid ORDER BY s DESC, list_id ASC
                   ) AS pr
            FROM ({probe_scores})
          ) WHERE pr <= {nprobe}
        ),
        q AS (SELECT qid, emb FROM qsig),
        cand AS MATERIALIZED (
          SELECT q.qid, d.key, {cos} AS score
          FROM d
          JOIN probes p ON p.list_id = d.list_id
          JOIN q ON q.qid = p.qid
        ),
        ranked AS (
          SELECT qid, key,
                 CAST(row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, key ASC
                 ) AS INT) AS rank,
                 round(score, 6) AS score
          FROM cand
        )
        SELECT qid, key, rank, score FROM ranked
        WHERE rank <= {k} ORDER BY qid, rank
    """


def bloom_gate_oracle_sql(m: int = 2048, g: int = 3) -> str:
    """Mirror of pipeline.bloom bloom_build + bloom_probe over documents:
    previous crawl = even doc_ids, probed with the full table. Replays the
    exact bit algebra — xxhash64(url) / xxhash64(url || '#2') via the SQL
    XXH64 model, Kirsch-Mitzenmacher positions, 63-bit words, bit_or build,
    bool_and probe — so the per-group counts (including the deterministic
    false-positive count among new keys) must match bit-for-bit."""

    def pm(h: str) -> str:
        return f"(((({h}) % {m}) + {m}) % {m})"

    hashes = xxh64_list_sql("[url, url || '#2']")
    return f"""
        WITH k AS (
          SELECT doc_id,
                 source || '/' || CAST(doc_id AS VARCHAR) AS url,
                 doc_id % 2 = 0 AS is_old
          FROM documents
        ),
        h AS (
          SELECT doc_id, is_old, ({hashes}) AS hs FROM k
        ),
        hm AS (
          SELECT doc_id, is_old, {pm('hs[1]')} AS h1, {pm('hs[2]')} AS h2
          FROM h
        ),
        ps AS (
          SELECT doc_id, is_old, (h1 + i * h2) % {m} AS pos
          FROM hm, (SELECT unnest(generate_series(0, {g - 1})) AS i)
        ),
        words AS (
          SELECT pos // 63 AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS word
          FROM (SELECT DISTINCT pos FROM ps WHERE is_old)
          GROUP BY 1
        ),
        probe AS (
          SELECT p.doc_id, p.is_old,
                 bool_and(coalesce(
                     (w.word & (CAST(1 AS BIGINT)
                                << CAST(p.pos % 63 AS INT))) <> 0,
                     false)) AS maybe_seen
          FROM ps p LEFT JOIN words w ON p.pos // 63 = w.word_idx
          GROUP BY 1, 2
        )
        SELECT is_old, maybe_seen,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(doc_id) AS BIGINT) AS key_sum
        FROM probe GROUP BY 1, 2 ORDER BY 1, 2
    """


def contamination_oracle_sql(n: int = 5, bench_mod: int = 37) -> str:
    """Mirror of pipeline.contamination.ngram_contamination with the
    benchmark = documents where doc_id % bench_mod = 0, aggregated per
    lang. Plain-string n-grams, so the replay is literal SQL."""
    return f"""
        WITH toks AS (
          SELECT doc_id, lang,
                 regexp_split_to_array(trim(text), '\\s+') AS tk
          FROM documents
        ),
        g AS (
          SELECT doc_id, lang,
                 CASE WHEN len(tk) >= {n}
                      THEN list_distinct(list_transform(
                               generate_series(1, len(tk) - {n - 1}),
                               i -> array_to_string(tk[i:i + {n - 1}], ' ')))
                      ELSE [] END AS grams
          FROM toks
        ),
        bg AS (
          SELECT DISTINCT unnest(grams) AS gram FROM g
          WHERE doc_id % {bench_mod} = 0
        ),
        cg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
        per AS (
          SELECT c.doc_id, count(*) AS n_ngrams, count(b.gram) AS n_hit
          FROM cg c LEFT JOIN bg b USING (gram) GROUP BY 1
        ),
        fl AS (
          SELECT g.lang,
                 coalesce(p.n_ngrams, 0) AS n_ngrams,
                 coalesce(p.n_hit, 0) AS n_hit
          FROM g LEFT JOIN per p USING (doc_id)
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated_docs,
               CAST(sum(n_hit) AS BIGINT) AS total_hit_ngrams,
               CAST(sum(n_ngrams) AS BIGINT) AS total_ngrams
        FROM fl GROUP BY lang ORDER BY lang
    """


def classifier_scores_cte_sql(n_features: int = 4096) -> str:
    """Composable WITH-body ending in ``s(doc_id, lang, n_tok, score)`` —
    per-document hashed-linear scores with the engine's exact sequential
    fold order. Shared by the per-lang rollup oracle and downstream
    calibration oracles."""
    hashes = xxh64_list_sql("tk")
    w = (
        f"((((((h % {n_features}) + {n_features}) % {n_features})"
        f" * 2654435761) % 1000) / 999.0 - 0.5)"
    )
    return f"""
        toks AS (
          SELECT doc_id, lang, trim(text) AS ttext,
                 regexp_split_to_array(trim(text), '\\s+') AS tk
          FROM documents
        ),
        h AS (SELECT doc_id, lang,
                     CASE WHEN ttext = '' THEN 0
                          ELSE len(tk) END AS n_tok,
                     ({hashes}) AS hs FROM toks),
        s AS (
          SELECT doc_id, lang, n_tok,
                 CASE WHEN n_tok > 0 THEN
                   list_reduce(
                     list_prepend(CAST(0 AS DOUBLE),
                       list_transform(hs, h -> CAST({w} AS DOUBLE))),
                     (a, x) -> a + x) / n_tok
                 ELSE 0.0 END AS score
          FROM h
        )
    """


def classifier_oracle_sql(n_features: int = 4096) -> str:
    """Mirror of pipeline.classify.hashed_linear_score aggregated per lang.
    Replays xxhash64 token hashing (SQL XXH64 model), pmod bucketing, the
    closed-form weight, and the engine's exact SEQUENTIAL fold order
    (list_reduce, matching Spark's F.aggregate) so the keep flag's
    score > 0 knife-edge cannot drift."""
    return f"""
        WITH {classifier_scores_cte_sql(n_features)}
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               round(avg(score), 6) AS avg_score
        FROM s GROUP BY lang ORDER BY lang
    """


def pagerank_oracle_sql(iterations: int = 3, damping: float = 0.85) -> str:
    """Mirror of pipeline.graph.pagerank over the synthetic customer-key
    domain graph (src = c_custkey % 64, dst = (c_custkey*7+3) % 64; every
    node has out-edges so dangling mass is zero by construction). The
    fixed iteration count unrolls into chained CTEs."""
    d = damping
    sql = """
        WITH e AS (
          SELECT DISTINCT c_custkey % 64 AS src,
                          (c_custkey * 7 + 3) % 64 AS dst
          FROM customer
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
        w AS (
          SELECT e.src, e.dst, CAST(1 AS DOUBLE) / deg.out_deg AS w
          FROM e JOIN deg USING (src)
        ),
        r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank
               FROM nodes, nn)
    """
    prev = "r0"
    for i in range(1, iterations + 1):
        sql += f""",
        c{i} AS (
          SELECT w.dst, sum({prev}.rank * w.w) AS contrib
          FROM w JOIN {prev} ON w.src = {prev}.node GROUP BY 1
        ),
        r{i} AS (
          SELECT nodes.node,
                 (1.0 - {d}) / nn.n
                   + {d} * coalesce(c{i}.contrib, 0.0) AS rank
          FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.dst, nn
        )
    """
        prev = f"r{i}"
    sql += f"""
        SELECT node, round(rank, 9) AS rank FROM {prev} ORDER BY node
    """
    return sql


def dup_span_oracle_sql(k: int = 8) -> str:
    """Mirror of pipeline.spans.duplicated_span_coverage aggregated per
    lang: same xxhash64 span keys (SQL XXH64 model over the space-joined
    k-token windows), same count(*)>1 duplication rule, same sorted-
    position interval-union fold |union| = k + sum(min(k, gap))."""
    return f"""
        WITH toks AS (
          SELECT doc_id, lang, trim(text) AS ttext,
                 regexp_split_to_array(trim(text), '\\s+') AS tk
          FROM documents
        ),
        g AS (
          SELECT doc_id, lang,
                 CASE WHEN ttext = '' THEN 0 ELSE len(tk) END AS n_tok,
                 CASE WHEN ttext != '' AND len(tk) >= {k}
                      THEN list_transform(
                               generate_series(1, len(tk) - {k - 1}),
                               i -> array_to_string(tk[i:i + {k - 1}], ' '))
                      ELSE [] END AS grams
          FROM toks
        ),
        h AS (SELECT doc_id, lang, n_tok, len(grams) AS n_spans,
                     ({xxh64_list_sql('grams')}) AS ghs FROM g),
        occ AS (
          SELECT doc_id, unnest(ghs) AS gh,
                 unnest(generate_series(1, len(ghs))) AS pos
          FROM h
        ),
        dup AS (SELECT gh FROM occ GROUP BY gh HAVING count(*) > 1),
        docc AS (
          SELECT o.doc_id, list_sort(list(o.pos)) AS ps,
                 count(*) AS n_dup_spans
          FROM occ o JOIN dup USING (gh) GROUP BY 1
        ),
        cov AS (
          SELECT doc_id, n_dup_spans,
                 {k} + coalesce(list_sum(list_transform(
                     generate_series(2, len(ps)),
                     j -> least({k}, ps[j] - ps[j - 1]))), 0) AS dup_tokens
          FROM docc
        ),
        fl AS (
          SELECT h.lang, h.n_tok, h.n_spans,
                 coalesce(cov.n_dup_spans, 0) AS n_dup_spans,
                 coalesce(cov.dup_tokens, 0) AS dup_tokens
          FROM h LEFT JOIN cov USING (doc_id)
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               CAST(sum(n_spans) AS BIGINT) AS total_spans,
               CAST(sum(n_dup_spans) AS BIGINT) AS total_dup_spans,
               CAST(sum(dup_tokens) AS BIGINT) AS total_dup_tokens,
               CAST(sum(CASE WHEN dup_tokens > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS docs_with_dups,
               round(CAST(sum(dup_tokens) AS DOUBLE)
                     / CAST(sum(n_tok) AS DOUBLE), 9) AS dup_token_frac
        FROM fl GROUP BY lang ORDER BY lang
    """


def minhash_audit_oracle_sql(kind: str, max_doc_id: int = 500,
                             num_perm: int = 64, bands: int = 16,
                             shingle_n: int = 5) -> str:
    """Oracles for the MinHash audit pair: same shingle/signature/band
    construction as minhash_groups_oracle_sql through ``pairs``, plus
    exact shingle-set Jaccard via a distinct-shingle self-join.
    kind='fidelity' -> per-candidate (est_j, exact_j, abs_err);
    kind='recall' -> one-row recall/precision at exact-J >= 0.5."""
    import random

    rnd = random.Random(42)
    perms = []
    for _ in range(num_perm):
        a = rnd.randrange(1, MERSENNE)
        b = rnd.randrange(0, MERSENNE)
        perms.append((a, b))
    rows_per_band = num_perm // bands
    toks = "regexp_split_to_array(trim(text), '\\s+')"
    shingle_strs = (
        f"CASE WHEN len(toks) >= {shingle_n} THEN list_transform("
        f"generate_series(1, len(toks) - {shingle_n - 1}),"
        f" i -> array_to_string(list_slice(toks, i, i + {shingle_n - 1}), ' '))"
        f" ELSE [rawtext] END"
    )
    pm = f"(((s % {MERSENNE}) + {MERSENNE}) % {MERSENNE})"
    sig_elems = ", ".join(
        f"list_min(list_transform(sh, s -> ({a} * {pm} + {b}) % {MERSENNE}))"
        for a, b in perms
    )
    band_strs = ", ".join(
        "concat_ws(':', "
        + ", ".join(
            f"CAST(sig[{b * rows_per_band + r + 1}] AS VARCHAR)"
            for r in range(rows_per_band)
        )
        + ")"
        for b in range(bands)
    )
    base = f"""
        WITH d AS (
          SELECT doc_id AS key, {toks} AS toks, text AS rawtext
          FROM documents WHERE doc_id < {max_doc_id}
        ),
        sh0 AS (SELECT key, {shingle_strs} AS gs FROM d),
        shh AS MATERIALIZED (SELECT key, {xxh64_list_sql('gs')} AS sh FROM sh0),
        sig AS MATERIALIZED (SELECT key, [{sig_elems}] AS sig FROM shh),
        bandstr AS (SELECT key, sig, [{band_strs}] AS bs FROM sig),
        bandh AS MATERIALIZED (
          SELECT key, sig, {xxh64_list_sql('bs')} AS bh FROM bandstr
        ),
        banded AS MATERIALIZED (
          SELECT key, sig, u.b AS band, bh[u.b] AS band_hash
          FROM bandh, generate_series(1, {bands}) AS u(b)
        ),
        pairs AS MATERIALIZED (
          SELECT DISTINCT a.key AS key_a, b.key AS key_b,
                 a.sig AS sig_a, b.sig AS sig_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.band_hash = b.band_hash
               AND a.key < b.key
        ),
        est AS (
          SELECT key_a, key_b,
                 CAST(len(list_filter(list_zip(sig_a, sig_b),
                      p -> p[1] = p[2])) AS DOUBLE) / {num_perm} AS est_j
          FROM pairs
        ),
        shd AS MATERIALIZED (
          SELECT DISTINCT key, u.s AS s FROM shh, unnest(sh) AS u(s)
        ),
        sizes AS (SELECT key, count(*) AS n_sh FROM shd GROUP BY 1),
        inter AS MATERIALIZED (
          SELECT a.key AS key_a, b.key AS key_b, count(*) AS n_inter
          FROM shd a JOIN shd b ON a.s = b.s AND a.key < b.key
          GROUP BY 1, 2
        ),
        exact AS MATERIALIZED (
          SELECT i.key_a, i.key_b,
                 CAST(i.n_inter AS DOUBLE)
                   / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) AS exact_j
          FROM inter i
          JOIN sizes sa ON sa.key = i.key_a
          JOIN sizes sb ON sb.key = i.key_b
        )
    """
    if kind == "fidelity":
        return base + """
        SELECT e.key_a, e.key_b,
               round(e.est_j, 9) AS est_j,
               round(coalesce(x.exact_j, 0.0), 9) AS exact_j,
               round(abs(e.est_j - coalesce(x.exact_j, 0.0)), 9) AS abs_err
        FROM est e LEFT JOIN exact x
          ON x.key_a = e.key_a AND x.key_b = e.key_b
        ORDER BY e.key_a, e.key_b
        """
    return base + """
        , truth AS (SELECT key_a, key_b FROM exact WHERE exact_j >= 0.5),
        hits AS (
          SELECT count(*) AS n FROM truth t
          JOIN est e ON e.key_a = t.key_a AND e.key_b = t.key_b
        ),
        stats AS (
          SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true_pairs,
                 CAST((SELECT count(*) FROM est) AS BIGINT) AS n_candidates,
                 CAST((SELECT n FROM hits) AS BIGINT) AS n_hits
        )
        SELECT n_true_pairs, n_candidates, n_hits,
               round(CASE WHEN n_true_pairs > 0
                          THEN CAST(n_hits AS DOUBLE)
                               / CAST(n_true_pairs AS DOUBLE)
                          ELSE 1.0 END, 9) AS recall,
               round(CASE WHEN n_candidates > 0
                          THEN CAST(n_hits AS DOUBLE)
                               / CAST(n_candidates AS DOUBLE)
                          ELSE 1.0 END, 9) AS precision
        FROM stats
        """
