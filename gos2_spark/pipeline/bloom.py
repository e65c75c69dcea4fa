"""Distributed Bloom filter for crawl-delta gating: a compact has-this-url-
been-seen set built from a previous crawl, probed by the next one BEFORE any
expensive dedup join runs. False positives are possible (and deterministic);
false negatives are not — so the gate can only over-route to the exact
dedup path, never lose a new document.

Everything is exact integer algebra on ``xxhash64`` (seed 42, Spark's
built-in), reproducible bit-for-bit in DuckDB via the SQL model in
``tools/xxh64_sql.py`` — the driver oracle replays the whole build+probe.

Scale shape:

* the filter is a DATAFRAME, not a driver-side bitset: rows are
  (word_idx, word) with at most ``m / 63`` rows, partitioned by word_idx —
  a 10^12-bit filter is ~2 GB spread over the cluster, never on the driver;
* build: explode g positions per key -> distinct -> one ``bit_or`` groupBy
  (map-side combined);
* probe: g-row explode per key joined on word_idx (broadcast when the
  filter is small, shuffle-on-word_idx at full scale) -> ``bool_and`` per
  key. Two narrow shuffles total, no Python anywhere.

63 bits per word, not 64: the sign bit stays clear so ``1 << bit`` is
portable across engines (DuckDB raises on BIGINT ``<< 63``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 63


def bloom_positions(key: Column, m: int, g: int) -> Column:
    """g bit positions in [0, m) via Kirsch-Mitzenmacher double hashing:
    pos_i = (h1 + i*h2) mod m with h1 = xxhash64(key), h2 = xxhash64(key
    || '#2'). Both h's are reduced mod m first so ``h1 + i*h2`` never
    overflows int64 (requires g * m < 2^63 — true for any real filter)."""
    h1 = F.pmod(F.xxhash64(key), F.lit(m))
    h2 = F.pmod(F.xxhash64(F.concat(key, F.lit("#2"))), F.lit(m))
    return F.transform(
        F.sequence(F.lit(0), F.lit(g - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(m)),
    )


def _word_idx(pos: Column) -> Column:
    return F.floor(pos / WORD_BITS).cast("long")


def _mask(pos: Column) -> Column:
    # call_function: pyspark's F.shiftleft only accepts a literal int for
    # numBits, but SQL shiftleft takes a column (PySpark >= 3.5).
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(WORD_BITS)).cast("int")
    )


def bloom_build(df: DataFrame, key_col: str, m: int, g: int) -> DataFrame:
    """Build the (word_idx, word) filter table from ``df[key_col]``."""
    pos = (
        df.select(
            F.explode(bloom_positions(F.col(key_col), m, g)).alias("pos")
        )
        .distinct()
    )
    return (
        pos.groupBy(_word_idx(F.col("pos")).alias("word_idx"))
        .agg(F.bit_or(_mask(F.col("pos"))).alias("word"))
    )


def bloom_probe_flat(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m: int,
    g: int,
) -> DataFrame:
    """Stateless probe: ``df`` + a ``maybe_seen`` column, via ``g``
    successive BROADCAST left joins (one per bit position) instead of
    explode + groupBy. Identical result to ``bloom_probe``; because there
    is no aggregation it also works unchanged on a STREAMING ``df`` —
    stream-static joins need no state or watermark, so the crawl-delta
    gate runs in plain append mode at ingest.

    Requires the filter to fit a broadcast (~2 bytes/bit budget: a 10^9-bit
    filter is ~130 MB of words — fine; for 10^12-bit filters use the
    shuffling ``bloom_probe``)."""
    pos = bloom_positions(F.col(key_col), m, g)
    out = df.withColumn("_bloom_pos", pos)
    hits = []
    for i in range(g):
        p = F.element_at(F.col("_bloom_pos"), i + 1)
        b = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(f"_wi{i}"),
                F.col("word").alias(f"_w{i}"),
            )
        )
        out = out.join(b, _word_idx(p) == F.col(f"_wi{i}"), "left")
        hits.append(
            F.coalesce(F.col(f"_w{i}").bitwiseAND(_mask(p)) != 0, F.lit(False))
        )
    seen = hits[0]
    for h in hits[1:]:
        seen = seen & h
    drop = ["_bloom_pos"] + [f"_wi{i}" for i in range(g)] + [
        f"_w{i}" for i in range(g)
    ]
    return out.withColumn("maybe_seen", seen).drop(*drop)


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m: int,
    g: int,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(key, carry..., maybe_seen) per input row: maybe_seen is true iff
    ALL g bits are set — guaranteed true for every key the filter was
    built from (no false negatives)."""
    pos = df.select(
        F.col(key_col),
        *[F.col(c) for c in carry_cols],
        F.explode(bloom_positions(F.col(key_col), m, g)).alias("pos"),
    ).withColumn("word_idx", _word_idx(F.col("pos")))
    hit = F.coalesce(
        F.col("word").bitwiseAND(_mask(F.col("pos"))) != 0, F.lit(False)
    )
    return (
        pos.join(bloom, "word_idx", "left")
        .groupBy(key_col, *carry_cols)
        .agg(F.bool_and(hit).alias("maybe_seen"))
    )
