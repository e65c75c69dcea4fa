"""Deduplication at training-data scale: exact, MinHash-LSH, SimHash, Jaccard.

Design rules for 100-TB inputs:
- shingling/hashing stays NATIVE (xxhash64, transform, aggregate — all
  codegen; strings never cross the Python channel);
- candidate generation is banded LSH: equality joins on (band, band_hash)
  keys — plain hash shuffles, no pairwise blowup outside buckets;
- verification (Jaccard / Hamming) runs only on bucket-collision pairs;
- duplicate-group resolution is iterative min-label propagation (no
  driver-side union-find over billions of edges).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 31-bit Mersenne prime: keeps a*s + b under 2^62 (ANSI-safe int64 math)
_MERSENNE = (1 << 31) - 1


def exact_dedup(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep the smallest key per identical text (md5 grouping).

    Returns (keep_id, dup_count, content_hash).
    """
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min(key_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def shingle_hashes(text_col, n: int = 5):
    """Word n-gram shingles -> array<long> hashes, fully native.

    tokens -> sliding n-grams via transform over an index sequence ->
    xxhash64 of each joined n-gram. Codegen end to end.
    """
    toks = F.split(F.trim(text_col), r"\s+")
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - 1)
    return F.when(
        count > 0,
        F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n)))),
    ).otherwise(F.array(F.xxhash64(text_col)))


def minhash_signature(shingles_col, num_perm: int = 64, seed: int = 42):
    """num_perm MinHash values via (a*s + b) mod p over the shingle array.

    One array_min(transform(...)) per permutation — native, no UDF. The
    (a, b) constants are derived deterministically from the seed.
    """
    import random

    rnd = random.Random(seed)

    def perm_fn(a: int, b: int):
        def apply(s):
            return F.pmod(F.lit(a) * F.pmod(s, F.lit(_MERSENNE)) + F.lit(b), F.lit(_MERSENNE))

        return apply

    sig = []
    for i in range(num_perm):
        a = rnd.randrange(1, _MERSENNE)
        b = rnd.randrange(0, _MERSENNE)
        sig.append(F.array_min(F.transform(shingles_col, perm_fn(a, b))).alias(f"mh_{i}"))
    return F.array(*sig)


def minhash_lsh_candidates(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
) -> DataFrame:
    """Near-duplicate candidate pairs (key_a < key_b) via banded MinHash-LSH.

    rows/band = num_perm // bands; two docs collide if any band's row-slice
    hashes equal. Returns (key_a, key_b, est_jaccard) where est_jaccard is
    the fraction of equal signature positions.
    """
    rows_per_band = num_perm // bands
    sig = docs.select(
        F.col(key_col).alias("key"),
        minhash_signature(shingle_hashes(F.col(text_col), shingle_n), num_perm).alias("sig"),
    )
    banded = sig.select(
        "key",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ":", *[F.element_at("sig", b * rows_per_band + r + 1)
                                   for r in range(rows_per_band)]
                        )
                    ).alias("band_hash"),
                )
                for b in range(bands)
            ])
        ).alias("bh"),
    ).select("key", "sig", "bh.band", "bh.band_hash")

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["key_a", "key_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.lit(num_perm)
    )
    return pairs.select("key_a", "key_b", est.alias("est_jaccard"))


def minhash_dedup_groups(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    max_iterations: int = 10,
) -> DataFrame:
    """(key, group_key) assignment: connected components over accepted
    candidate pairs via iterative min-label propagation (converges in
    O(log(component diameter)) shuffles — no driver-side state)."""
    pairs = minhash_lsh_candidates(
        docs, key_col, text_col, num_perm, bands, shingle_n
    ).where(F.col("est_jaccard") >= threshold)
    # materialize edges once: the signature computation must not be re-run
    # per propagation round, and each round's result is checkpointed so the
    # plan lineage stays flat (otherwise it doubles every iteration)
    edges = (
        pairs.select("key_a", "key_b")
        .union(pairs.select(F.col("key_b").alias("key_a"), F.col("key_a").alias("key_b")))
        .localCheckpoint(eager=True)
    )
    labels = docs.select(F.col(key_col).alias("key")).withColumn(
        "label", F.col("key")
    ).localCheckpoint(eager=True)
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["key_b"] == labels["key"])
            .groupBy("key_a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["key"] == neighbor_min["key_a"], "left")
            .select(
                "key",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "key")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("key"), F.col("label").alias("group_key"))


def ngram_jaccard(
    docs_a: DataFrame, docs_b: DataFrame | None = None,
    key_col: str = "doc_id", text_col: str = "text",
    shingle_n: int = 3, candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification tier).

    If ``candidates`` (key_a, key_b) is None, uses MinHash-LSH to generate
    them first; never computes all-pairs.
    """
    if candidates is None:
        candidates = minhash_lsh_candidates(
            docs_a, key_col, text_col, shingle_n=shingle_n
        ).select("key_a", "key_b")
    sh = docs_a.select(
        F.col(key_col).alias("key"),
        F.array_distinct(shingle_hashes(F.col(text_col), shingle_n)).alias("sh"),
    )
    out = (
        candidates.join(sh.withColumnRenamed("key", "key_a").withColumnRenamed("sh", "sh_a"), "key_a")
        .join(sh.withColumnRenamed("key", "key_b").withColumnRenamed("sh", "sh_b"), "key_b")
        .select(
            "key_a", "key_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return out


# --- SimHash ----------------------------------------------------------------

def simhash(docs: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc from token hashes — vectorized pandas UDF.

    Token hashing stays native (xxhash64 array); the bit-vote accumulation
    runs in numpy over the flattened ragged arrays (np.add.reduceat), never
    per-row Python.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _simhash_from_hashes(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.uint64)
        lengths = np.array([len(h) for h in hashes], dtype=np.int64)
        if lengths.sum() == 0:
            return pd.Series(out.view(np.int64))
        flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in hashes]).view(np.uint64)
        # bit matrix votes: (total_tokens, 64) of +-1, summed per doc
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
        votes = bits * 2 - 1
        offsets = np.zeros(len(hashes), dtype=np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        nonempty = lengths > 0
        sums = np.zeros((len(hashes), 64), dtype=np.int64)
        sums[nonempty] = np.add.reduceat(votes, offsets[nonempty], axis=0)[: nonempty.sum()]
        # note: reduceat with duplicate offsets (empty docs) handled by mask
        sig = (sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        out = sig.sum(axis=1, dtype=np.uint64)
        return pd.Series(out.view(np.int64))

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return docs.select(
        F.col(key_col).alias("key"),
        _simhash_from_hashes(hashes).alias("simhash"),
    )


def simhash_candidates(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4 16-bit chunks
    (any-chunk equality catches all pairs with Hamming distance <= 3),
    verify exact Hamming on collisions. Returns (key_a, key_b, hamming)."""
    sh = simhash(docs, key_col, text_col)
    chunks = sh.select(
        "key", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk_val"),
            )
            for c in range(4)
        ])).alias("cv"),
    ).select("key", "simhash", "cv.chunk", "cv.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(
            F.col("a.key").alias("key_a"),
            F.col("b.key").alias("key_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["key_a", "key_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.select("key_a", "key_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
