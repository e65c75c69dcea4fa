"""Substring-level duplication analysis (Lee et al., "Deduplicating
Training Data Makes Language Models Better"): find every k-token span
that occurs more than once in the corpus and report, per document, how
many of its tokens are covered by such duplicated spans.

This is the measurement half of exact-substring dedup: the removal step
is a trivial filter/slice on top of the coverage intervals.

Scale shape (10^12 docs):

* spans are keyed by ``xxhash64`` of the token window — 8 bytes through
  the shuffle instead of the raw string (collisions only MERGE span
  groups, i.e. over-flag a span as duplicated, at ~2^-64 per pair — the
  standard trade; the DuckDB oracle replays the exact same hashes);
* two shuffles total: occurrence counts on span hash (map-side combined),
  then the join-back of duplicated hashes onto occurrences
  (co-partitioned on the same key, AQE-splittable);
* per-doc interval union is array algebra on the collected positions —
  bounded by document length, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gos2_spark.pipeline.text import tokens


def span_hashes(text_col, k: int):
    """Array of xxhash64 values, one per k-token window (1-based start
    positions 1..T-k+1); empty for blank or shorter-than-k documents."""
    toks = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    return F.when(
        (F.size(toks) >= k) & (F.trim(text_col) != ""), grams
    ).otherwise(F.array().cast("array<bigint>"))


def duplicated_span_coverage(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Per document: (key, n_tokens, n_spans, n_dup_spans, dup_tokens).

    ``dup_tokens`` is the size of the UNION of the intervals [p, p+k) over
    every span position p whose k-gram occurs more than once in the whole
    corpus (within-document repeats count). Sorted-position fold:
    |union| = k + sum_i min(k, p_{i+1} - p_i).
    """
    toks = tokens(F.col(text_col))
    n_tok = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
        F.size(toks)
    )
    base = docs.select(
        F.col(key_col).alias("key"),
        n_tok.cast("long").alias("n_tokens"),
        span_hashes(F.col(text_col), k).alias("ghs"),
    )
    occ = base.select(
        "key", F.posexplode("ghs").alias("pos0", "gh")
    ).select("key", (F.col("pos0") + 1).alias("pos"), "gh")
    dup = occ.groupBy("gh").agg(F.count("*").alias("_c")).where(
        F.col("_c") > 1
    )
    per_doc = (
        occ.join(dup.select("gh"), "gh")
        .groupBy("key")
        .agg(F.sort_array(F.collect_list("pos")).alias("ps"))
        .select(
            "key",
            F.size("ps").alias("n_dup_spans"),
            (
                F.lit(k)
                + F.aggregate(
                    F.zip_with(
                        F.slice(F.col("ps"), 2, F.greatest(F.size("ps") - 1, F.lit(0))),
                        F.slice(F.col("ps"), 1, F.greatest(F.size("ps") - 1, F.lit(0))),
                        lambda nxt, prv: F.least(F.lit(k), nxt - prv),
                    ),
                    F.lit(0),
                    lambda acc, x: acc + x,
                )
            ).cast("long").alias("dup_tokens"),
        )
    )
    return (
        base.select("key", "n_tokens", F.size("ghs").cast("long").alias("n_spans"))
        .join(per_doc, "key", "left")
        .select(
            "key",
            "n_tokens",
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        )
    )
