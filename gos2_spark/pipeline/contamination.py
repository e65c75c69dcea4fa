"""Benchmark decontamination: flag corpus documents sharing word n-grams
with a held-out evaluation set (the standard 8-13-gram overlap test used
before LLM training runs).

Scale shape (10^12-doc corpus, ~10^5-doc benchmark):

* the benchmark n-gram set is tiny (millions of grams) -> built once,
  de-duplicated, and BROADCAST; the corpus side never shuffles on grams;
* corpus grams are a Generate (explode) off the scan — the only wide
  exchange is the final per-doc aggregation, which reuses the doc key the
  scan already carries (map-side combined counts);
* grams are compared as exact strings here so the DuckDB oracle is a
  literal replay; swap ``gram`` for ``xxhash64(gram)`` at production scale
  to cut the broadcast payload ~8x without changing the plan shape.

Set ``broadcast_benchmark=False`` for benchmark sets too large to
broadcast: the join becomes a shuffle on gram, still linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gos2_spark.pipeline.text import tokens


def word_ngrams(text_col: Column, n: int) -> Column:
    """Distinct space-joined word n-grams; empty array when the document
    has fewer than ``n`` tokens (guarded: F.sequence(0, -1) would
    otherwise produce a DESCENDING range, not an empty one)."""
    toks = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    # blank guard: split(trim(''), '\s+') yields [''] — one bogus empty
    # token that would produce a '' 1-gram
    return F.array_distinct(
        F.when(
            (F.size(toks) >= n) & (F.trim(text_col) != ""), grams
        ).otherwise(F.array().cast("array<string>"))
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per corpus document: (key, n_ngrams, n_contaminated, contaminated).

    ``n_ngrams`` counts the document's DISTINCT n-grams; ``n_contaminated``
    counts how many of those occur anywhere in ``benchmark``. Documents
    shorter than ``n`` tokens have zero grams and are never contaminated.
    """
    bench = (
        benchmark.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    # widen the corpus side first: the n-gram explode + broadcast probe is
    # all pre-exchange work, and a one-row-group parquet scan would pin it
    # to a single core
    from ..spark.functions import widen_to_parallelism

    grams = widen_to_parallelism(corpus).select(
        F.col(key_col).alias("key"),
        F.explode_outer(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    per_doc = (
        grams.join(bench, "gram", "left")
        .groupBy("key")
        .agg(
            F.count("gram").alias("n_ngrams"),
            F.count("_hit").alias("n_contaminated"),
        )
    )
    return per_doc.withColumn("contaminated", F.col("n_contaminated") > 0)
