"""Hashed linear text classifier (fasttext-style hashing trick, fixed
weights): tokens are hashed into ``n_features`` buckets with xxhash64 and
scored against a deterministic weight table defined by closed-form
arithmetic — the shape of every production quality/topic gate, with the
learned weights replaced by a reproducible stand-in so correctness is
verifiable bit-for-bit (the DuckDB oracle replays hash + weight algebra).

Scale shape: the whole scorer is ONE whole-stage-codegen projection —
tokenize -> transform(xxhash64 -> pmod -> weight) -> aggregate — with no
shuffle, no UDF, no broadcast table (weights are arithmetic, not data).
Swapping in real learned weights means joining or broadcasting a
(bucket, weight) table instead of the closed form; the plan gains one
broadcast hash join and nothing else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gos2_spark.pipeline.text import tokens

# Knuth multiplicative constant: spreads bucket ids into pseudo-random
# weights in [-0.5, 0.5] with a closed form both engines can evaluate.
_WEIGHT_MULT = 2654435761


def bucket_weight(bucket: Column) -> Column:
    """Deterministic stand-in weight for a feature bucket."""
    return ((bucket * _WEIGHT_MULT) % 1000) / F.lit(999.0) - 0.5


def hashed_linear_score(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1 << 16,
) -> DataFrame:
    """(key, n_tokens, score, keep): mean bucket weight over the document's
    tokens; ``keep`` = score > 0. Empty documents score 0.0 and are kept.
    """
    toks = tokens(F.col(text_col))
    weights = F.transform(
        toks,
        lambda t: bucket_weight(F.pmod(F.xxhash64(t), F.lit(n_features))),
    )
    # split(trim(''), '\s+') yields [''] — one bogus empty token; blank
    # docs must count as zero tokens (same guard as text.token_count)
    n = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
        F.size(toks)
    )
    score = F.when(n > 0, F.aggregate(
        weights, F.lit(0.0), lambda acc, w: acc + w
    ) / n).otherwise(F.lit(0.0))
    return df.select(
        F.col(key_col).alias("key"),
        n.cast("long").alias("n_tokens"),
        score.alias("score"),
        (score > 0).alias("keep"),
    )
