"""Sequence packing for LLM pre-training: assign documents to fixed
token-budget training sequences ("packs") by concatenate-then-chunk — the
standard pretraining layout (docs are streamed in order, token stream is
cut every ``budget`` tokens; a doc may straddle a cut).

Scale shape: packing is per (group, shard) — ``shard = key % n_shards``
gives a deterministic, SQL-reproducible split whose count scales with the
cluster, so the single window sort each shard needs is local to its
shuffle partition and no shard ever sees more than ~corpus/n_shards
tokens. One shuffle total (the window's), pure codegen arithmetic on top
of a cumulative sum — no Python, no iteration, no driver state.

Everything is exact window algebra so a SQL oracle can replay it:
    cum        = sum(n_tok) over (partition group, shard order key)
    start      = cum - n_tok              (token offset of the doc)
    pack_first = floor(start / budget)    (pack holding the first token)
    pack_last  = floor((cum - 1) / budget) for non-empty docs, else
                 pack_first (an empty doc "lands" at its offset)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 64,
    key_col: str = "doc_id",
    ntok_col: str = "n_tok",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Adds (shard, cum_tok, start_tok, pack_first, pack_last, spans_packs)
    to ``docs``; pack ids restart per (group_cols..., shard).

    ``spans_packs`` marks boundary-straddling docs (the ones a loss mask /
    attention reset has to handle). ``n_tok`` must be non-negative.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    key, ntok = F.col(key_col), F.col(ntok_col)
    shard = F.pmod(key, F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols], F.col("shard"))
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(ntok).over(w).cast("long")
    start = (cum - ntok).cast("long")
    pack_first = F.floor(start / budget).cast("long")
    pack_last = F.when(
        ntok > 0, F.floor((cum - 1) / budget).cast("long")
    ).otherwise(pack_first)
    return (
        docs.withColumn("shard", shard)
        .withColumn("cum_tok", cum)
        .withColumn("start_tok", start)
        .withColumn("pack_first", pack_first)
        .withColumn("pack_last", pack_last)
        .withColumn("spans_packs", F.col("pack_last") != F.col("pack_first"))
    )


def packing_summary(
    packed: DataFrame, budget: int, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-(group..., shard) packing accounting: docs, tokens, packs used
    (= ceil(total/budget)), boundary-straddling docs, and last-pack fill.
    Pure aggregation over :func:`pack_sequences` output."""
    total = F.sum("n_tok").cast("long")
    n_packs = F.ceil(total / F.lit(budget)).cast("long")
    return (
        packed.groupBy(*group_cols, "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            total.alias("total_tok"),
            n_packs.alias("n_packs"),
            F.sum(F.col("spans_packs").cast("long")).cast("long").alias("boundary_docs"),
            F.round(
                (total - (n_packs - 1) * budget) / F.lit(budget).cast("double"), 9
            ).alias("last_pack_fill"),
        )
    )


def importance_resample(
    docs: DataFrame,
    weight_col,
    key_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic weighted (importance) resampling — the DCLM/DSIR-style
    quality-proportional downsampler: keep a row with probability
    ``weight`` (clamped to [0, 1]) as a PURE FUNCTION of its key, so
    membership is stable across runs, machines, partitionings, and
    re-shards (the same property as ``stratified_split``), and the kept
    set is reproducible end-to-end with no sampling state.

        keep  <=>  pmod(xxhash64(key), scale) < cast(weight * scale)

    The hash bucket is uniform on [0, scale); the threshold is one
    float-to-int cast of the caller's weight expression — both exact
    integer comparisons cross-engine. Zero shuffles: the gate is one
    codegen projection + filter.

    Returns the input rows that survive, with the bucket and threshold
    columns attached (auditable selection, like domain_cap_sample's
    fingerprints).
    """
    w = F.greatest(F.lit(0.0), F.least(F.lit(1.0), weight_col))
    bucket = F.pmod(
        F.xxhash64(F.col(key_col).cast("string")), F.lit(scale)
    )
    thresh = (w * F.lit(float(scale))).cast("long")
    return (
        docs.withColumn("_bucket", bucket)
        .withColumn("_thresh", thresh)
        .where(F.col("_bucket") < F.col("_thresh"))
    )


def weighted_sample_topk(
    df: DataFrame,
    weight: Column,
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES) — the exact complement of ``importance_resample``
    (which is Bernoulli WITH independent keeps): draw exactly ``k``
    items where the inclusion odds follow the weights, reproducible
    under any partitioning or resharding.

    Each row gets u in (0, 1) from its key hash — u = (pmod(h, 2^53) +
    1) / (2^53 + 1), exact in double since both numerator and
    denominator are < 2^54 — and the A-ES order statistic
    ln(u) / w (the log of u^(1/w), same argsort, no underflow for tiny
    weights). The k rows with the LARGEST score win. No per-partition
    state, no RNG: membership is a pure function of (key, weight), so a
    re-run on different partitioning returns the identical sample —
    the property that makes the op checkpoint/resume-safe at 100 TB.

    Plan: one codegen projection + global top-k (TakeOrderedAndProject,
    no full sort, no shuffle of the losers).
    """
    two53 = float(1 << 53)
    h = F.xxhash64(F.concat(F.col(key_col).cast("string"), F.lit("#aes")))
    u = (F.pmod(h, F.lit(1 << 53)).cast("double") + F.lit(1.0)) / F.lit(
        two53 + 1.0
    )
    score = F.log(u) / weight.cast("double")
    return (
        df.withColumn("aes_score", score)
        .orderBy(F.col("aes_score").desc(), F.col(key_col))
        .limit(int(k))
    )
