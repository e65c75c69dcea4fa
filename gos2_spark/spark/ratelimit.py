"""Token-bucket admission control as a deterministic per-key fold.

The bucket update ``tokens' = min(cap, tokens + dt * rate)`` with
``allow iff tokens' >= 1`` is an order-sensitive recurrence, so it
cannot be a commutative aggregate — but per key it is a LEFT FOLD over
the time-ordered event sequence, which Spark executes as a JVM
higher-order ``aggregate`` expression over one collected array per key
(the burst_viterbi pattern): no Python, no iterative jobs, one shuffle.

Scale shape: one groupBy(key) carrying (ts) arrays. Per-key sequence
length is the same bounded-group contract as sessionize/ewma — human
activity streams are bounded per user per horizon; for unbounded keys,
window the input first (the streaming twin applies the same fold per
micro-batch with carried state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["token_bucket"]


def token_bucket(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    order_col: str,
    capacity: float = 2.0,
    refill_us_per_token: float = 4.0e10,
) -> DataFrame:
    """Replay each key's event sequence through a token bucket.

    Returns (key, n_events, n_allowed, n_denied, tokens_left) with
    tokens_left rounded to 9 decimals. The accumulator is
    [tokens, prev_ts (-1 before the first event), n_allowed]; every
    arithmetic step is a fixed-order double expression, so a DuckDB
    list_reduce over the identically ordered list replays it
    bit-for-bit (see __spark_entry__._TOKEN_BUCKET_ORACLE).
    """
    cap = float(capacity)
    refill = float(refill_us_per_token)

    def refilled(acc, x):
        return F.least(
            F.lit(cap),
            F.when(acc[1] < 0, F.lit(cap)).otherwise(
                acc[0] + (x["us"] - acc[1]) / refill
            ),
        )

    folded = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_events"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_us_col).alias("us"),
                        F.col(order_col).cast("long").alias("e"),
                    )
                )
            ),
            F.array(F.lit(cap), F.lit(-1.0), F.lit(0.0)),
            lambda acc, x: F.array(
                F.when(refilled(acc, x) >= 1.0, refilled(acc, x) - 1.0)
                .otherwise(refilled(acc, x)),
                x["us"].cast("double"),
                acc[2]
                + F.when(refilled(acc, x) >= 1.0, F.lit(1.0)).otherwise(
                    F.lit(0.0)
                ),
            ),
        ).alias("st"),
    )
    return folded.select(
        F.col("key").alias(key_col),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("st")[2].cast("long").alias("n_allowed"),
        (F.col("n_events") - F.col("st")[2]).cast("long").alias("n_denied"),
        F.round(F.col("st")[0], 9).alias("tokens_left"),
    )
