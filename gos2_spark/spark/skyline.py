"""Distributed 2-D skyline (Pareto frontier) query.

The "best tradeoff" operator: return every (x, y) point not DOMINATED by
another — p dominates q when p.x >= q.x, p.y <= q.y, and p differs in at
least one coordinate (maximize x, minimize y; flip signs at the call
site for other orientations).

Two-phase sort-filter plan (the distributed form of the classic
sort-first skyline):

1. **local phase** — after deduplicating to distinct (x, y) pairs, each
   partition computes its own skyline with a window partitioned by
   ``spark_partition_id()``: sorted by (x DESC, y ASC), a pair survives
   iff the running min of y over its strict predecessors is above its
   own y. Every globally-undominated pair is locally undominated (a
   dominator anywhere is a dominator in its own partition), so the local
   pass only discards rows that could never win — no shuffle, output
   bounded by |local skyline| per partition.
2. **global phase** — the same window over the union of local survivors
   (small by construction: the skyline of n random points is O(log n)
   expected), a single narrow sort.

Dominance correctness of the window filter on DISTINCT pairs: any
dominator of q sorts strictly before q under (x DESC, y ASC) and has
y <= q.y; conversely a predecessor with y <= q.y either has x > q.x or
(x == q.x, y < q.y) — a dominator either way. So "min y over strict
predecessors <= own y" is EXACTLY "dominated".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["skyline_2d"]


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Skyline of distinct (x, y): maximize ``x_col``, minimize ``y_col``.

    Returns (x_col, y_col, n_tied) — n_tied counts the input rows that
    carried that exact pair (the caller joins back for representatives).
    """
    pairs = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("n_tied"))
    )

    def survivors(p: DataFrame, part_cols: list) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.desc("x"), F.asc("y"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        run = F.min("y").over(w)
        return p.withColumn("_m", run).where(
            F.col("_m").isNull() | (F.col("y") < F.col("_m"))
        ).drop("_m")

    local = survivors(pairs.withColumn("_pid", F.spark_partition_id()), ["_pid"]).drop(
        "_pid"
    )
    out = survivors(local, [])
    return out.select(
        F.col("x").alias(x_col), F.col("y").alias(y_col), "n_tied"
    )
