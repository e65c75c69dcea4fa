"""Distributed Count-Min sketch: sublinear frequency estimation for
heavy-hitter queries over corpora too large for an exact per-key groupBy
to be worth materializing.

Like pipeline.bloom, the sketch is exact integer algebra on ``xxhash64``
(seed 42), so every cell — and therefore every estimate, including the
deterministic overestimates from collisions — is reproducible bit-for-bit
in DuckDB.

Scale shape:

* the sketch is a DATAFRAME of (row, col, cnt) cells, depth x width rows
  at most — never a driver-side matrix;
* build: one exact (key -> weight) aggregation feeds a depth-way in-row
  explode, then ONE (row, col) groupBy (map-side combined). Incrementing
  per-distinct-key by its weight is algebraically identical to
  per-occurrence increments, and hashes each key once instead of once per
  occurrence;
* query: explode depth cells per probe, broadcast-join the sketch, take
  the min cell — the classic CMS upper bound: est >= true always,
  overestimate probability shrinks with width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_positions(key: Column, depth: int, width: int) -> Column:
    """Array of ``depth`` column indices: pmod(xxhash64(key || '#cms<d>'),
    width) — independent salted hashes, one per sketch row."""
    return F.array(
        *[
            F.pmod(
                F.xxhash64(F.concat(key, F.lit(f"#cms{d}"))), F.lit(width)
            ).cast("int")
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """(row, col, cnt) sketch cells from ``df[key_col]`` occurrences
    (each row counts 1) or from pre-aggregated (key, weight) rows when
    ``weight_col`` is given."""
    if weight_col is None:
        agg = df.groupBy(F.col(key_col).alias("_k")).agg(
            F.count("*").alias("_w")
        )
    else:
        agg = df.select(
            F.col(key_col).alias("_k"), F.col(weight_col).alias("_w")
        )
    pos = cms_positions(F.col("_k"), depth, width)
    cells = agg.select(
        F.col("_w"), F.posexplode(pos).alias("row", "col")
    )
    return cells.groupBy("row", "col").agg(F.sum("_w").alias("cnt"))


def cms_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """``probes`` + an ``est`` column: min over the probe's depth cells
    (0 when a cell is empty). Sketch side is broadcast — it is bounded by
    depth*width regardless of corpus size."""
    pos = cms_positions(F.col(key_col), depth, width)
    p = probes.select(
        F.col(key_col), F.posexplode(pos).alias("row", "col")
    )
    joined = p.join(F.broadcast(sketch), ["row", "col"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
