"""Google Encoded Polyline Algorithm Format — the trajectory interop
string (Maps/OSRM/Valhalla wire format), produced entirely in Catalyst.

Encoding (per coordinate): scale by 1e5 and snap to integer, delta
against the previous point, zigzag-map the sign, then emit little-endian
5-bit chunks, each OR'd with 0x20 while more chunks follow, plus 63 —
printable ASCII. This module expresses every step as native column
algebra (integer compares, one fixed CASE ladder for the chunk count,
``transform`` + ``char`` for the chunk string): no UDF, no Python.

Determinism notes (pinned for the cross-engine oracle):

* the 1e-5 snap is ``floor(x * 1e5 + 0.5)`` — IEEE-exact and identical
  on both engines (Google's reference uses language ``round``, which
  differs only on exact-half NEGATIVE ties — a measure-zero input set;
  the snap rule here is part of this engine's format contract);
* zigzag is the arithmetic form ``v < 0 ? -2v - 1 : 2v`` (no bit tricks
  on negative ints, so any engine's shift semantics are irrelevant);
* deltas bound each zigzagged value below 2^27 (coordinates are clamped
  to valid lat/lng), so the chunk-count ladder stops at 6 chunks.

Scale shape: one per-key window (lag for the delta) on the same keyed
shuffle every trajectory op uses, then pure per-row codegen and one
ordered per-key string aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["polyline_chunks", "encode_polylines"]

_CHUNK_THRESHOLDS = [1 << (5 * i) for i in range(1, 7)]


def _snap_e5(deg: Column) -> Column:
    """floor(x * 1e5 + 0.5) — the engine's pinned coordinate snap."""
    return F.floor(deg * F.lit(100000.0) + F.lit(0.5)).cast("long")


def polyline_chunks(delta: Column) -> Column:
    """Integer delta -> encoded chunk string (the per-value unit of the
    polyline format). Pure codegen: zigzag, fixed CASE ladder for the
    last chunk index, ``transform`` over the chunk positions, ``char``.
    """
    z = F.when(delta < 0, F.lit(-2) * delta - 1).otherwise(F.lit(2) * delta)
    last = F.lit(0)
    for i, t in enumerate(_CHUNK_THRESHOLDS, start=1):
        last = F.when(z >= t, F.lit(i)).otherwise(last)
    # shiftright takes a LITERAL bit count: precompute all 7 possible
    # chunks once, index the array inside the lambda
    chunks = F.array(
        *[F.shiftright(z, 5 * i).bitwiseAND(F.lit(31)) for i in range(7)]
    )
    return F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), last),
            lambda i: F.char(
                F.element_at(chunks, (i + F.lit(1)).cast("int"))
                .bitwiseOR(F.when(i < last, F.lit(32)).otherwise(F.lit(0)))
                + F.lit(63)
            ),
        ),
    )


def encode_polylines(
    points: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts",),
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """(key, n_pts, polyline): one encoded polyline per key over its
    time-ordered points. One keyed window (delta lags), per-row chunk
    strings, one ordered string aggregation — entirely JVM-side.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*order_cols)
    lat5 = _snap_e5(F.col(lat_col))
    lng5 = _snap_e5(F.col(lng_col))
    d = points.select(
        key_col,
        *order_cols,
        lat5.alias("_lat5"),
        lng5.alias("_lng5"),
    ).select(
        key_col,
        *order_cols,
        (F.col("_lat5") - F.coalesce(F.lag("_lat5").over(w), F.lit(0))).alias(
            "_dlat"
        ),
        (F.col("_lng5") - F.coalesce(F.lag("_lng5").over(w), F.lit(0))).alias(
            "_dlng"
        ),
    )
    piece = F.concat(
        polyline_chunks(F.col("_dlat")), polyline_chunks(F.col("_dlng"))
    )
    keyed = d.select(
        key_col,
        F.struct(*[F.col(c) for c in order_cols], piece.alias("piece")).alias(
            "_e"
        ),
    )
    return keyed.groupBy(key_col).agg(
        F.count("*").alias("n_pts"),
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(F.collect_list("_e")), lambda s: s["piece"]
            ),
        ).alias("polyline"),
    )
