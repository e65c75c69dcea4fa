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


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    b: int = 12,
) -> DataFrame:
    """HyperLogLog register table (group..., bucket, rank): bucket = top-b
    bits of the UNSIGNED xxhash64, rank = leading-zero count of the
    remaining 64-b bits + 1, register = MAX rank per bucket. Pure integer
    algebra — bit_length via length(bin(w)), no floats — so every
    register is replayable bit-for-bit. Duplicates cannot change a max,
    so the input needs no distinct; one (group, bucket) shuffle total."""
    h = F.xxhash64(F.col(key_col))
    nb = 64 - b
    bucket = F.shiftrightunsigned(h, nb)
    w = h.bitwiseAND(F.lit((1 << nb) - 1))
    rank = F.when(w == 0, F.lit(nb + 1)).otherwise(
        F.lit(nb + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate(
    regs: DataFrame,
    group_cols: tuple[str, ...] = (),
    b: int = 12,
) -> DataFrame:
    """(group..., occupied, est): the standard HLL estimator with linear
    counting below 2.5m. The harmonic sum is computed EXACTLY: each
    2^-rank term becomes the integer 2^(R-rank) (R = 65-b covers the max
    rank) summed in DECIMAL, so the only floats are one final division,
    one branch compare, and the small-range ln — cross-engine drift is
    bounded to an ulp and absorbed by round(est, 4)."""
    m = 1 << b
    R = (64 - b) + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    # single Python-computed double literal shared with the oracle so both
    # engines divide the identical numerator
    num = alpha * m * m * float(1 << R)
    # call_function: pyspark's F.shiftleft only accepts a literal int for
    # numBits, but SQL shiftleft takes a column (same pattern as bloom._mask)
    term = F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        (F.lit(R) - F.col("rank")).cast("int"),
    )
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("occupied"),
        F.sum(term.cast("decimal(20,0)")).alias("_s_occ"),
    )
    s = (
        F.col("_s_occ")
        + (F.lit(m) - F.col("occupied")).cast("decimal(20,0)")
        * F.lit(1 << R).cast("decimal(20,0)")
    )
    raw = F.lit(num) / s.cast("double")
    v = F.lit(m) - F.col("occupied")
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(
        *group_cols, "occupied", F.round(est, 4).alias("est")
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = 32,
) -> DataFrame:
    """K-minimum-values distinct sketch per group: the ``k`` smallest
    DISTINCT ``xxhash64`` values of ``key_col`` (seed 42, the engine's
    standard hash) — the third mergeable cardinality sketch next to HLL
    (kmv trades HLL's fixed registers for order statistics: simpler
    merge = re-take the k minima of the union, and it supports set
    operations on the sketches themselves).

    Output: (*group_cols, idx, h) with idx = 1..k ascending by hash —
    a mergeable sketch TABLE, never a driver-side structure. Exact
    integer contents: the oracle replays every hash via the SQL XXH64
    model.

    Scale shape: one distinct on (group, hash) — map-side combined —
    then a per-group window top-k. At monster group cardinality the
    window swap-in is the standard two-level trick (per-shard k minima,
    then k minima of the k·shards union — min-of-mins is exact for
    order statistics, same argument as capped_sample_per_key).
    """
    from pyspark.sql import Window

    h = F.xxhash64(F.col(key_col).cast("string"))
    d = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        d.withColumn("idx", F.row_number().over(w))
        .where(F.col("idx") <= k)
        .select(*group_cols, "idx", "h")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Distinct-count estimate from a ``kmv_sketch`` table:

        est = (k - 1) / u(h_k)          (k-th minimum normalized to (0,1))

    where ``u`` maps the signed-int64 hash onto the unit interval with
    the affine (h + 2^63 + 1) / (2^64 + 1) — strictly inside (0, 1) so
    the division is always defined. Groups with fewer than ``k``
    distinct hashes are EXACT (the sketch saw every value): est =
    k_used. One exact BIGINT max + count per group, then a single fixed
    float expression — bit-identical cross-engine.
    """
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("k_used"), F.max("h").alias("h_k")
    )
    u = (F.col("h_k").cast("double") + F.lit(9.223372036854775809e18)) / F.lit(
        1.8446744073709552e19
    )
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(F.lit(float(k - 1)) / u)
    return agg.select(
        *group_cols, "k_used", "h_k", F.round(est, 4).alias("est_distinct")
    )


def ams_f2(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    n_estimators: int = 8,
) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) second-frequency-moment sketch per
    group: estimates F2 = sum_k count(k)^2 — the self-join size /
    skew indicator a planner consults before hash-joining on a key —
    from ``n_estimators`` +/-1 sign sums instead of a per-key state.

    Like the CMS/Bloom/KMV family, the randomness is exact integer
    algebra on ``xxhash64`` (seed 42): sign_r(k) = 1 - 2*pmod(h_r(k), 2)
    with h_r salted per estimator, so every sign — and therefore the
    whole estimate — replays bit-for-bit in DuckDB.

    Per group: S_r = sum_k count(k) * sign_r(k) is an exact BIGINT
    (one groupBy, map-side combined, all estimators in the same pass);
    the estimate mean(S_r^2) is squared in DOUBLE (S_r^2 can exceed
    int64 at corpus scale) and summed in estimator order — fixed-order
    float math, bit-identical cross-engine. The exact F2 (BIGINT) rides
    along for the accuracy report.

    Output: (group..., n_items, n_distinct, f2_exact, f2_est).
    """
    cnt = df.groupBy(*group_cols, F.col(key_col).alias("_k")).agg(
        F.count("*").alias("_c")
    )
    signs = [
        (
            F.lit(1)
            - F.lit(2)
            * F.pmod(
                F.xxhash64(F.concat(F.col("_k"), F.lit(f"#ams{r}"))),
                F.lit(2),
            )
        ).cast("long")
        for r in range(n_estimators)
    ]
    aggs = [
        F.sum("_c").alias("n_items"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("_c") * F.col("_c")).alias("f2_exact"),
    ] + [
        F.sum(F.col("_c") * s).alias(f"_s{r}")
        for r, s in enumerate(signs)
    ]
    per = cnt.groupBy(*group_cols).agg(*aggs)
    est = None
    for r in range(n_estimators):
        sq = F.col(f"_s{r}").cast("double") * F.col(f"_s{r}").cast("double")
        est = sq if est is None else est + sq
    return per.select(
        *group_cols,
        "n_items",
        "n_distinct",
        "f2_exact",
        F.round(est / F.lit(float(n_estimators)), 6).alias("f2_est"),
    )
