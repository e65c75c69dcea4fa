"""Distributed per-group spatial aggregations — pure Catalyst plans.

rect_bound_agg
    The minimal wrap-aware bounding Rect per group. The reference builds
    per-shape bounds by greedy interval union (RectBounder.AddPoint,
    /root/reference/s2/edgeutil.go:282-333, over Rect's S1Interval
    longitude algebra, rect.go + s1 interval semantics); greedy union is
    order-dependent once a group spans >= 180 deg, which has no place in a
    distributed engine. We instead compute the CANONICAL minimal bound:
    latitude is plain min/max, longitude is the complement of the largest
    gap between consecutive longitudes on the circle — for groups spanning
    < 180 deg this equals the reference's greedy bound exactly, and for
    wider groups it is the unique minimal interval (deterministic under
    any partitioning / arrival order). One shuffle (window partitionBy);
    everything stays in whole-stage codegen.

denormalize_to_level
    CellUnion.Denormalize (/root/reference/s2/cellunion.go:68-88): replace
    every cell by its 4^(level - cell_level) descendants at a fixed level.
    Native sequence()+explode over the id arithmetic — first descendant
    id = cell - lsb + lsb_target, stride 2*lsb_target (cellid.go ChildBegin
    arithmetic, cellid.go:235-258) — valid on the engine's BIASED signed
    ids because the bias only flips bit 63 and the child arithmetic never
    borrows across it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rect_bound_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Per-group minimal bounding rect: (groups..., lat_lo, lat_hi,
    lng_lo, lng_hi, n_pts). lng_lo > lng_hi means the interval wraps the
    antimeridian (the reference Rect's inverted-interval convention).

    Longitudes are taken in degrees in [-180, 180). Deterministic tie
    break: among equal largest gaps the one starting at the smallest
    longitude wins.
    """
    gcols = [F.col(c) for c in group_cols]

    w_sorted = Window.partitionBy(*group_cols).orderBy("_lng")
    w_grp = Window.partitionBy(*group_cols)

    # circular successor of each longitude: the next-larger one, or
    # (wrapping) the group's smallest + 360
    nxt = F.coalesce(
        F.lead("_lng").over(w_sorted), F.min("_lng").over(w_grp) + F.lit(360.0)
    )
    staged = df.select(
        *gcols, F.col(lat_col).alias("_lat"), F.col(lng_col).alias("_lng")
    ).select(
        *group_cols,
        "_lat",
        "_lng",
        nxt.alias("_nxt"),
        F.min("_lat").over(w_grp).alias("lat_lo"),
        F.max("_lat").over(w_grp).alias("lat_hi"),
        F.count(F.lit(1)).over(w_grp).alias("n_pts"),
    )
    staged = staged.withColumn("_gap", F.col("_nxt") - F.col("_lng"))
    pick = Window.partitionBy(*group_cols).orderBy(F.desc("_gap"), F.col("_lng"))
    lng_lo = F.when(F.col("_nxt") >= 180.0, F.col("_nxt") - 360.0).otherwise(F.col("_nxt"))
    return (
        staged.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select(
            *group_cols,
            "lat_lo",
            "lat_hi",
            lng_lo.alias("lng_lo"),
            F.col("_lng").alias("lng_hi"),
            "n_pts",
        )
    )


def denormalize_to_level(
    df: DataFrame, cell_col: str, level: int, out_col: str = "cell_id"
) -> DataFrame:
    """Explode each cell (level <= ``level``) into its descendants at
    exactly ``level``. Cells already DEEPER than ``level`` drop out (the
    reference instead refuses to denormalize such unions,
    cellunion.go:70-73 — here a row-level guard is the distributed
    equivalent; callers normalize first if they need the strict contract).
    """
    if not 0 <= level <= 30:
        raise ValueError(f"level must be in [0, 30], got {level}")
    lsb_t = 1 << (2 * (30 - level))
    cell = F.col(cell_col)
    lsb = cell.bitwiseAND(-cell)  # level marker of the input cell
    first = cell - lsb + F.lit(lsb_t)
    last = cell + lsb - F.lit(lsb_t)
    seq = F.when(lsb >= F.lit(lsb_t), F.sequence(first, last, F.lit(2 * lsb_t)))
    return df.withColumn(out_col, F.explode(seq))


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "1 hour",
) -> DataFrame:
    """Session-window aggregation: group each key's events into sessions
    separated by silences longer than ``gap`` (native
    ``F.session_window`` — Catalyst merges windows inside the single
    groupBy shuffle; the same call sessionizes a stream when ``events``
    is a streaming DataFrame).

    Returns one row per (key, session): start/end timestamps and event
    count. At web scale the only shuffle is keyed by (key, window) with
    map-side partial merge, so hot users cost one task, not a replan.
    """
    return (
        events.groupBy(
            F.col(key_col).alias("key"),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "key",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def capped_sample_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    k: int,
    order_col,
    shards: int = 32,
    tiebreak_cols: Sequence | None = None,
) -> DataFrame:
    """Deterministically keep at most ``k`` rows per key — the per-domain
    crawl budget / per-host dedup cap of web curation — picking the k
    smallest ``order_col`` values (use a hash for an unbiased sample).

    ``tiebreak_cols`` (default: the key columns — pass a row-unique column
    such as the url/doc id whenever ``order_col`` can collide WITHIN a
    key) is appended to the ordering of BOTH windows: with ties left
    unbroken, row_number is partitioning-dependent and the "deterministic"
    contract silently fails on the tied rows.

    Skew-safe two-level plan: a single window over a hot key would funnel
    that key's 10^9 rows into ONE task. Instead rows are first ranked
    within (key, shard) where shard = hash % ``shards`` (bounding any
    task at ~1/shards of the hottest key) and only the <= shards*k
    survivors enter the exact per-key rank. Any globally-top-k row under
    the composite total order is top-k within its own shard (top-k is
    subset-monotone for ANY total order), so the result is IDENTICAL to
    the single-window plan.
    """
    keys = [F.col(c) for c in key_cols]
    ties = list(tiebreak_cols) if tiebreak_cols is not None else list(key_cols)
    order = [order_col, *ties]
    shard = F.pmod(F.xxhash64(order_col), F.lit(shards))
    w1 = Window.partitionBy(*keys, shard).orderBy(*order)
    survivors = (
        df.withColumn("_r1", F.row_number().over(w1)).where(F.col("_r1") <= k)
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        survivors.withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= k)
        .drop("_r1", "_r2")
    )


def cell_pyramid(
    points: DataFrame,
    levels: Sequence[int] = (2, 3, 4, 5, 6, 7, 8),
    cell_col: str = "cell_id",
) -> DataFrame:
    """Multi-resolution heatmap pyramid: per-cell point counts at EVERY
    level in ``levels``, in ONE pass — the map-tile aggregation primitive.

    The ancestor set per row is a log-depth in-row array (Parent is pure
    bitwise SQL on biased ids, cellid.go:168-171), exploded by a Generate;
    the only shuffle is the single (level, cell) hash aggregation, which
    Catalyst partial-aggregates map-side — at 10^12 points the exchange
    carries one row per DISTINCT (level, cell), not per input row."""
    from .pages import s2_parent_sql

    arr = F.array(*[
        F.struct(
            F.lit(l).cast("int").alias("level"),
            s2_parent_sql(F.col(cell_col), l).alias("cell"),
        )
        for l in levels
    ])
    return (
        points.select(F.explode(arr).alias("lc"))
        .groupBy(
            F.col("lc.level").alias("level"), F.col("lc.cell").alias("cell")
        )
        .agg(F.count("*").alias("n"))
    )


def cap_bound_per_key(
    points: DataFrame,
    key_col: str = "key",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Per-key bounding spherical cap — the distributed analogue of the
    reference's CapBound region bound (cap.go), complementing the
    wrap-aware rect bound aggregate: axis = the group's mean position
    vector (TrueCentroid direction, loop.go:215 family), radius = the
    max angle from the axis to any member point.

    The centroid-axis cap is within a small constant of the minimum
    enclosing cap and is computable in TWO map-side-combined
    aggregations: (1) per-key 3-vector means; (2) joined back (AQE
    broadcasts the O(keys) mean table when small) for the per-point
    angle ``atan2(|m x p|, m . p)`` — normalization of the mean cancels
    inside atan2, so no renormalize step exists to disagree about. Max
    is order-independent, so the only float-order sensitivity is the
    mean itself (report rounded).

    Output: key, n_pts, axis_lat, axis_lng (degrees), radius_rad.
    """
    rlat, rlng = F.radians(lat_col), F.radians(lng_col)
    proj = points.select(
        F.col(key_col).alias("key"),
        (F.cos(rlng) * F.cos(rlat)).alias("px"),
        (F.sin(rlng) * F.cos(rlat)).alias("py"),
        F.sin(rlat).alias("pz"),
    )
    means = proj.groupBy("key").agg(
        F.count("*").alias("n_pts"),
        F.avg("px").alias("mx"),
        F.avg("py").alias("my"),
        F.avg("pz").alias("mz"),
    )
    j = proj.join(means, "key")
    cx = F.col("my") * F.col("pz") - F.col("mz") * F.col("py")
    cy = F.col("mz") * F.col("px") - F.col("mx") * F.col("pz")
    cz = F.col("mx") * F.col("py") - F.col("my") * F.col("px")
    dot = (
        F.col("mx") * F.col("px")
        + F.col("my") * F.col("py")
        + F.col("mz") * F.col("pz")
    )
    ang = F.atan2(F.sqrt(cx * cx + cy * cy + cz * cz), dot)
    axis_lat = F.degrees(
        F.atan2(
            F.col("mz"),
            F.sqrt(F.col("mx") * F.col("mx") + F.col("my") * F.col("my")),
        )
    )
    axis_lng = F.degrees(F.atan2(F.col("my"), F.col("mx")))
    return (
        j.select("key", "n_pts", "mx", "my", "mz", ang.alias("ang"))
        .groupBy("key")
        .agg(
            F.first("n_pts").alias("n_pts"),
            F.first("mx").alias("mx"),
            F.first("my").alias("my"),
            F.first("mz").alias("mz"),
            F.max("ang").alias("radius_rad"),
        )
        .select(
            "key",
            "n_pts",
            axis_lat.alias("axis_lat"),
            axis_lng.alias("axis_lng"),
            "radius_rad",
        )
    )


def benford_digit_stats(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law.

    The classic synthetic-data / fraud screen for a numeric column: the
    leading digit d of naturally-occurring multi-scale quantities follows
    P(d) = log10(1 + 1/d); a flat or spiky histogram flags fabricated or
    machine-generated values. Output: one row per digit 1-9 with the
    exact count, observed and expected proportions, and the chi-square
    contribution (n * (obs - exp)^2 / exp) — sum the column for the test
    statistic (chi2_0.95 with 8 dof = 15.51).

    digit = floor(v / 10^floor(log10(v))) for v > 0; non-positive values
    are excluded (no leading digit). One projection + one 9-group
    aggregation — scan-bound at any scale. Counts are exact BIGINTs; the
    proportions are fixed-order double expressions the SQL oracle
    replays.
    """
    v = F.col(value_col).cast("double")
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    d = df.where(v > 0).select(digit.alias("digit"))
    counts = d.groupBy("digit").agg(F.count("*").alias("n"))
    tot = d.agg(F.count("*").alias("n_total"))
    j = counts.crossJoin(F.broadcast(tot))
    obs = F.col("n").cast("double") / F.col("n_total").cast("double")
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    chi = (
        F.col("n_total").cast("double") * (obs - exp_p) * (obs - exp_p) / exp_p
    )
    return j.select(
        "digit",
        "n",
        F.round(obs, 12).alias("observed_p"),
        F.round(exp_p, 12).alias("expected_p"),
        F.round(chi, 9).alias("chi2_term"),
    )


def two_proportion_ztest(
    df: DataFrame,
    arm_col: str,
    success_col: str,
) -> DataFrame:
    """Two-proportion z-test over an A/B assignment — the experiment
    readout every event pipeline ends in: conversion rate per arm, the
    pooled-variance z statistic, and the exact integer sufficient
    statistics it derives from.

    ``arm_col`` must be 0/1; ``success_col`` boolean/0-1 per unit.

        z = (p0 - p1) / sqrt(p*(1-p) * (1/n0 + 1/n1)),  p = pooled rate

    One aggregation (four conditional BIGINT sums); every float is one
    fixed-order expression over those integers — bit-identical
    cross-engine. Output: ONE row (n0, conv0, n1, conv1, p0, p1,
    p_pooled, z_stat).
    """
    arm = F.col(arm_col)
    s = F.col(success_col).cast("long")
    agg = df.agg(
        F.sum(F.when(arm == 0, F.lit(1)).otherwise(F.lit(0))).alias("n0"),
        F.sum(F.when(arm == 0, s).otherwise(F.lit(0))).alias("conv0"),
        F.sum(F.when(arm == 1, F.lit(1)).otherwise(F.lit(0))).alias("n1"),
        F.sum(F.when(arm == 1, s).otherwise(F.lit(0))).alias("conv1"),
    )
    n0, n1 = F.col("n0").cast("double"), F.col("n1").cast("double")
    p0 = F.when(F.col("n0") > 0, F.col("conv0").cast("double") / n0)
    p1 = F.when(F.col("n1") > 0, F.col("conv1").cast("double") / n1)
    pp = (F.col("conv0") + F.col("conv1")).cast("double") / (n0 + n1)
    z = F.when(
        (F.col("n0") > 0)
        & (F.col("n1") > 0)
        & (F.col("conv0") + F.col("conv1") > 0)
        & (F.col("conv0") + F.col("conv1") < F.col("n0") + F.col("n1")),
        (p0 - p1)
        / F.sqrt(
            pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n0 + F.lit(1.0) / n1)
        ),
    )
    return agg.select(
        "n0", "conv0", "n1", "conv1",
        F.round(p0, 9).alias("p0"),
        F.round(p1, 9).alias("p1"),
        F.round(pp, 9).alias("p_pooled"),
        F.round(z, 9).alias("z_stat"),
    )
