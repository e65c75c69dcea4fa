"""Temporal joins: scalable as-of join (point-in-time lookup).

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive formulation —
an inequality join ``l.ts >= r.ts`` plus a per-left-row max — degenerates
into a per-key cross product that explodes quadratically on hot keys. This
module implements the scalable pattern instead: tag both sides, UNION them,
and carry the latest right-side values forward with one
``last(ignorenulls)`` running window per key — ONE shuffle on the key,
zero UDFs, linear in rows, and immune to key skew beyond ordinary window
sort cost. This is the shape a 10^12-row event-to-dimension point-in-time
enrichment needs (e.g. joining every crawl event to the profile/config
version active at that instant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "asof_join", "interval_join", "colocation_join", "cotravel_pairs",
    "knox_spacetime", "acf_counts", "dtw_distance_col",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.ts <= left.ts`` in the same key group (backward as-of; ties at
    equal ts match, i.e. inclusive). Right rows with duplicate (key, ts)
    must be pre-deduplicated by the caller — the union-window otherwise
    picks the physically-last one, which is not a stable contract.

    Returns all left columns plus ``value_cols`` (NULL when no earlier
    right row exists).

    Plan: unionByName with a side tag; right rows carry their values in ONE
    struct column so a) NULLs inside right values survive (the
    ignorenulls skip applies to the struct, never the payload fields) and
    b) the carry-forward is a single ``last(_payload, ignorenulls=True)``
    window expression over
    ``(key) ORDER BY (ts, side) ROWS UNBOUNDED PRECEDING..CURRENT`` —
    right rows sort before left rows at equal ts so equal-ts matches are
    inclusive. Filter back to left rows. One exchange, one sort.
    """
    from pyspark.sql import Window

    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != ts_col]
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        *keys,
        ts_col,
        F.struct(*[F.col(c) for c in value_cols]).alias("_payload"),
    ).withColumn("_side", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_carry", F.last("_payload", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1)
    for c in value_cols:
        out = out.withColumn(c, F.col("_carry").getField(c))
    return out.drop("_side", "_payload", "_carry")


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    on: str | list[str] | None = None,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """All (left row, interval) pairs with
    ``start_ts <= left.ts <= end_ts`` (plus optional key equality) —
    a temporal range join.

    The naive formulation is a pure inequality join, which Catalyst
    executes as a (broadcast) nested-loop / per-key cross product — at
    10^12 events that's quadratic. This instead EQUI-joins on a time
    bucket: each interval explodes into the ``bucket_seconds``-wide
    buckets it covers, each left row maps to its single bucket, and a
    codegen BETWEEN refines. Every qualifying pair appears exactly once
    (a left row's bucket is covered at most once per interval). Pick
    ``bucket_seconds`` near the typical interval length: exploded-row
    cost is O(intervals x ceil(interval_len / bucket_seconds)).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    lb = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    l_tag = left.withColumn("_bucket", lb)
    s = F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long")
    e = F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds).cast("long")
    iv = intervals.withColumn("_bucket", F.explode(F.sequence(s, e)))
    joined = l_tag.join(iv, ["_bucket", *keys])
    refine = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) <= F.col(end_col)
    )
    return joined.where(refine).drop("_bucket")


def colocation_join(
    points: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    lat_col: str = "lat",
    lng_col: str = "lng",
    window_seconds: int = 900,
    radius_rad: float = 0.1,
) -> DataFrame:
    """Encounter (co-location) detection: every unordered pair of events
    from DIFFERENT keys within ``window_seconds`` in time AND within
    ``radius_rad`` great-circle distance. The spatiotemporal analogue of
    the within-radius distance join — contact tracing, convoy mining,
    check-in coincidence.

    Plan: EQUI-join on a ``window_seconds``-wide time bucket, never an
    inequality nested loop. The probe side explodes each event into its
    home bucket ± 1 (any pair with |dt| <= window differs by at most one
    bucket); the build side keeps its single home bucket, so an unordered
    pair meets on exactly one (probe, home) combination and the
    ``id_a < id_b`` canonical filter keeps exactly one orientation —
    no post-join distinct needed. Refine is pure codegen: |dt| via
    microsecond integers (timestampdiff on the NTZ epoch — timezone-free
    on TIMESTAMP_NTZ sources) and the engine haversine
    (latlng.go:32-40 op order). For workloads dense in time, compose the
    bucket with a covering-cell key (see spark/joins.py distance_join) so
    the equi key becomes (time_bucket, cell).

    Output: key_a/id_a/key_b/id_b, dt_us (signed b-a), dist_rad.
    """
    from .functions import haversine_rad

    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    b = F.floor(us / (window_seconds * 1_000_000)).cast("long")
    base = points.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_id"),
        us.alias("_us"),
        F.col(lat_col).alias("_lat"),
        F.col(lng_col).alias("_lng"),
        b.alias("_home"),
    )
    probe = base.select(
        F.col("_k").alias("key_a"),
        F.col("_id").alias("id_a"),
        F.col("_us").alias("us_a"),
        F.col("_lat").alias("lat_a"),
        F.col("_lng").alias("lng_a"),
        F.explode(
            F.array(F.col("_home") - 1, F.col("_home"), F.col("_home") + 1)
        ).alias("_bucket"),
    )
    build = base.select(
        F.col("_k").alias("key_b"),
        F.col("_id").alias("id_b"),
        F.col("_us").alias("us_b"),
        F.col("_lat").alias("lat_b"),
        F.col("_lng").alias("lng_b"),
        F.col("_home").alias("_bucket"),
    )
    pairs = probe.join(build, "_bucket").where(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("key_a") != F.col("key_b"))
        & (
            F.abs(F.col("us_b") - F.col("us_a"))
            <= F.lit(window_seconds * 1_000_000)
        )
    )
    dist = haversine_rad(
        F.col("lat_a"), F.col("lng_a"), F.col("lat_b"), F.col("lng_b")
    )
    return (
        pairs.withColumn("dist_rad", dist)
        .where(F.col("dist_rad") <= radius_rad)
        .select(
            "key_a",
            "id_a",
            "key_b",
            "id_b",
            (F.col("us_b") - F.col("us_a")).alias("dt_us"),
            "dist_rad",
        )
    )


def cotravel_pairs(
    points: DataFrame,
    level: int = 6,
    bucket_seconds: int = 21600,
    min_buckets: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    cell_col: str = "cell_id",
) -> DataFrame:
    """Co-travel mining: unordered user pairs repeatedly co-located in
    the same level-``level`` S2 cell during the same time bucket, in at
    least ``min_buckets`` DISTINCT buckets — the convoy/companion
    pattern (colocation_join finds single encounters; this finds
    sustained ones).

    Plan: project each observation to its (user, cell, bucket) visit and
    DEDUPLICATE (a user dwelling in one cell for a whole bucket is one
    visit — dedup also caps the self-join's per-group row count at the
    distinct-user count of that (cell, bucket)); equi-self-join on
    (cell, bucket) with user_a < user_b; one (pair) aggregation counting
    distinct buckets. Pair candidates are quadratic only in per-(cell,
    bucket) DISTINCT users — the operator's documented density bound;
    for megacity cells at web scale, drop to a finer level or shorter
    bucket (both shrink the group) rather than sampling, which breaks
    the >= min_buckets semantics.

    Output: (user_a, user_b, n_buckets, n_cells) — distinct co-buckets
    and distinct co-cells per pair.
    """
    from .pages import s2_parent_sql

    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    visits = points.select(
        F.col(user_col).alias("u"),
        s2_parent_sql(F.col(cell_col), level).alias("cell"),
        F.floor(us / F.lit(int(bucket_seconds) * 1_000_000)).alias("bucket"),
    ).distinct()
    a = visits.select(F.col("u").alias("user_a"), "cell", "bucket")
    b = visits.select(F.col("u").alias("user_b"), "cell", "bucket")
    return (
        a.join(b, ["cell", "bucket"])
        .where(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.countDistinct("bucket").alias("n_buckets"),
            F.countDistinct("cell").alias("n_cells"),
        )
        .where(F.col("n_buckets") >= min_buckets)
    )


def knox_spacetime(
    points: DataFrame,
    space_radius_deg: float,
    time_window_sec: int,
    point_key: str = "key",
    time_col: str = "ts",
    cell_col: str = "cell_id",
) -> DataFrame:
    """Knox space-time interaction statistic over a point-event table —
    the classic epidemiology/incident-analysis test for whether events
    that are close in space are ALSO close in time (disease clusters,
    coordinated posting, crime series).

    Over all n(n-1)/2 unordered pairs:
        Ns = #pairs with angle-distance <= radius        (space-close)
        Nt = #pairs with |t_i - t_j| <= window           (time-close)
        X  = #pairs close in BOTH
        E[X] under independence = Ns * Nt / Npairs;  ratio = X / E[X].

    Plan — NO quadratic pass anywhere:
      * Ns, X from the engine's cell-blocked within-radius self-join
        (distance_join: MinWidth level + 3x3 neighborhood equi-join,
        exact atan2 refine), with event times joined back onto the
        surviving pairs only.
      * Nt from a time-block self-join: block = floor(epoch / window);
        the probe side explodes to {blk-1, blk, blk+1} so every
        qualifying pair is found exactly once under the key_a < key_b
        canonical order, then the exact |dt| <= window filter runs on
        BIGINT epoch seconds.
    Both joins are shuffle hash joins on bounded-fanout keys; output is
    a single aggregated row. Exactness: all counts are exact integers;
    the two ratios are fixed-order double expressions.
    """
    from .joins import distance_join

    n_points = points.count()
    n_pairs = n_points * (n_points - 1) // 2

    # TZ-independent integer epoch seconds (unix_timestamp() shifts NTZ
    # values by the session timezone; timestampdiff does not)
    epoch = (
        F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {time_col})"
        )
        / 1_000_000
    ).cast("long")
    keyed = points.select(
        F.col(point_key).alias("_k"), epoch.alias("_t")
    )

    # --- space-close pairs (engine blocked join), then time attach ----
    sp = distance_join(
        points, space_radius_deg, point_key=point_key, cell_col=cell_col
    ).select("key_a", "key_b")
    sp = (
        sp.join(
            keyed.select(F.col("_k").alias("key_a"), F.col("_t").alias("_ta")),
            "key_a",
        )
        .join(
            keyed.select(F.col("_k").alias("key_b"), F.col("_t").alias("_tb")),
            "key_b",
        )
    )
    w = int(time_window_sec)
    sp_agg = sp.agg(
        F.count("*").alias("ns"),
        F.sum(
            F.when(
                F.abs(F.col("_ta") - F.col("_tb")) <= w, F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("x_both"),
    )

    # --- time-close pairs (block self-join, each pair found once) -----
    blk = F.floor(F.col("_t") / F.lit(w)).cast("long")
    probe = keyed.select(
        F.col("_k").alias("key_a"),
        F.col("_t").alias("_ta"),
        F.explode(
            F.array(blk - 1, blk, blk + 1)
        ).alias("_blk"),
    )
    build = keyed.select(
        F.col("_k").alias("key_b"),
        F.col("_t").alias("_tb"),
        blk.alias("_blk"),
    )
    nt_agg = (
        probe.join(build, "_blk")
        .where(
            (F.col("key_a") < F.col("key_b"))
            & (F.abs(F.col("_ta") - F.col("_tb")) <= w)
        )
        .agg(F.count("*").alias("nt"))
    )

    j = sp_agg.crossJoin(F.broadcast(nt_agg))
    expected = (
        F.col("ns").cast("double")
        * F.col("nt").cast("double")
        / F.lit(float(n_pairs))
    )
    return j.select(
        F.lit(n_points).cast("long").alias("n_points"),
        F.lit(n_pairs).cast("long").alias("n_pairs"),
        F.col("ns").cast("long").alias("ns"),
        F.col("nt").cast("long").alias("nt"),
        F.col("x_both").cast("long").alias("x_both"),
        expected.alias("expected"),
        (F.col("x_both").cast("double") / expected).alias("knox_ratio"),
    )


def acf_counts(
    series: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Sample autocorrelation function per key at lags 1..max_lag over an
    integer-valued ordered series (e.g. daily event counts) — the
    periodicity probe a monitoring pipeline runs per tile/type.

        acf_k = sum_{t>k} (x_t - xbar)(x_{t-k} - xbar) / sum (x - xbar)^2

    computed from INTEGER sufficient statistics only (expanded form:
    P_k - xbar*S1_k - xbar*S2_k + m_k*xbar^2 over Sxx - n*xbar^2, with
    P_k = sum x_t x_{t-k}, S1/S2 the one-sided sums, m_k = n - k), so
    both engines aggregate exact BIGINTs and the final expression is one
    fixed-order double — bit-identical cross-engine.

    Plan: one window lag per k over (key, order) — max_lag tiny and
    static — then ONE map-side-combined groupBy(key). No self-joins.
    """
    from pyspark.sql import Window

    s = series.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).alias("_o"),
        F.col(value_col).cast("long").alias("_x"),
    )
    win = Window.partitionBy("_k").orderBy("_o")
    lag_cols = {}
    for k in range(1, max_lag + 1):
        lag_cols[k] = F.lag("_x", k).over(win).alias(f"_l{k}")
    s = s.select("_k", "_x", *lag_cols.values())
    aggs = [
        F.count("*").alias("n_obs"),
        F.sum("_x").alias("sx"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"_l{k}")
        has = lk.isNotNull()
        aggs += [
            F.sum(F.when(has, F.col("_x") * lk).otherwise(F.lit(0))).alias(f"p{k}"),
            F.sum(F.when(has, F.col("_x")).otherwise(F.lit(0))).alias(f"s1_{k}"),
            F.sum(F.when(has, lk).otherwise(F.lit(0))).alias(f"s2_{k}"),
            F.sum(F.when(has, F.lit(1)).otherwise(F.lit(0))).alias(f"m{k}"),
        ]
    g = s.groupBy("_k").agg(*aggs)
    nd = F.col("n_obs").cast("double")
    xb = F.col("sx").cast("double") / nd
    den = F.col("sxx").cast("double") - nd * xb * xb
    rows = []
    for k in range(1, max_lag + 1):
        num = (
            F.col(f"p{k}").cast("double")
            - xb * F.col(f"s1_{k}").cast("double")
            - xb * F.col(f"s2_{k}").cast("double")
            + F.col(f"m{k}").cast("double") * xb * xb
        )
        rows.append(
            F.struct(
                F.lit(k).cast("int").alias("lag"),
                (num / den).alias("acf"),
            )
        )
    return g.select(
        F.col("_k").alias(key_col),
        F.col("n_obs"),
        F.explode(F.array(*rows)).alias("_r"),
    ).select(
        key_col, "n_obs", F.col("_r.lag").alias("lag"), F.col("_r.acf").alias("acf")
    )


def dtw_distance_col(a: Column, b: Column) -> Column:
    """Dynamic-time-warping distance between two integer-valued ordered
    series held as array<long> columns, |x - y| local cost — the
    alignment-tolerant series similarity (compare daily-count shapes
    that are shifted/stretched in time).

        D(i,j) = |a_i - b_j| + min(D(i-1,j), D(i-1,j-1), D(i,j-1))

    as a nested Catalyst fold (outer walks a carrying the previous DP
    row; inner builds the next row left-to-right — each cell needs its
    left neighbor). The 1e18 pad plays -inf-free sentinel; costs are
    |int - int| cast to double, additions in one fixed order — the
    DuckDB list_reduce replay is bit-identical. O(m*n) arithmetic per
    pair inside codegen, no shuffle, no Python.
    """
    big = F.lit(1.0e18)
    init = F.concat(F.array(F.lit(0.0)), F.transform(b, lambda _: big))
    dp = F.aggregate(
        a,
        init,
        lambda R, x: F.aggregate(
            b,
            F.array(big),
            lambda N, y: F.concat(
                N,
                F.array(
                    F.abs(x.cast("double") - y.cast("double"))
                    + F.least(
                        F.element_at(R, F.size(N) + 1),
                        F.element_at(R, F.size(N)),
                        F.element_at(N, F.size(N)),
                    )
                ),
            ),
        ),
    )
    return F.element_at(dp, -1)


def seasonal_naive_mase(
    events: DataFrame,
    period: int = 7,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Seasonal-naive forecast error per series — the forecasting-
    baseline scorer (Hyndman's MASE denominator IS this baseline): for
    each key's daily-count series, 'forecast' day t as the count at
    t - period, and report

        mae_seasonal : mean |c_t - c_{t-period}|  over days where both exist
        mae_naive    : mean |c_t - c_{t-1}|       (the lag-1 random walk)
        mase         : mae_seasonal / mae_naive

    A series a seasonal model can't beat (mase >= 1) has no weekly
    structure worth modeling. All numerators/denominators are exact
    BIGINT sums over integer counts joined by exact integer day
    arithmetic (epoch-day lags, no calendar functions); each mean and
    the final ratio are single divisions — bit-identical cross-engine.

    Plan: one (key, day) aggregation, two self equi-joins on (key,
    day - lag) — co-partitioned on the key — and one key agg.
    """
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    daily = (
        events.select(
            F.col(type_col).alias("k"),
            F.floor(us / 86_400_000_000).cast("long").alias("day"),
        )
        .groupBy("k", "day")
        .agg(F.count("*").alias("c"))
    )

    def _lag_join(lag: int, tag: str):
        prev = daily.select(
            "k", (F.col("day") + lag).alias("day"), F.col("c").alias("cp")
        )
        j = daily.join(prev, ["k", "day"])
        return j.groupBy("k").agg(
            F.count("*").alias(f"n_{tag}"),
            F.sum(F.abs(F.col("c") - F.col("cp"))).alias(f"abs_{tag}"),
        )

    season = _lag_join(period, "seasonal")
    naive = _lag_join(1, "naive")
    out = season.join(naive, "k")
    mae_s = F.col("abs_seasonal").cast("double") / F.col("n_seasonal").cast(
        "double"
    )
    mae_n = F.col("abs_naive").cast("double") / F.col("n_naive").cast("double")
    return out.select(
        F.col("k").alias(type_col),
        "n_seasonal",
        "abs_seasonal",
        "n_naive",
        "abs_naive",
        F.round(mae_s, 9).alias("mae_seasonal"),
        F.round(mae_n, 9).alias("mae_naive"),
        F.round(
            F.when(mae_n > 0.0, mae_s / mae_n).otherwise(F.lit(0.0)), 9
        ).alias("mase"),
    )


def holt_winters(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    period: int = 7,
    alpha: float = 0.25,
    beta: float = 0.125,
    gamma: float = 0.5,
) -> DataFrame:
    """Additive Holt-Winters triple exponential smoothing per group —
    the seasonal big sibling of the Holt pair-state fold: level, trend,
    AND a rotating ``period``-slot seasonal register advance through one
    sequential F.aggregate lambda.

    State is a flat array<double> [l, b, s1..s_p] (s1 = the seasonal
    that applies to the NEXT observation). Init from the first value:
    l = x1, b = 0, s = 0 (additive zero-season cold start). Update:

        l' = alpha*(x - s1) + (1-alpha)*(l + b)
        b' = beta*(l' - l) + (1-beta)*b
        s' = gamma*(x - l') + (1-gamma)*s1
        state' = [l', b', s2..s_p, s']      (seasonal register rotates)

    Catalyst struct-fold lambdas rebind later fields to already-computed
    earlier ones, so — exactly like the Holt fold — l' is re-derived
    textually inside b' and s' from OLD state only; the DuckDB
    list_reduce replay uses the identical expression text, making every
    double bit-identical cross-engine. One group-keyed shuffle; the fold
    is JVM-side codegen.

    Output: (group..., n_obs, level, trend, season_next, forecast_1)
    with forecast_1 = level + trend + season_next.
    """
    a, na = float(alpha), 1.0 - alpha
    bt, nbt = float(beta), 1.0 - beta
    g, ng = float(gamma), 1.0 - gamma

    grouped = df.groupBy(*group_cols).agg(
        F.count("*").alias("n_obs"),
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col), F.col(value_col)))
        ).alias("_xs"),
    )
    # every element becomes a (2+period)-wide state vector [x, 0, ...];
    # the FIRST element doubles as the init state (l=x1, b=0, s=0)
    sts = F.transform(
        "_xs",
        lambda s: F.concat(
            F.array(s[value_col].cast("double")),
            F.array_repeat(F.lit(0.0), period + 1),
        ),
    ).alias("_sts")

    def lp(acc, x):
        return (
            F.lit(a) * (x - F.element_at(acc, 3))
            + F.lit(na) * (F.element_at(acc, 1) + F.element_at(acc, 2))
        )

    def step(acc, e):
        x = F.element_at(e, 1)
        l_new = lp(acc, x)
        b_new = (
            F.lit(bt) * (lp(acc, x) - F.element_at(acc, 1))
            + F.lit(nbt) * F.element_at(acc, 2)
        )
        s_new = (
            F.lit(g) * (x - lp(acc, x)) + F.lit(ng) * F.element_at(acc, 3)
        )
        return F.concat(
            F.array(l_new, b_new),
            F.slice(acc, 4, period - 1),
            F.array(s_new),
        )

    withs = grouped.select(*group_cols, "n_obs", sts)
    st = F.aggregate(
        F.slice("_sts", 2, F.col("n_obs").cast("int") - 1),
        F.element_at("_sts", 1),
        step,
    )
    return withs.select(
        *group_cols,
        "n_obs",
        F.round(st.getItem(0), 6).alias("level"),
        F.round(st.getItem(1), 6).alias("trend"),
        F.round(st.getItem(2), 6).alias("season_next"),
        F.round(
            st.getItem(0) + st.getItem(1) + st.getItem(2), 6
        ).alias("forecast_1"),
    )


def rank_correlation(
    pairs: DataFrame,
    key_col: str,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Spearman rank correlation per key over paired observations —
    computed as Pearson over tie-averaged ranks (the textbook tie-safe
    form). The monitoring question behind it: "do these two event
    streams co-move day by day?", robust to monotone scale differences
    that break raw Pearson.

    Exactness: the average rank of a value is rank() + (ties-1)/2 — a
    half-integer, exactly representable. With n <= a few thousand the
    rank products stay inside the double integer window, so the Pearson
    sufficient statistics (sum r, sum r^2, sum ra*rb) are EXACT in both
    engines and the final rho is one fixed-order double expression.

    Plan: two rank windows + one map-side-combined groupBy(key); no
    self-joins. At 10^12 rows the window sort shards by key — skew only
    matters if one key dominates, the usual per-series cardinality here.
    """
    from pyspark.sql import Window

    p = pairs.select(
        F.col(key_col).alias("_k"),
        F.col(a_col).cast("double").alias("_a"),
        F.col(b_col).cast("double").alias("_b"),
    )

    def _avg_rank(col: str) -> F.Column:
        w = Window.partitionBy("_k").orderBy(col)
        wt = Window.partitionBy("_k", col)
        return F.rank().over(w) + (F.count("*").over(wt) - F.lit(1)) / 2.0

    r = p.select(
        "_k", _avg_rank("_a").alias("_ra"), _avg_rank("_b").alias("_rb")
    )
    agg = r.groupBy("_k").agg(
        F.count("*").alias("n_obs"),
        F.sum("_ra").alias("_sa"),
        F.sum("_rb").alias("_sb"),
        F.sum(F.col("_ra") * F.col("_ra")).alias("_saa"),
        F.sum(F.col("_rb") * F.col("_rb")).alias("_sbb"),
        F.sum(F.col("_ra") * F.col("_rb")).alias("_sab"),
    )
    n = F.col("n_obs").cast("double")
    cov = n * F.col("_sab") - F.col("_sa") * F.col("_sb")
    va = n * F.col("_saa") - F.col("_sa") * F.col("_sa")
    vb = n * F.col("_sbb") - F.col("_sb") * F.col("_sb")
    rho = F.when(va * vb > 0, cov / F.sqrt(va * vb)).otherwise(F.lit(None))
    return agg.select(
        F.col("_k").alias(key_col), "n_obs", F.round(rho, 9).alias("spearman_rho")
    )


def ks_two_sample(
    samples: DataFrame,
    key_col: str,
    side_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per key: the sup-norm
    distance between the two empirical CDFs — the standard distribution-
    drift gate between cohorts (A/B arms, this-week vs last-week).

    Exactness: D is computed as max |cum1*n2 - cum2*n1| over BIGINT
    cumulative counts grouped BY VALUE (so cross-sample ties advance both
    CDFs before the difference is taken — the correct ECDF convention),
    divided once at the end: D = max_int / (n1*n2). Integer max, one
    division — bit-identical cross-engine.

    Plan: groupBy(key, value) count pivot -> one cumulative window per
    key -> map-side max. One shuffle on key; linear in distinct values.
    ``side_col`` must be 0/1.
    """
    from pyspark.sql import Window

    s = samples.select(
        F.col(key_col).alias("_k"),
        F.col(side_col).cast("int").alias("_s"),
        F.col(value_col).alias("_v"),
    )
    byval = s.groupBy("_k", "_v").agg(
        F.sum(F.when(F.col("_s") == 0, 1).otherwise(0)).alias("_c0"),
        F.sum(F.when(F.col("_s") == 1, 1).otherwise(0)).alias("_c1"),
    )
    w = Window.partitionBy("_k").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wfull = Window.partitionBy("_k")
    cum = byval.select(
        "_k",
        F.sum("_c0").over(w).alias("_f0"),
        F.sum("_c1").over(w).alias("_f1"),
    ).select(
        "_k",
        "_f0",
        "_f1",
        F.max("_f0").over(wfull).alias("_n0"),
        F.max("_f1").over(wfull).alias("_n1"),
    )
    agg = cum.groupBy("_k").agg(
        F.max("_n0").alias("n0"),
        F.max("_n1").alias("n1"),
        F.max(
            F.abs(F.col("_f0") * F.col("_n1") - F.col("_f1") * F.col("_n0"))
        ).alias("_dnum"),
    )
    return agg.select(
        F.col("_k").alias(key_col),
        "n0",
        "n1",
        F.round(
            F.col("_dnum").cast("double")
            / (F.col("n0").cast("double") * F.col("n1").cast("double")),
            9,
        ).alias("ks_d"),
    )


def ma_decompose(
    series: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical moving-average seasonal decomposition per key (the STL-
    lite a dashboard runs per tile/type): trend = centered ``period``-row
    average over the ordered INTEGER series, seasonal = per-phase mean of
    the detrended values, remainder = what's left. Returns one row per
    (key, phase) with the seasonal component plus per-key remainder
    variance — the "is this series seasonal or noisy" summary.

    Exactness: with integer inputs the detrended value is the rational
    (period*x - S)/period with BIGINT numerator; phase means sum those
    numerators EXACTLY and divide once. The remainder variance is a sum
    of squared doubles (no cancellation: squares are nonnegative), well
    inside the 1e-9 gate both engines share.

    Plan: one centered window + two map-side-combined groupBys, all on
    the key shuffle. ``period`` must be odd (centered window).
    """
    from pyspark.sql import Window

    assert period % 2 == 1, "centered MA needs an odd period"
    half = period // 2
    s = series.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).alias("_o"),
        F.col(value_col).cast("long").alias("_x"),
    )
    w = Window.partitionBy("_k").orderBy("_o").rowsBetween(-half, half)
    t = s.select(
        "_k",
        "_o",
        "_x",
        F.sum("_x").over(w).alias("_S"),
        F.count("*").over(w).alias("_wn"),
    ).where(F.col("_wn") == period)
    # detrended numerator: period*x - S  (exact BIGINT)
    t = t.select(
        "_k",
        "_o",
        (F.col("_x") * period - F.col("_S")).alias("_dnum"),
        (F.col("_o") % period).alias("_phase"),
    )
    seas = t.groupBy("_k", "_phase").agg(
        F.count("*").alias("_pn"), F.sum("_dnum").alias("_psum")
    )
    joined = t.join(seas, ["_k", "_phase"])
    # remainder = dnum/period - psum/(period*pn)  (doubles, fixed order)
    rem = (
        F.col("_dnum").cast("double") / float(period)
        - F.col("_psum").cast("double")
        / (float(period) * F.col("_pn").cast("double"))
    )
    remvar = joined.groupBy("_k").agg(
        F.count("*").alias("_rn"), F.sum(rem * rem).alias("_rss")
    )
    out = (
        seas.join(remvar, "_k")
        .select(
            F.col("_k").alias(key_col),
            F.col("_phase").alias("phase"),
            F.col("_pn").alias("n_phase"),
            F.round(
                F.col("_psum").cast("double")
                / (float(period) * F.col("_pn").cast("double")),
                9,
            ).alias("seasonal"),
            F.round(F.col("_rss") / F.col("_rn").cast("double"), 9).alias(
                "remainder_msq"
            ),
        )
    )
    return out


def grubbs_stat(
    values: DataFrame,
    key_col: str,
    id_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Grubbs' outlier statistic per key: G = max|x - mean| / sd with the
    arg-max row identified — "which single reading is most suspicious,
    and is it beyond the critical band".

    Exactness: values are first quantized to integers (``round(x*scale)``
    — cents for money-like doubles), so |n*x - S| is an exact BIGINT
    numerator, the arg-max is an INTEGER comparison (no float-tie
    nondeterminism cross-engine), and mean/sd come from exact integer
    sufficient statistics with one fixed-order double expression at the
    end.

    Plan: one map-side-combined groupBy for (n, S, Sxx) + one max-struct
    pass for the arg-max — two scans, zero joins beyond the stat
    broadcast, zero windows.
    """
    v = values.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_id"),
        F.round(F.col(value_col) * scale).cast("long").alias("_x"),
    )
    stats = v.groupBy("_k").agg(
        F.count("*").alias("_n"),
        F.sum("_x").alias("_S"),
        F.sum(F.col("_x") * F.col("_x")).alias("_Sxx"),
    )
    j = v.join(F.broadcast(stats), "_k")
    dev = F.abs(F.col("_n") * F.col("_x") - F.col("_S"))
    top = j.groupBy("_k").agg(
        F.max(F.struct(dev.alias("_d"), F.col("_id").alias("_i"))).alias("_m")
    )
    out = stats.join(top, "_k")
    n = F.col("_n").cast("double")
    var_num = n * F.col("_Sxx").cast("double") - F.col("_S").cast(
        "double"
    ) * F.col("_S").cast("double")
    sd = F.sqrt(var_num / (n * (n - 1.0)))
    g = F.when(
        var_num > 0, (F.col("_m._d").cast("double") / n) / sd
    ).otherwise(F.lit(None))
    return out.select(
        F.col("_k").alias(key_col),
        F.col("_n").alias("n_obs"),
        F.col("_m._i").alias("flagged_id"),
        F.round(g, 9).alias("grubbs_g"),
    )


def page_hinkley(
    series: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    delta: float = 0.0,
    lam: float = 25.0,
) -> DataFrame:
    """Page-Hinkley mean-drift detector per key over an ordered INTEGER
    series (daily counts): PH_t = sum_{i<=t} (x_i - mean_{1..i} - delta),
    alarm at the first t where PH_t - min_{s<=t} PH_s > lambda. The
    streaming change-detector run per tile/type to catch level shifts.

    Exactness: each term is (i*x_i - S_i)/i - delta with BIGINT i*x-S
    (running sums over an ORDERED window are evaluated in frame order by
    both engines, so the double accumulation sequence is identical), and
    the alarm row is selected by integer order — deterministic
    cross-engine.

    Plan: three stacked running windows over one (key, order) sort — one
    shuffle, no joins.
    """
    from pyspark.sql import Window

    s = series.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).alias("_o"),
        F.col(value_col).cast("long").alias("_x"),
    )
    run = Window.partitionBy("_k").orderBy("_o").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = s.select(
        "_k",
        "_o",
        (
            (
                F.row_number()
                .over(Window.partitionBy("_k").orderBy("_o"))
                * F.col("_x")
                - F.sum("_x").over(run)
            ).cast("double")
            / F.row_number()
            .over(Window.partitionBy("_k").orderBy("_o"))
            .cast("double")
            - F.lit(float(delta))
        ).alias("_t0"),
    )
    # quantize terms so both engines sum IDENTICAL doubles (running-frame
    # accumulation order is sequential in both, association drift ~1e-16)
    s = s.select(
        "_k",
        "_o",
        F.round("_t0", 9).alias("_term"),
    )
    s = s.select("_k", "_o", F.sum("_term").over(run).alias("_ph"))
    s = s.select(
        "_k", "_o", "_ph", F.min("_ph").over(run).alias("_phmin")
    )
    alarm = (
        s.where(F.col("_ph") - F.col("_phmin") > float(lam))
        .groupBy("_k")
        .agg(F.min("_o").alias("alarm_at"))
    )
    summary = s.groupBy("_k").agg(
        F.count("*").alias("n_obs"),
        F.round(F.max(F.col("_ph") - F.col("_phmin")), 6).alias("max_ph_rise"),
    )
    return (
        summary.join(alarm, "_k", "left")
        .select(
            F.col("_k").alias(key_col), "n_obs", "max_ph_rise", "alarm_at"
        )
    )


def gap_fill_linear(
    series: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Regularize a per-key daily series: materialize every calendar day
    between the key's first and last observation and linearly interpolate
    the missing days from the nearest present neighbors — the gap-fill a
    training pipeline runs before windowed features so "no data" and
    "zero" stop aliasing.

    Exactness: interpolation is prev + (next-prev)*(d-pd)/(nd-pd) over
    INTEGER day ordinals and integer values — one division, fixed order.
    Forward/backward carry uses the count-of-non-null grouping trick
    (no IGNORE NULLS dependence), identical in both engines.

    Plan: per-key day range via sequence+explode (no driver loop), one
    left join onto observations, two running windows for the carries.
    """
    from pyspark.sql import Window

    s = series.select(
        F.col(key_col).alias("_k"),
        F.col(day_col).cast("long").alias("_d"),
        F.col(value_col).cast("long").alias("_v"),
    )
    span = s.groupBy("_k").agg(
        F.min("_d").alias("_d0"), F.max("_d").alias("_d1")
    )
    days = span.select(
        "_k", F.explode(F.sequence("_d0", "_d1")).alias("_d")
    )
    g = days.join(s, ["_k", "_d"], "left")
    fwd = Window.partitionBy("_k").orderBy("_d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bwd = Window.partitionBy("_k").orderBy(F.col("_d").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = g.select(
        "_k",
        "_d",
        "_v",
        F.max(F.when(F.col("_v").isNotNull(), F.col("_d"))).over(fwd).alias("_pd"),
        F.min(F.when(F.col("_v").isNotNull(), F.col("_d"))).over(bwd).alias("_nd"),
    )
    byday = s.select(
        F.col("_k"), F.col("_d").alias("_rd"), F.col("_v").alias("_rv")
    )
    g = (
        g.join(
            byday.withColumnRenamed("_rd", "_pd").withColumnRenamed("_rv", "_pv"),
            ["_k", "_pd"],
            "left",
        )
        .join(
            byday.withColumnRenamed("_rd", "_nd").withColumnRenamed("_rv", "_nv"),
            ["_k", "_nd"],
            "left",
        )
    )
    filled = (
        F.when(F.col("_v").isNotNull(), F.col("_v").cast("double"))
        .when(
            F.col("_pd").isNull(), F.col("_nv").cast("double")
        )
        .when(F.col("_nd").isNull(), F.col("_pv").cast("double"))
        .otherwise(
            F.col("_pv").cast("double")
            + (F.col("_nv") - F.col("_pv")).cast("double")
            * (F.col("_d") - F.col("_pd")).cast("double")
            / (F.col("_nd") - F.col("_pd")).cast("double")
        )
    )
    return g.select(
        F.col("_k").alias(key_col),
        F.col("_d").alias("day_ord"),
        F.col("_v").isNull().alias("was_missing"),
        F.round(filled, 9).alias("filled_value"),
    )


# Gaussian equiprobable breakpoints for SAX alphabets (Lin et al. 2003,
# table 3) — written as full-precision literals so the engine CASE chain
# and a SQL oracle compare against the SAME doubles.
SAX_BREAKPOINTS: dict[int, tuple[float, ...]] = {
    3: (-0.4307272992954576, 0.4307272992954576),
    4: (-0.6744897501960817, 0.0, 0.6744897501960817),
    5: (-0.8416212335729143, -0.2533471031357997,
        0.2533471031357997, 0.8416212335729143),
}


def sax_symbols(
    series: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    word_len: int = 8,
    alphabet: int = 4,
) -> DataFrame:
    """SAX symbolization (Lin/Keogh 2003): z-normalize each key's ordered
    series, Piecewise-Aggregate-Approximate it into ``word_len`` frames,
    and map each frame mean to a letter by the Gaussian equiprobable
    breakpoints — the standard symbolic index for time-series motif /
    anomaly search at corpus scale.

    Exactness: frame assignment is INTEGER (floor(idx*word_len/n) over a
    dense row_number), and every accumulated quantity (series n, sum,
    sum-of-squares; frame count + sum) is a BIGINT — the z-scored PAA
    value is one fixed-order float expression per frame, so symbols are
    bit-identical cross-engine (breakpoint literals shared above).

    INPUT CONTRACT: ``value_col`` must be integer-valued — it is cast to
    long so the sufficient statistics stay exact BIGINTs (same contract
    as welch_t). Fractional inputs (e.g. rates) would be silently
    truncated by the cast; pre-scale them to integers (multiply by a
    fixed power of 10) before calling.

    Plan: one window (row_number + per-key totals) + one (key, frame)
    agg; linear, one shuffle on the key.

    Output: (key, frame, n_obs, paa_z, symbol) with symbol in
    'a'..chr(96+alphabet) ordered low to high.
    """
    from pyspark.sql import Window

    bps = SAX_BREAKPOINTS[alphabet]
    w = Window.partitionBy(key_col).orderBy(order_col)
    wfull = Window.partitionBy(key_col)
    x = F.col(value_col).cast("long")
    t = series.select(
        F.col(key_col).alias("_k"),
        x.alias("_x"),
        (F.row_number().over(w) - 1).alias("_idx"),
        F.count("*").over(wfull).alias("_n"),
        F.sum(x).over(wfull).alias("_sx"),
        F.sum(x * x).over(wfull).alias("_sxx"),
    ).select(
        "_k",
        "_x",
        "_n",
        "_sx",
        "_sxx",
        F.floor(F.col("_idx") * word_len / F.col("_n")).alias("_f"),
    )
    agg = t.groupBy("_k", "_f").agg(
        F.count("*").alias("n_obs"),
        F.sum("_x").alias("_fs"),
        F.max("_n").alias("_n"),
        F.max("_sx").alias("_sx"),
        F.max("_sxx").alias("_sxx"),
    )
    n = F.col("_n").cast("double")
    mean = F.col("_sx").cast("double") / n
    var_num = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
        "double"
    )
    sd = F.sqrt(var_num) / n
    paa = F.col("_fs").cast("double") / F.col("n_obs").cast("double")
    z = F.when(sd > 0, (paa - mean) / sd)
    expr = None
    for i, bp in enumerate(bps):
        cond = z < F.lit(float(bp))
        letter_i = F.lit(chr(ord("a") + i))
        expr = F.when(cond, letter_i) if expr is None else expr.when(cond, letter_i)
    expr = expr.otherwise(F.lit(chr(ord("a") + len(bps))))
    sym = F.when(z.isNotNull(), expr)
    return agg.select(
        F.col("_k").alias(key_col),
        F.col("_f").alias("frame"),
        "n_obs",
        F.round(z, 9).alias("paa_z"),
        sym.alias("symbol"),
    )
