"""Spatial point-pattern statistics over S2 cell grids.

Getis-Ord Gi* hotspot z-scores and Ripley's K function, expressed as
pure DataFrame plans over the engine's cell/distance primitives — the
standard exploratory statistics a geo analyst runs over a web-scale
point extraction (geoparsed pages, check-ins, events) before deciding
where to drill down.

Both operators are built from INTEGER sufficient statistics (counts and
count-sums) so their results are exactly reproducible cross-engine: the
only floating-point work is one fixed-order scalar expression at the
very end.

Reference parity: the cell grid and 4-neighbor topology are gos2's
(EdgeNeighbors, cellid.go:210-220); the distance kernel is the angle
distance atan2(|a x b|, a . b) (r3/vector.go:96-98) reused from
``joins.distance_join``.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def getis_ord_gistar(
    counts: DataFrame,
    cell_col: str = "cell",
    count_col: str = "n",
) -> DataFrame:
    """Per-cell Getis-Ord Gi* z-score with binary self+4-edge-neighbor
    weights over the OCCUPIED cells of one S2 level.

    ``counts`` holds one row per occupied cell: (cell_col: biased int64
    cell id at a single level, count_col: integer attribute, e.g. point
    count). The statistic per cell i with weights w_ij = 1 for j in
    {i} union edge_neighbors(i) intersect occupied:

        Gi* = (S_i - xbar * W_i) / (s * sqrt((n*W_i - W_i^2) / (n - 1)))

    with S_i = sum_j w_ij x_j, W_i = sum_j w_ij, xbar = sum x / n,
    s = sqrt(sum x^2 / n - xbar^2). |Gi*| > ~2 flags hot/cold spots.

    Exactness: S_i, W_i, n, sum x, sum x^2 are all BIGINTs aggregated
    exactly; Gi* is one fixed-order double expression over them, so the
    result is bit-identical cross-engine (no float-sum-order exposure).

    Scale shape (10^9 occupied cells): one bounded 4x neighbor explode,
    one co-partitioned hash join + keyed agg, one broadcast of the 1-row
    global moment table. No driver traffic, no windows.
    """
    from .functions import s2_edge_neighbors

    nbr = counts.select(
        F.col(cell_col).alias("_ci"),
        F.explode(s2_edge_neighbors(F.col(cell_col))).alias("_cj"),
    )
    occ = counts.select(
        F.col(cell_col).alias("_cj"), F.col(count_col).alias("_xj")
    )
    nj = (
        nbr.join(occ, "_cj")
        .groupBy("_ci")
        .agg(
            F.count("*").alias("_w_nbrs"),
            F.sum("_xj").alias("_nbr_sum"),
        )
    )
    per = (
        counts.join(nj, counts[cell_col] == nj["_ci"], "left")
        .select(
            F.col(cell_col),
            F.col(count_col).cast("long").alias("x_count"),
            (F.coalesce(F.col("_w_nbrs"), F.lit(0)) + F.lit(1))
            .cast("long")
            .alias("w_i"),
            (
                F.coalesce(F.col("_nbr_sum"), F.lit(0))
                + F.col(count_col)
            )
            .cast("long")
            .alias("local_sum"),
        )
    )
    glob = counts.agg(
        F.count("*").alias("n_cells"),
        F.sum(count_col).alias("sx"),
        F.sum(F.col(count_col) * F.col(count_col)).alias("sxx"),
    )
    j = per.crossJoin(F.broadcast(glob))
    n_d = F.col("n_cells").cast("double")
    xb = F.col("sx").cast("double") / n_d
    s = F.sqrt(F.col("sxx").cast("double") / n_d - xb * xb)
    w_d = F.col("w_i").cast("double")
    gi = (F.col("local_sum").cast("double") - xb * w_d) / (
        s * F.sqrt((n_d * w_d - w_d * w_d) / (n_d - F.lit(1.0)))
    )
    return j.select(
        cell_col, "x_count", "w_i", "local_sum", gi.alias("gi_star")
    )


def ripley_k(
    points: DataFrame,
    radii_rad: Sequence[float],
    point_key: str = "key",
    cell_col: str = "cell_id",
) -> DataFrame:
    """Ripley's K function of a spherical point pattern at the given
    angular radii: K(r) = A * #{ordered pairs with d <= r} / (n*(n-1))
    with A = 4*pi (whole-sphere study region, steradians). K(r) above
    the CSR expectation pi*r^2 indicates clustering at scale r.

    Pair counting runs through ``joins.distance_join`` at max(radii) —
    the cell-blocked within-radius join (3x3 neighborhood explode + hash
    equi-join + codegen exact filter), NEVER an all-pairs product — then
    one conditional aggregation buckets each surviving pair into every
    radius it satisfies. Pair counts are exact BIGINTs; K is one final
    double expression per radius.

    Output: (r_rad, n_points, n_pairs, k_hat, csr_pi_r2) ordered by r.
    """
    from .joins import distance_join

    rmax = max(radii_rad)
    pairs = distance_join(
        points,
        radius_deg=math.degrees(rmax),
        point_key=point_key,
        cell_col=cell_col,
    )
    n_df = points.agg(F.count("*").alias("n_points"))
    aggs = [
        F.sum(
            (F.col("dist_rad") <= F.lit(float(r))).cast("long")
        ).alias(f"_c{i}")
        for i, r in enumerate(radii_rad)
    ]
    cnt = pairs.agg(*aggs).crossJoin(F.broadcast(n_df))
    rows = None
    for i, r in enumerate(radii_rad):
        n_d = F.col("n_points").cast("double")
        # unordered pairs from the self-join -> ordered pair count is 2x
        k_hat = (
            F.lit(4.0 * math.pi)
            * (F.lit(2.0) * F.coalesce(F.col(f"_c{i}"), F.lit(0)).cast("double"))
            / (n_d * (n_d - F.lit(1.0)))
        )
        one = cnt.select(
            F.lit(float(r)).alias("r_rad"),
            F.col("n_points").cast("long").alias("n_points"),
            F.coalesce(F.col(f"_c{i}"), F.lit(0)).cast("long").alias("n_pairs"),
            k_hat.alias("k_hat"),
            (F.lit(math.pi) * F.lit(float(r)) * F.lit(float(r))).alias(
                "csr_pi_r2"
            ),
        )
        rows = one if rows is None else rows.union(one)
    return rows


def clark_evans(
    points: DataFrame,
    point_key: str = "key",
    cell_col: str = "cell_id",
) -> DataFrame:
    """Clark-Evans nearest-neighbor index over a spherical point set.

    R = observed mean NN distance / expected mean NN distance under CSR
    (complete spatial randomness): R << 1 clustered, ~1 random, ~2.15
    maximally dispersed. The planar expectation 0.5 / sqrt(lambda) is
    used with lambda = n / 4pi (points per steradian) and distances in
    radians — the convention the oracle replays.

    Per-point NN distances come from the distributed cap-doubling kNN
    (``joins.knn_join_df`` with k=2 against the set itself; self-matches
    drop and the min over the remaining candidates is exact for any
    geometry — rank 1 may be the self row at distance 0). Everything
    after is one global aggregation: no windows, no driver loops.

    Output: ONE row (n_points, mean_nn_rad, expected_rad, r_index).
    """
    from .joins import knn_join_df

    qs = points.select(
        F.col(point_key).alias("qid"),
        F.col("lat"),
        F.col("lng"),
        F.col(cell_col),
    )
    nn = knn_join_df(
        points, qs, k=2, point_key=point_key, query_key="qid",
        cell_col=cell_col,
    )
    d = (
        nn.where(F.col("qid") != F.col(point_key))
        .groupBy("qid")
        .agg(F.min("dist_rad").alias("nn_rad"))
    )
    agg = d.agg(
        F.count("*").alias("n_points"),
        F.sum("nn_rad").alias("_s"),
    )
    n_d = F.col("n_points").cast("double")
    mean_nn = F.col("_s") / n_d
    expected = F.lit(0.5) / F.sqrt(n_d / F.lit(4.0 * math.pi))
    return agg.select(
        F.col("n_points").cast("long").alias("n_points"),
        F.round(mean_nn, 9).alias("mean_nn_rad"),
        F.round(expected, 9).alias("expected_rad"),
        F.round(mean_nn / expected, 9).alias("r_index"),
    )


def k_anonymity_levels(
    points: DataFrame,
    k: int,
    levels: Sequence[int] = (4, 6, 8, 10, 12),
    point_key: str = "key",
    cell_col: str = "cell_id",
) -> DataFrame:
    """Spatial k-anonymity generalization: the FINEST S2 level at which
    each point's ancestor cell still holds >= k points.

    The location-privacy primitive for publishing a point extraction:
    report each point at the finest cell that k-anonymizes it, or
    suppress (level -1) when even the coarsest candidate level fails.

    Plan: one explode of each point to its |levels| ancestor keys ->
    one map-side-combined (level, cell) count -> one hash join back on
    the exploded keys -> max(level meeting k) per point. Shuffle volume
    is |levels| * n rows of two longs; no per-level driver loop, no
    window over the raw points.

    Output: (level, n_points) histogram of chosen levels, level -1 =
    suppressed.
    """
    from .pages import s2_parent_sql

    lv = sorted(levels)
    anc = points.select(
        F.col(point_key).alias("key"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(l).alias("level"),
                    s2_parent_sql(F.col(cell_col), l).alias("cell"),
                )
                for l in lv
            ])
        ).alias("_a"),
    ).select("key", F.col("_a.level").alias("level"), F.col("_a.cell").alias("cell"))
    counts = anc.groupBy("level", "cell").agg(F.count("*").alias("_n"))
    ok = anc.join(counts, ["level", "cell"]).where(F.col("_n") >= k)
    per_point = ok.groupBy("key").agg(F.max("level").alias("chosen"))
    chosen = points.select(F.col(point_key).alias("key")).join(
        per_point, "key", "left"
    ).select(F.coalesce(F.col("chosen"), F.lit(-1)).alias("level"))
    return chosen.groupBy("level").agg(F.count("*").alias("n_points"))


def spatial_entropy(
    points: DataFrame,
    group_col: str,
    level: int = 4,
    cell_col: str = "cell_id",
) -> DataFrame:
    """Per-group spatial Shannon entropy over level-``level`` S2 cells.

    For each group (host, event type, language...): H = -sum p_c ln p_c
    over its distribution across cells, plus exp(H) — the "effective
    number of locations" — and the raw cell count. H == 0 means the
    group is single-cell (geo-concentrated); ln(n_cells) means uniform.

    Exactness: per-(group, cell) and per-group totals are exact BIGINT
    counts; the entropy is one fixed-order double expression over them
    (sum of c*ln(c) then the algebraic rearrangement
    H = ln(N) - sum(c ln c)/N), so cross-engine values match to the ulp.

    Scale shape: two map-side-combined aggregations, both keyed by the
    group — no self-joins, no windows.
    """
    from .pages import s2_parent_sql

    g = points.select(
        F.col(group_col).alias("grp"),
        s2_parent_sql(F.col(cell_col), level).alias("cell"),
    )
    per_cell = g.groupBy("grp", "cell").agg(F.count("*").alias("c"))
    agg = per_cell.groupBy("grp").agg(
        F.count("*").alias("n_cells"),
        F.sum("c").alias("n_points"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "_clnc"
        ),
    )
    n_d = F.col("n_points").cast("double")
    h = F.log(n_d) - F.col("_clnc") / n_d
    return agg.select(
        F.col("grp"),
        F.col("n_cells").cast("long").alias("n_cells"),
        F.col("n_points").cast("long").alias("n_points"),
        F.round(h, 9).alias("entropy"),
        F.round(F.exp(h), 9).alias("effective_cells"),
    )


def kde_points(
    points: DataFrame,
    bandwidth_rad: float,
    cutoff_rad: float,
    point_key: str = "key",
    cell_col: str = "cell_id",
) -> DataFrame:
    """Gaussian kernel density estimate AT each sample point.

    density(i) = sum_{j != i, d_ij <= cutoff} exp(-d_ij^2 / (2 h^2)) —
    the classic hotspot-intensity surface, evaluated at the points
    themselves (truncated kernel: the cutoff bounds the candidate join,
    and with cutoff >= 3h the dropped tail mass is < 1.2%).

    Plan: the cell-blocked within-radius self-join supplies exact pair
    distances (the reference's angle metric); one map-side-combined sum
    per point finishes it. Isolated points (no neighbor in range) get
    density 0 via the left join back to the point set.

    Exactness note: per-point neighbor sums are floating-point adds in
    shuffle order — callers compare cross-engine after rounding (the
    registered query rounds to 9 dp; per-point neighbor counts are small
    so accumulated order error is ~1e-15 relative).
    """
    from .joins import distance_join

    # distance_join takes its radius in degrees
    eps_deg = float(cutoff_rad) * 180.0 / math.pi
    pairs = distance_join(
        points, eps_deg, point_key=point_key, cell_col=cell_col
    )
    sym = pairs.select(
        F.col("key_a").alias("key"), F.col("dist_rad").alias("d")
    ).unionByName(
        pairs.select(F.col("key_b").alias("key"), F.col("dist_rad").alias("d"))
    )
    h2 = 2.0 * float(bandwidth_rad) * float(bandwidth_rad)
    dens = sym.groupBy("key").agg(
        F.count("*").alias("n_neighbors"),
        F.sum(F.exp(-(F.col("d") * F.col("d")) / F.lit(h2))).alias("_dens"),
    )
    return (
        points.select(F.col(point_key).alias("key"))
        .join(dens, "key", "left")
        .select(
            "key",
            F.coalesce(F.col("n_neighbors"), F.lit(0)).cast("long").alias(
                "n_neighbors"
            ),
            F.round(F.coalesce(F.col("_dens"), F.lit(0.0)), 9).alias("density"),
        )
    )
