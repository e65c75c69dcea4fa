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
