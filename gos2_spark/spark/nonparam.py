"""Rank-based nonparametric two-sample / k-sample tests.

Completes the drift-test family next to the ECDF tests in temporal.py
(ks_two_sample) and the parametric z-test in aggregates.py
(two_proportion_ztest): Mann-Whitney U (location shift between two
cohorts), Kruskal-Wallis H (location shift across k groups), and the
Cramér-von Mises criterion (integrated squared ECDF distance — the L2
companion of KS's sup-norm). These are the standard monitoring gates
when value distributions are heavy-tailed enough that t-tests lie.

Exactness strategy (the repo-wide pattern): every sufficient statistic
is INTEGER. Tie-averaged ranks ride as DOUBLED ranks (rank2 = 2*rank,
always an integer even when the average rank is a half-integer), the
CvM integrand is expanded into three integer sums so no float is
accumulated in engine-dependent order, and the handful of per-group
float terms that Kruskal-Wallis cannot avoid are summed by a
sort_array+aggregate FOLD in a fixed key order — the same sequential
order a DuckDB list_reduce(list_sort(...)) oracle replays — so the
final doubles are bit-identical cross-engine.

Scale: each test is one groupBy(key, value) count (map-side combined),
one window over the DISTINCT (key, value) level — linear in distinct
values, not rows — and one keyed agg. No self-joins, no UDFs; at 10^12
rows the only sort is the per-key distinct-value window, sharded by key.

Reference parity: the reference engine (davidreynolds/gos2) exposes no
statistics; this extends the analytics surface that sits on top of the
S2 spatial core per SURVEY.md §2.7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mann_whitney_u", "kruskal_wallis", "cramer_von_mises", "welch_t"]


def _byval_cum(samples: DataFrame, key_col: str, side_col: str, value_col: str):
    """Shared prefix: per (key, value) side counts + cumulative counts
    with ties advancing both CDFs (the correct pooled-ECDF convention),
    plus per-key totals. All columns BIGINT."""
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
    return byval.select(
        "_k",
        "_c0",
        "_c1",
        F.sum("_c0").over(w).alias("_f0"),
        F.sum("_c1").over(w).alias("_f1"),
    ).select(
        "*",
        F.max("_f0").over(wfull).alias("_n0"),
        F.max("_f1").over(wfull).alias("_n1"),
    )


def mann_whitney_u(
    samples: DataFrame,
    key_col: str,
    side_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Whitney U per key between side 0 and side 1, with the
    tie-corrected normal approximation z.

    The doubled average rank of a tied value group is
    ``rank2 = 2*(count of strictly smaller values) + ties + 1`` — an
    INTEGER — so the side-0 rank sum rides as BIGINT ``r0_2 = 2*R0``
    and ``U0 = (r0_2 - n0*(n0+1)) / 2`` is exact (one halving at the
    end). The tie term ``T = sum(t^3 - t)`` is BIGINT. z is then one
    fixed-order double expression; NULL when every value is tied
    (zero variance).

    Output: (key, n0, n1, u_stat, mw_z).
    """
    cum = _byval_cum(samples, key_col, side_col, value_col)
    # doubled tie-averaged rank of this value group (integer by construction)
    rank2 = (
        2 * (F.col("_f0") + F.col("_f1") - F.col("_c0") - F.col("_c1"))
        + F.col("_c0")
        + F.col("_c1")
        + 1
    )
    t = F.col("_c0") + F.col("_c1")
    agg = cum.groupBy("_k").agg(
        F.max("_n0").alias("n0"),
        F.max("_n1").alias("n1"),
        F.sum(F.col("_c0") * rank2).alias("_r0_2"),
        F.sum(t * t * t - t).alias("_tie"),
    )
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    n = n0 + n1
    u0 = (F.col("_r0_2") - F.col("n0") * (F.col("n0") + 1)).cast("double") / 2.0
    var = (n0 * n1 / 12.0) * (
        (n + 1.0) - F.col("_tie").cast("double") / (n * (n - 1.0))
    )
    z = F.when(var > 0, (u0 - n0 * n1 / 2.0) / F.sqrt(var)).otherwise(
        F.lit(None).cast("double")
    )
    return agg.select(
        F.col("_k").alias(key_col),
        "n0",
        "n1",
        F.round(u0, 9).alias("u_stat"),
        F.round(z, 9).alias("mw_z"),
    )


def kruskal_wallis(
    samples: DataFrame,
    key_col: str,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Kruskal-Wallis H per key across the groups of ``group_col``,
    tie-corrected.

    Ranks are over the POOLED sample within a key, so the distinct
    (key, value) level carries the doubled average rank (integer, as in
    mann_whitney_u) and each (key, group) keeps the BIGINT doubled rank
    sum ``r_g2``. The per-group term ``r_g2^2 / (4*n_g)`` is float, so
    the cross-group sum is folded via aggregate(sort_array(...)) in
    group order — a fixed sequential order a DuckDB
    list_reduce(list_sort(...)) replays bit-for-bit (double squares of
    integers < 2^53 are correctly rounded identically in both engines).

    H = 12/(N(N+1)) * sum_g R_g^2/n_g - 3(N+1), divided by the tie
    correction 1 - sum(t^3-t)/(N^3-N); NULL when all values tie.

    Output: (key, k_groups, n_total, h_stat).
    """
    s = samples.select(
        F.col(key_col).alias("_k"),
        F.col(group_col).alias("_g"),
        F.col(value_col).alias("_v"),
    )
    bygv = s.groupBy("_k", "_g", "_v").agg(F.count("*").alias("_cg"))
    byval = bygv.groupBy("_k", "_v").agg(F.sum("_cg").alias("_c"))
    w = Window.partitionBy("_k").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = byval.select(
        "_k",
        "_v",
        "_c",
        (2 * (F.sum("_c").over(w) - F.col("_c")) + F.col("_c") + 1).alias("_rank2"),
    )
    pergroup = (
        bygv.join(ranked.select("_k", "_v", "_rank2"), ["_k", "_v"])
        .groupBy("_k", "_g")
        .agg(
            F.sum("_cg").alias("_ng"),
            F.sum(F.col("_cg") * F.col("_rank2")).alias("_rg2"),
        )
    )
    # float term per group; folded in sorted group order for determinism
    term = (
        F.col("_rg2").cast("double") * F.col("_rg2").cast("double")
    ) / (4.0 * F.col("_ng").cast("double"))
    ties = byval.groupBy("_k").agg(
        F.sum(F.col("_c") * F.col("_c") * F.col("_c") - F.col("_c")).alias("_tie"),
        F.sum("_c").alias("_n"),
    )
    folded = (
        pergroup.select("_k", "_g", "_ng", term.alias("_term"))
        .groupBy("_k")
        .agg(
            F.count("*").alias("k_groups"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_g", "_term"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_term"],
            ).alias("_sum_terms"),
        )
    )
    out = folded.join(ties, "_k")
    n = F.col("_n").cast("double")
    h_raw = 12.0 / (n * (n + 1.0)) * F.col("_sum_terms") - 3.0 * (n + 1.0)
    corr = 1.0 - F.col("_tie").cast("double") / (n * n * n - n)
    h = F.when(corr > 0, h_raw / corr).otherwise(F.lit(None).cast("double"))
    return out.select(
        F.col("_k").alias(key_col),
        "k_groups",
        F.col("_n").alias("n_total"),
        F.round(h, 9).alias("h_stat"),
    )


def cramer_von_mises(
    samples: DataFrame,
    key_col: str,
    side_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Cramér-von Mises criterion per key:

        T = n0*n1/N^2 * sum over pooled points x of (F0(x) - F1(x))^2

    (the integrated squared ECDF distance evaluated at every pooled
    sample point — the L2 drift measure that sees spread-out
    distributional change KS's single sup-point can miss).

    Exactness: (F0 - F1)^2 at a value group with pooled count c
    contributes c * (f0*n1 - f1*n0)^2 / (n0*n1)^2. The square is
    EXPANDED so the three accumulated sums  S_aa = sum c*f0^2,
    S_ab = sum c*f0*f1, S_bb = sum c*f1^2  are pure BIGINTs (no float
    ever enters an engine-ordered aggregation); the final
    T = (S_aa*n1^2 - 2*S_ab*n0*n1 + S_bb*n0^2) / (N^2 * n0 * n1)
    combines them in one fixed-order double expression.

    Output: (key, n0, n1, cvm_t).
    """
    cum = _byval_cum(samples, key_col, side_col, value_col)
    c = F.col("_c0") + F.col("_c1")
    agg = cum.groupBy("_k").agg(
        F.max("_n0").alias("n0"),
        F.max("_n1").alias("n1"),
        F.sum(c * F.col("_f0") * F.col("_f0")).alias("_saa"),
        F.sum(c * F.col("_f0") * F.col("_f1")).alias("_sab"),
        F.sum(c * F.col("_f1") * F.col("_f1")).alias("_sbb"),
    )
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    n = n0 + n1
    num = (
        F.col("_saa").cast("double") * n1 * n1
        - 2.0 * F.col("_sab").cast("double") * n0 * n1
        + F.col("_sbb").cast("double") * n0 * n0
    )
    t_stat = num / (n * n * n0 * n1)
    return agg.select(
        F.col("_k").alias(key_col),
        "n0",
        "n1",
        F.round(t_stat, 9).alias("cvm_t"),
    )


def welch_t(
    samples: DataFrame,
    key_col: str,
    side_col: str,
    value_col: str,
    scale: float = 1.0,
) -> DataFrame:
    """Welch's unequal-variance t-test per key between side 0 and side 1:
    t = (m1 - m0) / sqrt(s0^2/n0 + s1^2/n1) with the Welch-Satterthwaite
    degrees of freedom. The parametric companion of ``mann_whitney_u``
    over the same hash-split design.

    Exactness (repo-wide pattern): ``value_col`` must be an INTEGER
    column (pre-scale fixed-point values by ``scale`` in the caller, e.g.
    cents with scale=100) so the per-side (n, sum, sum-of-squares)
    sufficient statistics are exact BIGINTs from ONE map-side combinable
    aggregation — t and df are then fixed-order scalar expressions on the
    single result row per key, bit-identical cross-engine; t and df are
    scale-invariant, means are unscaled for display.

    Output: (key, n0, n1, mean0, mean1, t_welch, df_welch) — keys where
    either side has fewer than 2 observations are dropped (variance
    undefined)."""
    v = F.col(value_col).cast("long")
    per = samples.groupBy(key_col, side_col).agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ss"),
    )
    s0 = per.where(F.col(side_col) == 0).select(
        F.col(key_col),
        F.col("n").alias("n0"), F.col("s").alias("s0"),
        F.col("ss").alias("ss0"),
    )
    s1 = per.where(F.col(side_col) == 1).select(
        F.col(key_col),
        F.col("n").alias("n1"), F.col("s").alias("s1"),
        F.col("ss").alias("ss1"),
    )
    j = s0.join(s1, key_col).where((F.col("n0") >= 2) & (F.col("n1") >= 2))
    # all-double fixed-order scalar expressions over exact BIGINT stats
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    s0d, s1d = F.col("s0").cast("double"), F.col("s1").cast("double")
    m0 = s0d / n0d
    m1 = s1d / n1d
    var0 = (F.col("ss0").cast("double") - s0d * s0d / n0d) / (n0d - 1.0)
    var1 = (F.col("ss1").cast("double") - s1d * s1d / n1d) / (n1d - 1.0)
    se0 = var0 / n0d
    se1 = var1 / n1d
    t = (m1 - m0) / F.sqrt(se0 + se1)
    df = (se0 + se1) * (se0 + se1) / (
        se0 * se0 / (n0d - 1.0) + se1 * se1 / (n1d - 1.0)
    )
    return j.select(
        F.col(key_col),
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(m0 / F.lit(scale), 9).alias("mean0"),
        F.round(m1 / F.lit(scale), 9).alias("mean1"),
        F.round(t, 9).alias("t_welch"),
        F.round(df, 9).alias("df_welch"),
    )
