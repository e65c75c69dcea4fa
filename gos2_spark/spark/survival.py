"""Survival analysis: Kaplan-Meier estimator + Nelson-Aalen hazard.

The time-to-event readout a crawl/engagement pipeline needs ("how long
until a user fires the event again, accounting for users who never
did?") — the right-censored complement to cohort_retention's fixed
windows. One estimator call yields the full survival curve S(t) and the
Nelson-Aalen cumulative hazard H(t) per key.

Exactness strategy: risk sets and death counts are pure BIGINTs (one
groupBy + one cumulative window per key). The KM product and NA sum are
the only floats, and both are computed by a PREFIX FOLD over the
sort_array'ed per-key curve — Spark ``aggregate(slice(arr, 1, i))`` vs
DuckDB ``list_reduce(list_transform(arr[1:i]))`` — so both engines
multiply/add the same IEEE doubles in the same sequential t-order and
the curves are bit-identical.

Scale: the fold is over DISTINCT event times per key (days, not rows) —
bounded by the calendar, not the 10^12-row table; everything before it
is linear map-side work. The collect_list per key holds that bounded
curve only, never raw rows.

Reference parity: the reference engine (davidreynolds/gos2) exposes no
survival statistics; this extends the §2.7 analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kaplan_meier", "cumulative_incidence"]


def kaplan_meier(
    times: DataFrame,
    key_col: str,
    time_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve per key.

    ``times`` has one row per subject: a positive integer ``time_col``
    (duration) and ``event_col`` 1 = event observed at that time,
    0 = right-censored there. Output, one row per distinct time with at
    least one observed event:

      (key, t, n_risk, n_events, n_censored, survival, cum_hazard)

    with  survival = prod_{s<=t} (n_s - d_s)/n_s  (KM) and
    cum_hazard = sum_{s<=t} d_s/n_s  (Nelson-Aalen), folded in t-order.
    """
    s = times.select(
        F.col(key_col).alias("_k"),
        F.col(time_col).cast("long").alias("_t"),
        F.col(event_col).cast("int").alias("_e"),
    )
    byt = s.groupBy("_k", "_t").agg(
        F.sum("_e").alias("_d"),
        F.sum(1 - F.col("_e")).alias("_c"),
    )
    w = Window.partitionBy("_k").orderBy("_t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wfull = Window.partitionBy("_k")
    # n_risk at t = subjects whose duration >= t
    risk = byt.select(
        "_k",
        "_t",
        "_d",
        "_c",
        (
            F.sum(F.col("_d") + F.col("_c")).over(wfull)
            - F.sum(F.col("_d") + F.col("_c")).over(w)
            + F.col("_d")
            + F.col("_c")
        ).alias("_n"),
    ).where(F.col("_d") > 0)
    curve = risk.groupBy("_k").agg(
        F.sort_array(F.collect_list(F.struct("_t", "_d", "_n", "_c"))).alias("_arr")
    )
    row = curve.select("_k", F.posexplode("_arr").alias("_i", "_row"))
    prefix = F.slice(F.col("_arr"), 1, F.col("_i") + 1)
    surv = F.aggregate(
        prefix,
        F.lit(1.0),
        lambda acc, x: acc
        * (
            (x["_n"] - x["_d"]).cast("double") / x["_n"].cast("double")
        ),
    )
    haz = F.aggregate(
        prefix,
        F.lit(0.0),
        lambda acc, x: acc + x["_d"].cast("double") / x["_n"].cast("double"),
    )
    return (
        row.join(curve, "_k")
        .select(
            F.col("_k").alias(key_col),
            F.col("_row._t").alias("t"),
            F.col("_row._n").alias("n_risk"),
            F.col("_row._d").alias("n_events"),
            F.col("_row._c").alias("n_censored"),
            F.round(surv, 9).alias("survival"),
            F.round(haz, 9).alias("cum_hazard"),
        )
    )


def cumulative_incidence(
    times: DataFrame,
    key_col: str,
    time_col: str,
    cause_col: str,
) -> DataFrame:
    """Aalen-Johansen cumulative incidence functions under two competing
    risks per key.

    ``times`` has one row per subject: positive integer ``time_col`` and
    ``cause_col`` in {0 = right-censored, 1, 2} (the competing causes).
    Output, one row per distinct time with at least one observed event
    of either cause:

      (key, t, n_risk, d1, d2, n_censored, surv, cif1, cif2)

    with surv the all-cause KM survival and
    CIF_k(t) = sum_{s<=t} S(s-) * d_ks / n_s — the probability of
    failing from cause k by t in the presence of the other cause (which
    1 - KM_k overstates). The per-time recurrence carries [S, cif1,
    cif2] through ONE prefix fold in t-order (the kaplan_meier emit
    pattern: posexplode + per-row prefix aggregate), so every published
    double has a fixed evaluation order."""
    s = times.select(
        F.col(key_col).alias("_k"),
        F.col(time_col).cast("long").alias("_t"),
        F.col(cause_col).cast("int").alias("_c"),
    )
    byt = s.groupBy("_k", "_t").agg(
        F.sum((F.col("_c") == 1).cast("long")).alias("_d1"),
        F.sum((F.col("_c") == 2).cast("long")).alias("_d2"),
        F.sum((F.col("_c") == 0).cast("long")).alias("_cen"),
    )
    w = Window.partitionBy("_k").orderBy("_t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wfull = Window.partitionBy("_k")
    tot = F.col("_d1") + F.col("_d2") + F.col("_cen")
    risk = byt.select(
        "_k", "_t", "_d1", "_d2", "_cen",
        (
            F.sum(tot).over(wfull) - F.sum(tot).over(w) + tot
        ).alias("_n"),
    ).where((F.col("_d1") + F.col("_d2")) > 0)
    curve = risk.groupBy("_k").agg(
        F.sort_array(
            F.collect_list(F.struct("_t", "_d1", "_d2", "_cen", "_n"))
        ).alias("_arr")
    )
    row = curve.select("_k", F.posexplode("_arr").alias("_i", "_row"))
    prefix = F.slice(F.col("_arr"), 1, F.col("_i") + 1)
    st = F.aggregate(
        prefix,
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)),  # [S, cif1, cif2]
        lambda acc, x: F.array(
            acc[0]
            * (
                (x["_n"] - x["_d1"] - x["_d2"]).cast("double")
                / x["_n"].cast("double")
            ),
            acc[1] + acc[0] * x["_d1"].cast("double") / x["_n"].cast("double"),
            acc[2] + acc[0] * x["_d2"].cast("double") / x["_n"].cast("double"),
        ),
    )
    return (
        row.join(curve, "_k")
        .select(
            F.col("_k").alias(key_col),
            F.col("_row._t").alias("t"),
            F.col("_row._n").alias("n_risk"),
            F.col("_row._d1").alias("d1"),
            F.col("_row._d2").alias("d2"),
            F.col("_row._cen").alias("n_censored"),
            F.round(st[0], 9).alias("surv"),
            F.round(st[1], 9).alias("cif1"),
            F.round(st[2], 9).alias("cif2"),
        )
    )
