"""Tenth round-4 operator batch vs independent replays: ERP trajectory
distance, Holt-Winters triple smoothing, AMS F2 sketch, A-ES weighted
sampling, two-proportion z-test."""

import math
import random
from collections import Counter

from pyspark.sql import functions as F


def _erp_ref(ta, tb):
    """Reference ERP DP over xyz tuples with gap point (1,0,0)."""

    def gap(p):
        return math.atan2(math.sqrt(p[1] * p[1] + p[2] * p[2]), p[0])

    def dist(a, b):
        cx = a[1] * b[2] - a[2] * b[1]
        cy = a[2] * b[0] - a[0] * b[2]
        cz = a[0] * b[1] - a[1] * b[0]
        return math.atan2(
            math.sqrt(cx * cx + cy * cy + cz * cz),
            a[0] * b[0] + a[1] * b[1] + a[2] * b[2],
        )

    m, n = len(ta), len(tb)
    D = [[0.0] * (n + 1) for _ in range(m + 1)]
    for j in range(1, n + 1):
        D[0][j] = D[0][j - 1] + gap(tb[j - 1])
    for i in range(1, m + 1):
        D[i][0] = D[i - 1][0] + gap(ta[i - 1])
        for j in range(1, n + 1):
            D[i][j] = min(
                D[i - 1][j - 1] + dist(ta[i - 1], tb[j - 1]),
                D[i - 1][j] + gap(ta[i - 1]),
                D[i][j - 1] + gap(tb[j - 1]),
            )
    return D[m][n]


def _xyz(lat, lng):
    rl, rg = math.radians(lat), math.radians(lng)
    return (
        math.cos(rg) * math.cos(rl),
        math.sin(rg) * math.cos(rl),
        math.sin(rl),
    )


def _traj_df(spark, trajs):
    rows = []
    for uid, pts in trajs.items():
        for t, (lat, lng) in enumerate(pts):
            x, y, z = _xyz(lat, lng)
            rows.append((uid, t, x, y, z))
    df = spark.createDataFrame(
        rows, "user_id long, t long, x double, y double, z double"
    )
    return df.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("t", F.struct("x", "y", "z").alias("p")))
            ),
            lambda s: s["p"],
        ).alias("tr")
    )


def test_erp_matches_reference_dp_and_identity(spark):
    from gos2_spark.spark.trajectory import erp_distance_col

    rng = random.Random(21)
    trajs = {
        u: [
            (rng.uniform(-50, 50), rng.uniform(-120, 120))
            for _ in range(rng.randint(2, 9))
        ]
        for u in range(6)
    }
    tdf = _traj_df(spark, trajs)
    a = tdf.select(F.col("user_id").alias("ua"), F.col("tr").alias("ta"))
    b = tdf.select(F.col("user_id").alias("ub"), F.col("tr").alias("tb"))
    pairs = a.join(b, F.col("ua") <= F.col("ub"))
    got = {
        (r["ua"], r["ub"]): r["erp"]
        for r in pairs.select(
            "ua", "ub", erp_distance_col(F.col("ta"), F.col("tb")).alias("erp")
        ).collect()
    }
    xyz = {u: [_xyz(*p) for p in pts] for u, pts in trajs.items()}
    for (ua, ub), v in got.items():
        want = _erp_ref(xyz[ua], xyz[ub])
        assert abs(v - want) < 1e-9, (ua, ub)
    for u in trajs:
        assert abs(got[(u, u)]) < 1e-12  # identity of indiscernibles


def test_erp_triangle_inequality(spark):
    """ERP is a metric (Chen & Ng 2004): check the triangle inequality
    over all triples of a small cohort."""
    from gos2_spark.spark.trajectory import erp_distance_col

    rng = random.Random(5)
    trajs = {
        u: [
            (rng.uniform(-30, 30), rng.uniform(-60, 60))
            for _ in range(rng.randint(2, 6))
        ]
        for u in range(5)
    }
    tdf = _traj_df(spark, trajs)
    a = tdf.select(F.col("user_id").alias("ua"), F.col("tr").alias("ta"))
    b = tdf.select(F.col("user_id").alias("ub"), F.col("tr").alias("tb"))
    d = {
        (r["ua"], r["ub"]): r["erp"]
        for r in a.join(b, F.lit(True)).select(
            "ua", "ub", erp_distance_col(F.col("ta"), F.col("tb")).alias("erp")
        ).collect()
    }
    users = sorted(trajs)
    for i in users:
        for j in users:
            for k in users:
                assert d[(i, k)] <= d[(i, j)] + d[(j, k)] + 1e-9


def _hw_ref(xs, period=7, a=0.25, b=0.125, g=0.5):
    l, tr = float(xs[0]), 0.0
    s = [0.0] * period
    for x in xs[1:]:
        x = float(x)
        lp = a * (x - s[0]) + (1 - a) * (l + tr)
        bp = b * (lp - l) + (1 - b) * tr
        sp = g * (x - lp) + (1 - g) * s[0]
        l, tr, s = lp, bp, s[1:] + [sp]
    return l, tr, s[0]


def test_holt_winters_matches_python_fold(spark):
    from gos2_spark.spark.temporal import holt_winters

    rng = random.Random(9)
    rows = []
    series = {}
    for grp in range(3):
        xs = [
            100 + 30 * ((t % 7) in (5, 6)) + rng.randint(-5, 5)
            for t in range(rng.randint(10, 40))
        ]
        series[grp] = xs
        rows += [(grp, t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "grp long, day long, n long")
    got = {
        r["grp"]: r
        for r in holt_winters(df, ["grp"], "day", "n", period=7).collect()
    }
    for grp, xs in series.items():
        l, tr, s1 = _hw_ref(xs)
        assert got[grp]["n_obs"] == len(xs)
        assert abs(got[grp]["level"] - round(l, 6)) < 1e-9, grp
        assert abs(got[grp]["trend"] - round(tr, 6)) < 1e-9, grp
        assert abs(got[grp]["season_next"] - round(s1, 6)) < 1e-9, grp
        assert abs(
            got[grp]["forecast_1"] - round(l + tr + s1, 6)
        ) < 1e-9, grp


def test_holt_winters_learns_planted_weekly_season(spark):
    """A clean period-7 signal drives the seasonal register toward the
    planted amplitude (weekend slot high) while the trend stays ~0."""
    from gos2_spark.spark.temporal import holt_winters

    xs = [100 + (50 if t % 7 == 0 else 0) for t in range(70)]
    df = spark.createDataFrame(
        [(0, t, x) for t, x in enumerate(xs)], "grp long, day long, n long"
    )
    row = holt_winters(df, ["grp"], "day", "n", period=7).collect()[0]
    # next observation (t=70) hits the spike slot: its seasonal estimate
    # must be well above the flat slots' (which are near/below zero)
    assert row["season_next"] > 15.0
    assert abs(row["trend"]) < 5.0


def test_ams_f2_exact_stats_and_sign_replay(spark):
    from gos2_spark.pipeline.sketch import ams_f2

    rng = random.Random(3)
    rows = [("g", f"tok{rng.randrange(40)}") for _ in range(3000)]
    df = spark.createDataFrame(rows, "grp string, token string")
    out = ams_f2(df, "token", ["grp"], n_estimators=8).collect()[0]
    cnt = Counter(t for _, t in rows)
    f2 = sum(c * c for c in cnt.values())
    assert out["n_items"] == 3000
    assert out["n_distinct"] == len(cnt)
    assert out["f2_exact"] == f2
    # replay the estimate with the engine's own hash values (the sign
    # function is the only non-python-computable part)
    hs = {}
    hdf = spark.createDataFrame(
        [(t,) for t in cnt], "token string"
    ).select(
        "token",
        *[
            F.pmod(
                F.xxhash64(F.concat(F.col("token"), F.lit(f"#ams{r}"))),
                F.lit(2),
            ).alias(f"b{r}")
            for r in range(8)
        ],
    )
    for r_ in hdf.collect():
        hs[r_["token"]] = [1 - 2 * r_[f"b{r}"] for r in range(8)]
    est = 0.0
    for r in range(8):
        s = sum(c * hs[t][r] for t, c in cnt.items())
        est += float(s) * float(s)
    assert abs(out["f2_est"] - round(est / 8.0, 6)) < 1e-6
    # an unbiased estimator with 8 rows lands within a loose factor
    assert 0.1 * f2 < out["f2_est"] < 10 * f2


def test_weighted_sample_partition_invariant_and_weight_sensitive(spark):
    from gos2_spark.pipeline.pack import weighted_sample_topk

    rows = [(i, 10 if i != 7 else 1_000_000) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    s1 = sorted(
        r["doc_id"]
        for r in weighted_sample_topk(df, F.col("w"), 20).collect()
    )
    s2 = sorted(
        r["doc_id"]
        for r in weighted_sample_topk(
            df.repartition(13), F.col("w"), 20
        ).collect()
    )
    assert s1 == s2  # pure key function: resharding cannot move the sample
    assert 7 in s1  # the heavy item is (essentially) always included
    # inclusion probability tracks weight: a uniform-weight control keeps
    # exactly k and every selected score is a valid ln(u)/w (negative)
    out = weighted_sample_topk(df, F.col("w"), 20).collect()
    assert len(out) == 20
    assert all(r["aes_score"] < 0 for r in out)


def test_two_proportion_ztest_known_counts(spark):
    from gos2_spark.spark.aggregates import two_proportion_ztest

    rows = [(0, 1)] * 40 + [(0, 0)] * 60 + [(1, 1)] * 25 + [(1, 0)] * 75
    df = spark.createDataFrame(rows, "arm int, converted int")
    out = two_proportion_ztest(df, "arm", "converted").collect()[0]
    assert (out["n0"], out["conv0"], out["n1"], out["conv1"]) == (
        100, 40, 100, 25,
    )
    p0, p1, pp = 0.4, 0.25, 65 / 200
    z = (p0 - p1) / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert abs(out["z_stat"] - round(z, 9)) < 1e-9
    assert abs(out["p_pooled"] - round(pp, 9)) < 1e-9


def test_two_proportion_ztest_degenerate_is_null(spark):
    from gos2_spark.spark.aggregates import two_proportion_ztest

    rows = [(0, 1)] * 10 + [(1, 1)] * 10  # everyone converts
    df = spark.createDataFrame(rows, "arm int, converted int")
    out = two_proportion_ztest(df, "arm", "converted").collect()[0]
    assert out["z_stat"] is None
    assert out["p0"] == 1.0 and out["p1"] == 1.0
