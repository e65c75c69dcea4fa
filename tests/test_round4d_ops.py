"""Fourth round-4 operator batch vs independent pure-python replays:
DTW and discrete Frechet nested-fold DPs, circular bearing statistics,
and binary join-count spatial autocorrelation."""

import math
import random

import numpy as np
from pyspark.sql import functions as F


# ----------------------------------------------------------------- dtw
def _dtw_ref(a, b):
    m, n = len(a), len(b)
    inf = float("inf")
    d = [[inf] * (n + 1) for _ in range(m + 1)]
    d[0][0] = 0.0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            c = abs(a[i - 1] - b[j - 1])
            d[i][j] = c + min(d[i - 1][j], d[i - 1][j - 1], d[i][j - 1])
    return d[m][n]


def test_dtw_matches_reference_dp(spark):
    from gos2_spark.spark.temporal import dtw_distance_col

    rng = random.Random(29)
    rows = []
    for i in range(25):
        a = [rng.randint(0, 30) for _ in range(rng.randint(1, 40))]
        b = [rng.randint(0, 30) for _ in range(rng.randint(1, 40))]
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "i long, a array<long>, b array<long>")
    got = {
        r["i"]: r["dtw"]
        for r in df.select(
            "i", dtw_distance_col(F.col("a"), F.col("b")).alias("dtw")
        ).collect()
    }
    for i, a, b in rows:
        assert math.isclose(got[i], _dtw_ref(a, b), rel_tol=1e-12), i


def test_dtw_identity_and_shift_tolerance(spark):
    """DTW(x, x) == 0, and a time-shifted copy costs (far) less than the
    lockstep L1 distance it would pay without warping."""
    from gos2_spark.spark.temporal import dtw_distance_col

    base = [0, 0, 10, 10, 0, 0, 0, 0, 0, 0]
    shifted = [0, 0, 0, 0, 0, 0, 10, 10, 0, 0]
    df = spark.createDataFrame(
        [(base, base), (base, shifted)], "a array<long>, b array<long>"
    )
    vals = [
        r["d"]
        for r in df.select(
            dtw_distance_col(F.col("a"), F.col("b")).alias("d")
        ).collect()
    ]
    assert vals[0] == 0.0
    lockstep = sum(abs(x - y) for x, y in zip(base, shifted))
    assert vals[1] < lockstep / 2


# ------------------------------------------------------------- frechet
def _angle(p, q):
    cx = p[1] * q[2] - p[2] * q[1]
    cy = p[2] * q[0] - p[0] * q[2]
    cz = p[0] * q[1] - p[1] * q[0]
    return math.atan2(
        math.sqrt(cx * cx + cy * cy + cz * cz),
        p[0] * q[0] + p[1] * q[1] + p[2] * q[2],
    )


def _frechet_ref(ta, tb):
    m, n = len(ta), len(tb)
    inf = float("inf")
    d = [[inf] * (n + 1) for _ in range(m + 1)]
    d[0][0] = 0.0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            c = _angle(ta[i - 1], tb[j - 1])
            d[i][j] = max(
                c, min(d[i - 1][j], d[i - 1][j - 1], d[i][j - 1])
            )
    return d[m][n]


def _xyz(lat, lng):
    la, ln = math.radians(lat), math.radians(lng)
    return (
        math.cos(ln) * math.cos(la),
        math.sin(ln) * math.cos(la),
        math.sin(la),
    )


def test_frechet_matches_reference_dp(spark):
    from gos2_spark.spark.trajectory import frechet_distance_col

    rng = random.Random(31)
    rows = []
    for i in range(15):
        ta = [
            _xyz(rng.uniform(-60, 60), rng.uniform(-170, 170))
            for _ in range(rng.randint(1, 25))
        ]
        tb = [
            _xyz(rng.uniform(-60, 60), rng.uniform(-170, 170))
            for _ in range(rng.randint(1, 25))
        ]
        rows.append((i, ta, tb))
    schema = (
        "i long, ta array<struct<x double, y double, z double>>,"
        " tb array<struct<x double, y double, z double>>"
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r["i"]: r["f"]
        for r in df.select(
            "i", frechet_distance_col(F.col("ta"), F.col("tb")).alias("f")
        ).collect()
    }
    for i, ta, tb in rows:
        assert math.isclose(
            got[i], _frechet_ref(ta, tb), rel_tol=1e-12
        ), i


def test_frechet_bounds_vs_hausdorff_property(spark):
    """Frechet >= directed max-min distance from A (it must pair every
    A point), and Frechet(x, x) == 0."""
    from gos2_spark.spark.trajectory import frechet_distance_col

    rng = random.Random(37)
    ta = [_xyz(rng.uniform(-50, 50), rng.uniform(-160, 160)) for _ in range(12)]
    tb = [_xyz(rng.uniform(-50, 50), rng.uniform(-160, 160)) for _ in range(9)]
    schema = (
        "ta array<struct<x double, y double, z double>>,"
        " tb array<struct<x double, y double, z double>>"
    )
    df = spark.createDataFrame([(ta, tb), (ta, ta)], schema)
    vals = [
        r["f"]
        for r in df.select(
            frechet_distance_col(F.col("ta"), F.col("tb")).alias("f")
        ).collect()
    ]
    hd = max(min(_angle(p, q) for q in tb) for p in ta)
    assert vals[0] >= hd - 1e-12
    assert vals[1] == 0.0


# ------------------------------------------------------ circular stats
def test_circular_fold_matches_numpy(spark):
    from gos2_spark.spark.spatialstats import circular_fold

    rng = random.Random(41)
    rows = [
        (i, [rng.uniform(0, 2 * math.pi) for _ in range(rng.randint(1, 80))])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "i long, bs array<double>")
    c, s = circular_fold(F.col("bs"))
    got = {
        r["i"]: (r["c"], r["s"])
        for r in df.select("i", c.alias("c"), s.alias("s")).collect()
    }
    for i, bs in rows:
        a = np.array(bs)
        # sequential-fold floats vs numpy pairwise sums: 1e-12 tolerance
        assert math.isclose(got[i][0], np.cos(a).sum(), rel_tol=0, abs_tol=1e-9)
        assert math.isclose(got[i][1], np.sin(a).sum(), rel_tol=0, abs_tol=1e-9)


def test_circular_stats_directional_vs_uniform(spark):
    """A tight directional sample has r_bar near 1; a uniform circle of
    bearings has r_bar near 0 — through the registered query math."""
    from gos2_spark.spark.spatialstats import circular_fold

    tight = [0.5 + 0.01 * i for i in range(100)]
    uniform = [2 * math.pi * i / 100 for i in range(100)]
    df = spark.createDataFrame(
        [(1, tight), (2, uniform)], "i long, bs array<double>"
    )
    c, s = circular_fold(F.col("bs"))
    rbar = (F.sqrt(c * c + s * s) / F.lit(100.0)).alias("r")
    got = {r["i"]: r["r"] for r in df.select("i", rbar).collect()}
    assert got[1] > 0.9
    assert got[2] < 0.05


# ---------------------------------------------------------- join counts
def test_join_count_stats_consistency(spark):
    """BB + WW + BW == W on the registered query's own output, and the
    independence expectation matches the closed form."""
    import __spark_entry__ as entry

    r = entry.queries()["join_count_stats"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r["jbb"] + r["jww"] + r["jbw"] == r["w_pairs"]
    nb, n, w = r["n_black"], r["n_cells"], r["w_pairs"]
    exp = w * (2.0 * nb * (n - nb)) / (n * (n - 1.0))
    assert math.isclose(r["expected_bw"], exp, rel_tol=1e-9)


# ------------------------------------------------------------------ lcss
def _lcss_ref(ta, tb, eps):
    m, n = len(ta), len(tb)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if _angle(ta[i - 1], tb[j - 1]) <= eps:
                d[i][j] = d[i - 1][j - 1] + 1
            else:
                d[i][j] = max(d[i - 1][j], d[i][j - 1])
    return d[m][n]


def test_lcss_matches_reference_dp(spark):
    from gos2_spark.spark.trajectory import lcss_length_col

    rng = random.Random(53)
    rows = []
    for i in range(12):
        # mixture: some points shared between ta and tb so matches exist
        base = [
            _xyz(rng.uniform(-50, 50), rng.uniform(-160, 160))
            for _ in range(20)
        ]
        ta = base[: rng.randint(5, 18)]
        tb = [
            p if rng.random() < 0.5
            else _xyz(rng.uniform(-50, 50), rng.uniform(-160, 160))
            for p in base[: rng.randint(5, 18)]
        ]
        rows.append((i, ta, tb))
    schema = (
        "i long, ta array<struct<x double, y double, z double>>,"
        " tb array<struct<x double, y double, z double>>"
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r["i"]: r["l"]
        for r in df.select(
            "i", lcss_length_col(F.col("ta"), F.col("tb"), 0.05).alias("l")
        ).collect()
    }
    for i, ta, tb in rows:
        assert got[i] == _lcss_ref(ta, tb, 0.05), i


# ----------------------------------------------------------- kendall tau
def test_kendall_tau_matches_scipy_free_reference(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["kendall_tau_types"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 10
    import duckdb

    con = duckdb.connect()
    raw = con.execute(
        "SELECT event_type, CAST(floor(CAST(date_diff('microsecond',"
        " TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE) / 86400000000)"
        " AS BIGINT) AS day, count(*) FROM"
        " '/root/testdata/sf0.01/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    series = {}
    for t, d, n in raw:
        series.setdefault(t, {})[d] = n
    for r in rows:
        xa, xb = series[r["type_a"]], series[r["type_b"]]
        days = sorted(set(xa) & set(xb))
        s = tx = ty = n0 = 0
        for i in range(len(days)):
            for j in range(i + 1, len(days)):
                dx = xa[days[j]] - xa[days[i]]
                dy = xb[days[j]] - xb[days[i]]
                s += ((dx > 0) - (dx < 0)) * ((dy > 0) - (dy < 0))
                tx += dx == 0
                ty += dy == 0
                n0 += 1
        assert (r["n0"], r["s_stat"], r["tx"], r["ty"]) == (n0, s, tx, ty)
        den = math.sqrt((n0 - tx) * (n0 - ty))
        want = s / den if den > 0 else 0.0
        # query output is rounded to 9 dp
        assert math.isclose(r["tau_b"], want, rel_tol=0, abs_tol=5.1e-10)


# -------------------------------------------------------------------- ppr
def test_personalized_pagerank_properties(spark):
    """PPR from the seed: ranks are a probability-like vector
    concentrated near the seed; seed rank strictly exceeds the uniform
    PageRank share, and total mass stays 1 (teleport + dangling both go
    to the seed)."""
    import __spark_entry__ as entry

    rows = entry.queries()["ppr_seed_host"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    total = sum(r["rank"] for r in rows)
    assert math.isclose(total, 1.0, rel_tol=1e-6)
    seed = next(r for r in rows if r["node"] == 0)
    assert seed["rank"] > 1.0 / len(rows)
    assert all(r["rank"] >= 0.0 for r in rows)
