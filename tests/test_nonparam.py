"""Rank-based nonparametric tests (spark/nonparam.py) against pure-python
reference implementations with explicit tie handling."""

import math
import random
from collections import Counter

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _avg_ranks(pooled):
    """value -> tie-averaged rank over the pooled sorted sample."""
    cnt = Counter(pooled)
    ranks = {}
    below = 0
    for v in sorted(cnt):
        c = cnt[v]
        ranks[v] = below + (c + 1) / 2.0
        below += c
    return ranks


def _mann_whitney(a, b):
    pooled = list(a) + list(b)
    ranks = _avg_ranks(pooled)
    r0 = sum(ranks[v] for v in a)
    n0, n1 = len(a), len(b)
    u0 = r0 - n0 * (n0 + 1) / 2.0
    n = n0 + n1
    cnt = Counter(pooled)
    tie = sum(c**3 - c for c in cnt.values())
    var = (n0 * n1 / 12.0) * ((n + 1) - tie / (n * (n - 1)))
    z = (u0 - n0 * n1 / 2.0) / math.sqrt(var) if var > 0 else None
    return u0, z


def _kruskal(groups):
    pooled = [v for g in groups.values() for v in g]
    ranks = _avg_ranks(pooled)
    n = len(pooled)
    s = sum(sum(ranks[v] for v in g) ** 2 / len(g) for g in groups.values())
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    cnt = Counter(pooled)
    corr = 1.0 - sum(c**3 - c for c in cnt.values()) / (n**3 - n)
    return h / corr if corr > 0 else None


def _cvm(a, b):
    n0, n1 = len(a), len(b)
    ca, cb = Counter(a), Counter(b)
    t = 0.0
    f0 = f1 = 0
    for v in sorted(set(a) | set(b)):
        f0 += ca.get(v, 0)
        f1 += cb.get(v, 0)
        t += (ca.get(v, 0) + cb.get(v, 0)) * (f0 / n0 - f1 / n1) ** 2
    return n0 * n1 / (n0 + n1) ** 2 * t


def test_mann_whitney_matches_reference_with_ties(spark):
    from gos2_spark.spark.nonparam import mann_whitney_u

    rng = random.Random(7)
    a = [rng.randint(0, 30) for _ in range(120)]          # heavy ties
    b = [rng.randint(5, 40) for _ in range(90)]
    rows = [("k", 0, float(v)) for v in a] + [("k", 1, float(v)) for v in b]
    df = spark.createDataFrame(rows, "k string, side int, v double")
    got = mann_whitney_u(df, "k", "side", "v").collect()[0]
    u_ref, z_ref = _mann_whitney([float(v) for v in a], [float(v) for v in b])
    assert got["n0"] == 120 and got["n1"] == 90
    assert abs(got["u_stat"] - u_ref) < 1e-6
    assert abs(got["mw_z"] - z_ref) < 1e-6


def test_mann_whitney_all_tied_null_z(spark):
    from gos2_spark.spark.nonparam import mann_whitney_u

    rows = [("k", i % 2, 5.0) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, side int, v double")
    got = mann_whitney_u(df, "k", "side", "v").collect()[0]
    # all values identical: U = n0*n1/2 by tie-averaging, variance 0 -> NULL z
    assert got["mw_z"] is None
    assert abs(got["u_stat"] - 20 * 20 / 2.0) < 1e-9


def test_kruskal_wallis_matches_reference(spark):
    from gos2_spark.spark.nonparam import kruskal_wallis

    rng = random.Random(11)
    groups = {
        "a": [rng.randint(0, 50) * 1.0 for _ in range(80)],
        "b": [rng.randint(10, 60) * 1.0 for _ in range(60)],
        "c": [rng.randint(0, 80) * 1.0 for _ in range(70)],
    }
    rows = [("k", g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    got = kruskal_wallis(df, "k", "g", "v").collect()[0]
    assert got["k_groups"] == 3 and got["n_total"] == 210
    assert abs(got["h_stat"] - _kruskal(groups)) < 1e-6


def test_kruskal_wallis_identical_groups_near_zero(spark):
    from gos2_spark.spark.nonparam import kruskal_wallis

    vals = [float(i) for i in range(30)]
    rows = [("k", g, v) for g in ("a", "b", "c") for v in vals]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    got = kruskal_wallis(df, "k", "g", "v").collect()[0]
    # identical distributions -> H ~ 0 (exactly 0 here: equal rank sums)
    assert abs(got["h_stat"]) < 1e-9


def test_cvm_matches_reference_and_zero_on_identical(spark):
    from gos2_spark.spark.nonparam import cramer_von_mises

    rng = random.Random(3)
    a = [rng.randint(0, 25) * 0.5 for _ in range(100)]
    b = [rng.randint(3, 30) * 0.5 for _ in range(140)]
    rows = (
        [("p", 0, v) for v in a]
        + [("p", 1, v) for v in b]
        + [("q", 0, v) for v in a]
        + [("q", 1, v) for v in a]  # identical two samples
    )
    df = spark.createDataFrame(rows, "k string, side int, v double")
    got = {r["k"]: r for r in cramer_von_mises(df, "k", "side", "v").collect()}
    assert abs(got["p"]["cvm_t"] - _cvm(a, b)) < 1e-6
    assert got["q"]["cvm_t"] == 0.0


def test_driver_queries_run_and_match_shapes(spark):
    qs = entry.queries()
    mw = qs["mw_value_shift"](spark, SF_DIR).collect()
    kw = qs["kruskal_wallis_weekday"](spark, SF_DIR).collect()
    cv = qs["cvm_value_drift"](spark, SF_DIR).collect()
    assert len(mw) == 5 and all(r["n0"] + r["n1"] > 0 for r in mw)
    assert len(kw) == 7 and all(r["k_groups"] == 5 for r in kw)
    assert len(cv) == 10 and all(r["cvm_t"] >= 0 for r in cv)
