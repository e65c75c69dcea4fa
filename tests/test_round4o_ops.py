"""Fifteenth round-4 operator batch: classical series statistics —
Spearman rank correlation, two-sample KS, MA seasonal decomposition,
Grubbs outlier, Page-Hinkley drift, linear gap-fill."""

import math
import random
from collections import defaultdict

from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# rank_correlation
# ---------------------------------------------------------------------------

def _spearman_py(xs, ys):
    def avg_ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        ranks = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and v[order[j]] == v[order[i]]:
                j += 1
            r = (i + 1 + j) / 2.0  # average of positions i+1..j
            for k in range(i, j):
                ranks[order[k]] = r
            i = j
        return ranks

    ra, rb = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    sa, sb = sum(ra), sum(rb)
    saa = sum(r * r for r in ra)
    sbb = sum(r * r for r in rb)
    sab = sum(a * b for a, b in zip(ra, rb))
    va = n * saa - sa * sa
    vb = n * sbb - sb * sb
    if va * vb <= 0:
        return None
    return (n * sab - sa * sb) / math.sqrt(va * vb)


def test_rank_correlation_matches_python_replay(spark):
    from gos2_spark.spark.temporal import rank_correlation

    rng = random.Random(7)
    rows = []
    series = {}
    for k in ("a", "b", "c"):
        xs = [rng.randint(0, 20) for _ in range(40)]
        ys = [x + rng.randint(-5, 5) for x in xs]
        series[k] = (xs, ys)
        rows += [(k, x, y) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {
        r["k"]: r["spearman_rho"]
        for r in rank_correlation(df, "k", "x", "y").collect()
    }
    for k, (xs, ys) in series.items():
        assert abs(got[k] - _spearman_py(xs, ys)) < 1e-8, k


def test_rank_correlation_perfect_and_inverse(spark):
    from gos2_spark.spark.temporal import rank_correlation

    rows = [("up", i, i * 3) for i in range(10)] + [
        ("dn", i, -i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {
        r["k"]: r["spearman_rho"]
        for r in rank_correlation(df, "k", "x", "y").collect()
    }
    assert got["up"] == 1.0 and got["dn"] == -1.0


def test_rank_correlation_constant_series_is_null(spark):
    from gos2_spark.spark.temporal import rank_correlation

    df = spark.createDataFrame(
        [("c", 5, i) for i in range(8)], "k string, x long, y long"
    )
    [r] = rank_correlation(df, "k", "x", "y").collect()
    assert r["spearman_rho"] is None


# ---------------------------------------------------------------------------
# ks_two_sample
# ---------------------------------------------------------------------------

def _ks_py(a, b):
    vals = sorted(set(a) | set(b))
    best = 0
    for v in vals:
        f0 = sum(1 for x in a if x <= v) * len(b)
        f1 = sum(1 for x in b if x <= v) * len(a)
        best = max(best, abs(f0 - f1))
    return best / (len(a) * len(b))


def test_ks_two_sample_matches_python_replay(spark):
    from gos2_spark.spark.temporal import ks_two_sample

    rng = random.Random(11)
    a = [rng.uniform(0, 10) for _ in range(60)]
    b = [rng.uniform(2, 12) for _ in range(45)]
    rows = [("k", 0, v) for v in a] + [("k", 1, v) for v in b]
    df = spark.createDataFrame(rows, "k string, side int, v double")
    [r] = ks_two_sample(df, "k", "side", "v").collect()
    assert r["n0"] == 60 and r["n1"] == 45
    assert abs(r["ks_d"] - _ks_py(a, b)) < 1e-9


def test_ks_identical_samples_zero_disjoint_one(spark):
    from gos2_spark.spark.temporal import ks_two_sample

    same = [("s", side, float(v)) for side in (0, 1) for v in range(20)]
    disj = [("d", 0, float(v)) for v in range(10)] + [
        ("d", 1, float(v + 100)) for v in range(10)
    ]
    df = spark.createDataFrame(same + disj, "k string, side int, v double")
    got = {r["k"]: r["ks_d"] for r in ks_two_sample(df, "k", "side", "v").collect()}
    assert got["s"] == 0.0 and got["d"] == 1.0


def test_ks_cross_sample_ties_advance_both_cdfs(spark):
    """At a tied value both ECDFs must step BEFORE the diff is taken —
    D([1,2], [2,3]) = 1/2, not 1 (the naive per-row cumsum gets 1)."""
    from gos2_spark.spark.temporal import ks_two_sample

    rows = [("k", 0, 1.0), ("k", 0, 2.0), ("k", 1, 2.0), ("k", 1, 3.0)]
    df = spark.createDataFrame(rows, "k string, side int, v double")
    [r] = ks_two_sample(df, "k", "side", "v").collect()
    assert r["ks_d"] == 0.5


# ---------------------------------------------------------------------------
# ma_decompose
# ---------------------------------------------------------------------------

def test_ma_decompose_recovers_planted_seasonality(spark):
    from gos2_spark.spark.temporal import ma_decompose

    # x_t = 100 + seasonal[t % 7]  (no trend, no noise)
    seasonal = [0, 14, -7, 7, -14, 3, -3]  # sums to 0
    rows = [("k", t, 100 + seasonal[t % 7]) for t in range(70)]
    df = spark.createDataFrame(rows, "k string, d long, x long")
    out = ma_decompose(df, "k", "d", "x", period=7).collect()
    got = {r["phase"]: r for r in out}
    for ph in range(7):
        assert abs(got[ph]["seasonal"] - seasonal[ph]) < 1e-9
        assert got[ph]["remainder_msq"] < 1e-12


def test_ma_decompose_matches_python_replay(spark):
    from gos2_spark.spark.temporal import ma_decompose

    rng = random.Random(3)
    xs = [rng.randint(50, 150) for _ in range(40)]
    rows = [("k", t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, d long, x long")
    out = {r["phase"]: r for r in ma_decompose(df, "k", "d", "x").collect()}

    dnum = {}
    for t in range(3, len(xs) - 3):
        s = sum(xs[t - 3 : t + 4])
        dnum[t] = 7 * xs[t] - s
    by_phase = defaultdict(list)
    for t, dn in dnum.items():
        by_phase[t % 7].append(dn)
    rems = []
    for ph, dns in by_phase.items():
        psum, pn = sum(dns), len(dns)
        assert abs(out[ph]["seasonal"] - psum / (7.0 * pn)) < 1e-9
        assert out[ph]["n_phase"] == pn
        rems += [dn / 7.0 - psum / (7.0 * pn) for dn in dns]
    msq = sum(r * r for r in rems) / len(rems)
    assert abs(out[0]["remainder_msq"] - msq) < 1e-9


# ---------------------------------------------------------------------------
# grubbs_stat
# ---------------------------------------------------------------------------

def test_grubbs_flags_the_planted_outlier(spark):
    from gos2_spark.spark.temporal import grubbs_stat

    rng = random.Random(5)
    rows = [("k", i, rng.uniform(9.5, 10.5)) for i in range(50)]
    rows.append(("k", 999, 25.0))
    df = spark.createDataFrame(rows, "k string, id long, v double")
    [r] = grubbs_stat(df, "k", "id", "v").collect()
    assert r["flagged_id"] == 999
    assert r["grubbs_g"] > 4.0
    assert r["n_obs"] == 51


def test_grubbs_matches_numpy_and_breaks_ties_by_max_id(spark):
    import numpy as np

    from gos2_spark.spark.temporal import grubbs_stat

    vals = [10.0, 12.0, 8.0, 12.0, 10.0, 8.0]  # symmetric: 4-way tie on |dev|
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    [r] = grubbs_stat(df, "k", "id", "v").collect()
    x = np.round(np.array(vals) * 100).astype(np.int64)
    g = np.max(np.abs(x - x.mean())) / x.std(ddof=1)
    assert abs(r["grubbs_g"] - g) < 1e-9
    # |dev| ties at ids 1,2,3,5 -> integer max-struct picks the largest id
    assert r["flagged_id"] == 5


# ---------------------------------------------------------------------------
# page_hinkley
# ---------------------------------------------------------------------------

def _page_hinkley_py(xs, delta=0.0, lam=25.0):
    s = 0
    ph = 0.0
    phmin = float("inf")
    max_rise = 0.0
    alarm = None
    for i, x in enumerate(xs, start=1):
        s += x
        term = round((i * x - s) / i - delta, 9)
        ph += term
        phmin = min(phmin, ph)
        max_rise = max(max_rise, ph - phmin)
        if alarm is None and ph - phmin > lam:
            alarm = i - 1  # 0-based order key
    return max_rise, alarm


def test_page_hinkley_fires_on_level_shift_only(spark):
    from gos2_spark.spark.temporal import page_hinkley

    flat = [100] * 60
    shifted = [100] * 30 + [115] * 30
    rows = [("flat", t, x) for t, x in enumerate(flat)] + [
        ("shift", t, x) for t, x in enumerate(shifted)
    ]
    df = spark.createDataFrame(rows, "k string, d long, x long")
    got = {r["k"]: r for r in page_hinkley(df, "k", "d", "x", lam=25.0).collect()}
    assert got["flat"]["alarm_at"] is None
    assert got["shift"]["alarm_at"] is not None

    for k, xs in (("flat", flat), ("shift", shifted)):
        rise, alarm = _page_hinkley_py(xs)
        assert abs(got[k]["max_ph_rise"] - rise) < 1e-6
        assert got[k]["alarm_at"] == alarm


# ---------------------------------------------------------------------------
# gap_fill_linear
# ---------------------------------------------------------------------------

def test_gap_fill_interpolates_and_extends_edges(spark):
    from gos2_spark.spark.temporal import gap_fill_linear

    rows = [("k", 10, 100), ("k", 13, 130), ("k", 14, 50)]
    df = spark.createDataFrame(rows, "k string, d long, v long")
    out = {r["day_ord"]: r for r in gap_fill_linear(df, "k", "d", "v").collect()}
    assert sorted(out) == [10, 11, 12, 13, 14]
    assert not out[10]["was_missing"] and out[10]["filled_value"] == 100.0
    assert out[11]["was_missing"] and out[11]["filled_value"] == 110.0
    assert out[12]["filled_value"] == 120.0
    assert out[13]["filled_value"] == 130.0 and out[14]["filled_value"] == 50.0


def test_gap_fill_emits_full_range_per_key_only(spark):
    from gos2_spark.spark.temporal import gap_fill_linear

    rows = [("a", 0, 1), ("a", 5, 11), ("b", 100, 7)]
    df = spark.createDataFrame(rows, "k string, d long, v long")
    out = gap_fill_linear(df, "k", "d", "v").collect()
    a_days = sorted(r["day_ord"] for r in out if r["k"] == "a")
    b_days = [r["day_ord"] for r in out if r["k"] == "b"]
    assert a_days == list(range(6)) and b_days == [100]
    mids = {
        r["day_ord"]: r["filled_value"] for r in out if r["k"] == "a"
    }
    assert mids[3] == 1 + (11 - 1) * 3 / 5  # 7.0


# ---------------------------------------------------------------------------
# end-to-end: the registered queries run and agree with their oracles via
# tools/oracle_check.py in CI; here just pin schema + sanity on sf0.001
# ---------------------------------------------------------------------------

def test_new_queries_run_and_bound_invariants(spark):
    qs = entry.queries()
    sp = {r["pair"]: r for r in qs["spearman_daily"](spark, SF_DIR).collect()}
    assert all(
        r["spearman_rho"] is None or -1.0 <= r["spearman_rho"] <= 1.0
        for r in sp.values()
    )
    ks = qs["ks_value_drift"](spark, SF_DIR).collect()
    assert ks and all(0.0 <= r["ks_d"] <= 1.0 for r in ks)
    gf = qs["gap_fill_daily"](spark, SF_DIR).collect()
    assert gf and all(r["n_missing"] >= 0 for r in gf)
    ph = qs["page_hinkley_drift"](spark, SF_DIR).collect()
    assert ph and all(r["max_ph_rise"] >= 0.0 for r in ph)
