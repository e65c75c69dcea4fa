"""ANOVA, Levene, runs test, Durbin-Watson — python references."""

import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _groups():
    rows = duckdb.sql(
        f"SELECT event_type, round(value * 100) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    g = defaultdict(list)
    for t, c in rows:
        g[t].append(int(c))
    return g


def _anova(groups):
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    st = sum(sum(v) for v in groups.values())
    sst = sum(x * x for v in groups.values() for x in v)
    sb = sum(sum(v) ** 2 / len(v) for v in groups.values())
    ssb = sb - st * st / n
    ssw = sst - sb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return n, k, ssb, ssw, f


def test_anova_matches_python(spark):
    g = _groups()
    n, k, ssb, ssw, f = _anova(g)
    r = entry.queries()["anova_values"](spark, SF_DIR).collect()[0]
    assert (r["k_groups"], r["n_total"]) == (k, n)
    assert abs(r["ss_between"] - ssb) < 1e-3
    assert abs(r["ss_within"] - ssw) < 1e-3
    assert abs(r["f_stat"] - f) < 1e-6


def test_levene_matches_python(spark):
    g = _groups()
    dev = {}
    for t, vals in g.items():
        s = sorted(vals)
        med = s[(len(s) + 1) // 2 - 1]
        dev[t] = [abs(x - med) for x in vals]
    n, k, ssb, ssw, f = _anova(dev)
    r = entry.queries()["levene_test"](spark, SF_DIR).collect()[0]
    assert abs(r["f_stat"] - f) < 1e-6
    assert r["f_stat"] >= 0


def test_runs_matches_python(spark):
    daily = duckdb.sql(
        f"""SELECT event_type,
                   CAST(floor(CAST(date_diff('microsecond',
                        TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                        / 86400000000) AS BIGINT) AS day, count(*) AS n
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    per = defaultdict(dict)
    for t, d, n in daily:
        per[t][d] = n
    got = {r["event_type"]: r for r in entry.queries()["runs_test"](spark, SF_DIR).collect()}
    for t, series in per.items():
        vals = [series[d] for d in sorted(series)]
        s = sorted(vals)
        med = s[(len(s) + 1) // 2 - 1]
        seq = [1 if v > med else 0 for v in vals if v != med]
        if not seq:
            assert t not in got or got[t]["runs"] == 0
            continue
        runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
        n1, n2 = sum(seq), len(seq) - sum(seq)
        r = got[t]
        assert (r["runs"], r["n1"], r["n2"]) == (runs, n1, n2)
        if n1 and n2:
            mu = 2 * n1 * n2 / (n1 + n2) + 1
            s2 = (
                2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                / ((n1 + n2) ** 2 * (n1 + n2 - 1))
            )
            assert abs(r["runs_z"] - (runs - mu) / math.sqrt(s2)) < 1e-8


def test_durbin_watson_matches_python(spark):
    daily = duckdb.sql(
        f"""SELECT event_type,
                   CAST(floor(CAST(date_diff('microsecond',
                        TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                        / 86400000000) AS BIGINT) AS day, count(*) AS n
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    per = defaultdict(dict)
    for t, d, n in daily:
        per[t][d] = n
    got = {r["event_type"]: r for r in entry.queries()["durbin_watson"](spark, SF_DIR).collect()}
    for t, series in per.items():
        days = sorted(series)
        xs = days
        ys = [series[d] for d in days]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        e = [y - (a + b * x) for x, y in zip(xs, ys)]
        see = sum(v * v for v in e)
        sdd = sum((v - u) ** 2 for u, v in zip(e, e[1:]))
        r = got[t]
        assert r["n_days"] == n
        assert abs(r["durbin_watson"] - sdd / see) < 1e-7
        assert 0 <= r["durbin_watson"] <= 4 + 1e-9
