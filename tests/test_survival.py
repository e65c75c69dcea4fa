"""Kaplan-Meier / Nelson-Aalen (spark/survival.py) vs a pure-python
reference implementation and textbook fixtures."""

import random
from collections import Counter

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _km_reference(subjects):
    """subjects: list of (t, observed). Returns {t: (n_risk, d, c, S, H)}
    at event times only."""
    deaths = Counter(t for t, e in subjects if e)
    cens = Counter(t for t, e in subjects if not e)
    out = {}
    s, h = 1.0, 0.0
    for t in sorted(set(deaths) | set(cens)):
        n = sum(1 for u, _ in subjects if u >= t)
        d = deaths.get(t, 0)
        if d:
            s *= (n - d) / n
            h += d / n
            out[t] = (n, d, cens.get(t, 0), s, h)
    return out


def test_km_matches_python_reference(spark):
    from gos2_spark.spark.survival import kaplan_meier

    rng = random.Random(23)
    subjects = [
        (rng.randint(1, 15), rng.random() < 0.7) for _ in range(300)
    ]
    rows = [("k", t, int(e)) for t, e in subjects]
    df = spark.createDataFrame(rows, "k string, t long, observed int")
    got = {r["t"]: r for r in kaplan_meier(df, "k", "t", "observed").collect()}
    ref = _km_reference(subjects)
    assert set(got) == set(ref)
    for t, (n, d, c, s, h) in ref.items():
        r = got[t]
        assert (r["n_risk"], r["n_events"], r["n_censored"]) == (n, d, c)
        assert abs(r["survival"] - s) < 1e-9
        assert abs(r["cum_hazard"] - h) < 1e-9


def test_km_textbook_fixture_no_censoring(spark):
    from gos2_spark.spark.survival import kaplan_meier

    # classic all-observed case: S drops to 0 at the max time and equals
    # the empirical survivor function at each death time
    times = [1, 1, 2, 3, 3, 3, 5]
    df = spark.createDataFrame(
        [("k", t, 1) for t in times], "k string, t long, observed int"
    )
    got = {r["t"]: r for r in kaplan_meier(df, "k", "t", "observed").collect()}
    n = len(times)
    assert abs(got[1]["survival"] - 5 / 7) < 1e-9
    assert abs(got[2]["survival"] - 4 / 7) < 1e-9
    assert abs(got[3]["survival"] - 1 / 7) < 1e-9
    assert got[5]["survival"] == 0.0
    assert got[1]["n_risk"] == n and got[5]["n_risk"] == 1


def test_km_censoring_shrinks_risk_but_not_survival_step(spark):
    from gos2_spark.spark.survival import kaplan_meier

    # censored-only times never appear as output rows, but they reduce
    # later risk sets (the whole point of KM vs naive ECDF)
    rows = [("k", 2, 1), ("k", 2, 1), ("k", 3, 0), ("k", 4, 1), ("k", 5, 0)]
    df = spark.createDataFrame(rows, "k string, t long, observed int")
    got = {r["t"]: r for r in kaplan_meier(df, "k", "t", "observed").collect()}
    assert set(got) == {2, 4}
    assert got[2]["n_risk"] == 5
    assert got[4]["n_risk"] == 2          # the t=3 censor left the risk set
    assert abs(got[2]["survival"] - 3 / 5) < 1e-9
    assert abs(got[4]["survival"] - 3 / 5 * 1 / 2) < 1e-9


def test_driver_km_query_shape(spark):
    got = entry.queries()["km_second_event"](spark, SF_DIR).collect()
    assert len(got) > 0
    by_type = {}
    for r in got:
        by_type.setdefault(r["event_type"], []).append(r)
    for rows in by_type.values():
        ts = [r["t"] for r in rows]
        assert ts == sorted(ts)
        survs = [r["survival"] for r in rows]
        assert all(a >= b - 1e-9 for a, b in zip(survs, survs[1:]))  # monotone
        hazs = [r["cum_hazard"] for r in rows]
        assert all(a <= b + 1e-9 for a, b in zip(hazs, hazs[1:]))
