"""Apportionment pair + Atkinson index — Python references including
apportionment invariants (seats sum to budget, quota monotonicity)."""

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
B = 1000


def _weights():
    return dict(
        duckdb.sql(
            f"""SELECT source, count(*) FROM
                read_parquet('{SF_DIR}/documents.parquet') GROUP BY 1"""
        ).fetchall()
    )


def test_hamilton_matches_python(spark):
    w = _weights()
    wt = sum(w.values())
    floor = {s: (c * B) // wt for s, c in w.items()}
    rem = {s: (c * B) % wt for s, c in w.items()}
    leftover = B - sum(floor.values())
    order = sorted(w, key=lambda s: (-rem[s], s))
    seats = dict(floor)
    for s in order[:leftover]:
        seats[s] += 1
    got = {r["source"]: r for r in entry.queries()["crawl_budget_lrm"](spark, SF_DIR).collect()}
    assert set(got) == set(w)
    for s in w:
        r = got[s]
        assert r["n_docs"] == w[s]
        assert r["floor_seats"] == floor[s]
        assert r["remainder"] == rem[s]
        assert r["seats"] == seats[s]
    assert sum(r["seats"] for r in got.values()) == B
    # Hamilton satisfies quota: floor(q) <= seats <= ceil(q)
    for s in w:
        q = w[s] * B / wt
        assert math.floor(q) <= got[s]["seats"] <= math.ceil(q)


def test_dhondt_matches_python(spark):
    w = _weights()
    quots = []
    for s, c in w.items():
        for k in range(1, B + 1):
            quots.append((-(c * 1000000000 // k), s, k))
    quots.sort()
    seats = Counter(s for _, s, _ in quots[:B])
    got = {r["source"]: r for r in entry.queries()["crawl_budget_dhondt"](spark, SF_DIR).collect()}
    assert set(got) == set(w)
    for s in w:
        assert got[s]["n_docs"] == w[s]
        assert got[s]["seats"] == seats.get(s, 0)
    assert sum(r["seats"] for r in got.values()) == B


def test_atkinson_matches_python(spark):
    rows = duckdb.sql(
        f"""SELECT event_type, user_id, round(value * 100)
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    per = defaultdict(lambda: defaultdict(int))
    for t, uid, cents in rows:
        per[t][uid] += int(cents)
    got = {r["event_type"]: r for r in entry.queries()["atkinson_index"](spark, SF_DIR).collect()}
    for t, users in per.items():
        xs = [x for x in users.values() if x > 0]
        n = len(xs)
        ssq = sum(round(math.sqrt(x) * 1e6) for x in xs)
        mean_sqrt = ssq / 1e6 / n
        mean_x = sum(xs) / n
        a = 1.0 - mean_sqrt * mean_sqrt / mean_x
        r = got[t]
        assert r["n_users"] == n
        assert r["total_cents"] == sum(xs)
        assert abs(r["atkinson_05"] - a) < 1e-8
        assert 0.0 <= r["atkinson_05"] < 1.0
