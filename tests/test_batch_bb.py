"""Markov entropy rate, SPRT, Chapman estimator, Good-Turing — python
references and statistical identities."""

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_markov_entropy_matches_python(spark):
    ev = duckdb.sql(
        f"""SELECT user_id, event_type,
                   epoch_us(ts - TIMESTAMP '1970-01-01 00:00:00') AS us,
                   event_id
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    seqs = defaultdict(list)
    for u, t, us, eid in ev:
        seqs[u].append((us, eid, t))
    tr = Counter()
    for rows in seqs.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            tr[(a, b)] += 1
    total = sum(tr.values())
    row = Counter()
    for (a, _), c in tr.items():
        row[a] += c
    h = -sum(c / total * math.log(c / row[a]) for (a, _), c in tr.items())
    r = entry.queries()["markov_entropy_rate"](spark, SF_DIR).collect()[0]
    assert r["n_transitions"] == total
    assert abs(r["entropy_rate"] - h) < 1e-8
    assert abs(r["perplexity"] - math.exp(h)) < 1e-6
    # entropy rate bounded by log of state count
    assert 0 <= r["entropy_rate"] <= math.log(5) + 1e-9


def test_sprt_matches_python(spark):
    ev = duckdb.sql(
        f"""SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' AND value >= 200.0
                       THEN 1 ELSE 0 END) AS conv
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"""
    ).fetchall()
    la, lb, thresh = 0.15415067982725836, -0.07410797215372197, 2.9444389791664403
    k = 0
    up = dn = None
    for n, (_, conv) in enumerate(sorted(ev), start=1):
        k += conv
        llr = k * la + (n - k) * lb
        if llr >= thresh and up is None:
            up = n
        if llr <= -thresh and dn is None:
            dn = n
    r = entry.queries()["sprt_conversion"](spark, SF_DIR).collect()[0]
    assert r["n_users"] == len(ev) and r["n_converted"] == k
    big = 1 << 62
    first = min(up or big, dn or big)
    assert r["first_cross_n"] == (None if first == big else first)
    want = (
        "continue"
        if up is None and dn is None
        else ("accept_h1" if (up or big) <= (dn or big) else "accept_h0")
    )
    assert r["decision"] == want


def test_chapman_consistency(spark):
    r = entry.queries()["chapman_overlap"](spark, SF_DIR).collect()[0]
    # estimator defined, overlap bounded by both margins
    assert 0 <= r["n_both"] <= min(r["n1"], r["n2"])
    assert r["n1"] <= r["n_docs"] and r["n2"] <= r["n_docs"]
    # Chapman is consistent: with ~2/3 sampling on each side the estimate
    # should land within 25% of the truth at these sizes
    assert abs(r["chapman_estimate"] - r["n_docs"]) / r["n_docs"] < 0.25


def test_good_turing_matches_python(spark):
    import re

    docs = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    cnt = Counter()
    for (text,) in docs:
        cnt.update(t for t in re.split(r"[^a-z]+", text.lower()) if t)
    fof = Counter(cnt.values())
    got = {r["r"]: r for r in entry.queries()["good_turing_counts"](spark, SF_DIR).collect()}
    for r in range(1, 11):
        if r not in fof:
            assert r not in got
            continue
        assert got[r]["n_r"] == fof[r]
        if r + 1 in fof:
            assert abs(got[r]["r_star"] - (r + 1) * fof[r + 1] / fof[r]) < 1e-9
        else:
            assert got[r]["r_star"] is None
