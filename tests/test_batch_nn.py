"""Classical inference batch — Welch t, Fisher exact 2x2, Cohen's kappa
— against independent Python references (math.comb exact rationals for
the hypergeometric, textbook formulas elsewhere)."""

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _events():
    return duckdb.sql(
        f"""SELECT event_type, user_id, value
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()


def test_welch_matches_python(spark):
    per = defaultdict(lambda: ([], []))
    for t, uid, v in _events():
        side = (uid * 2654435761) % 97 % 2
        per[t][side].append(round(v * 100))
    got = {r["event_type"]: r for r in entry.queries()["welch_ttest"](spark, SF_DIR).collect()}
    for t, (a, b) in per.items():
        if len(a) < 2 or len(b) < 2:
            assert t not in got
            continue
        n0, n1 = len(a), len(b)
        m0, m1 = sum(a) / n0, sum(b) / n1
        v0 = sum((x - m0) ** 2 for x in a) / (n0 - 1)
        v1 = sum((x - m1) ** 2 for x in b) / (n1 - 1)
        se0, se1 = v0 / n0, v1 / n1
        tt = (m1 - m0) / math.sqrt(se0 + se1)
        df = (se0 + se1) ** 2 / (se0 ** 2 / (n0 - 1) + se1 ** 2 / (n1 - 1))
        r = got[t]
        assert (r["n0"], r["n1"]) == (n0, n1)
        assert abs(r["mean0"] - m0 / 100) < 1e-6
        assert abs(r["mean1"] - m1 / 100) < 1e-6
        assert abs(r["t_welch"] - tt) < 1e-6
        assert abs(r["df_welch"] - df) < max(1e-6 * df, 1e-6)


def test_fisher_matches_exact_comb(spark):
    per = defaultdict(lambda: [0, 0, 0, 0])  # n, r1, c1, x
    for t, uid, v in _events():
        arm = (uid * 48271) % 2147483647 % 2
        s = 1 if v > 200.0 else 0
        p = per[t]
        p[0] += 1
        p[1] += arm
        p[2] += s
        p[3] += arm * s
    got = {r["event_type"]: r for r in entry.queries()["fisher_exact"](spark, SF_DIR).collect()}
    assert set(got) == set(per)
    for t, (n, r1, c1, x) in per.items():
        r = got[t]
        assert (r["n"], r["r1"], r["c1"], r["x"]) == (n, r1, c1, x)
        # exact integer hypergeometric via math.comb
        denom = math.comb(n, c1)
        pobs = math.comb(r1, x) * math.comb(n - r1, c1 - x) / denom
        p2 = sum(
            math.comb(r1, k) * math.comb(n - r1, c1 - k) / denom
            for k in range(max(0, r1 + c1 - n), min(r1, c1) + 1)
            if math.comb(r1, k) * math.comb(n - r1, c1 - k) / denom
            <= pobs * (1 + 1e-7)
        )
        assert abs(r["pmf_obs"] - pobs) < max(1e-6 * pobs, 1e-9)
        assert abs(r["p_two_sided"] - p2) < max(1e-6 * p2, 1e-9)
        assert 0 <= r["p_two_sided"] <= 1 + 1e-9


def test_kappa_matches_python(spark):
    docs = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    cm = Counter()
    for (d,) in docs:
        ra = (d * 48271 + 7) % 3
        rb = (ra + 1) % 3 if (d * 69069 + 1) % 4 == 0 else ra
        cm[(ra, rb)] += 1
    n = sum(cm.values())
    agree = sum(c for (a, b), c in cm.items() if a == b)
    na = Counter()
    nb = Counter()
    for (a, b), c in cm.items():
        na[a] += c
        nb[b] += c
    s = sum(na[c] * nb[c] for c in set(na) | set(nb))
    po = agree / n
    pe = s / (n * n)
    r = entry.queries()["cohens_kappa"](spark, SF_DIR).collect()[0]
    assert (r["n"], r["n_agree"]) == (n, agree)
    assert abs(r["po"] - po) < 1e-9
    assert abs(r["pe"] - pe) < 1e-9
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-8
    # by construction ~75% raw agreement, kappa well inside (0, 1)
    assert 0.4 < r["kappa"] < 0.9
