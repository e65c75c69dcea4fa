"""Smith-Waterman, exact Bayesian A/B, hour-of-day Rayleigh — Python
references (matrix DP; Monte-Carlo-free closed-form check via exact
rational Beta integrals with math.comb)."""

import math
from collections import defaultdict
from fractions import Fraction

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _sw(a, b):
    n1, n2 = len(a), len(b)
    dp = [[0] * (n2 + 1) for _ in range(n1 + 1)]
    best = 0
    for i in range(1, n1 + 1):
        for j in range(1, n2 + 1):
            sub = 1 if a[i - 1] == b[j - 1] else -1
            dp[i][j] = max(
                0, dp[i - 1][j] - 1, dp[i][j - 1] - 1, dp[i - 1][j - 1] + sub
            )
            best = max(best, dp[i][j])
    return best


def test_smith_waterman_matches_matrix_dp(spark):
    rows = duckdb.sql(
        f"""SELECT user_id, substr(event_type, 1, 1) AS ch
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, epoch_us(ts), event_id"""
    ).fetchall()
    per = defaultdict(list)
    for uid, ch in rows:
        if len(per[uid]) < 40:
            per[uid].append(ch)
    users = sorted(per)[:8]
    seqs = {u: "".join(per[u]) for u in users}
    got = {
        (r["user_a"], r["user_b"]): r["sw_score"]
        for r in entry.queries()["smith_waterman"](spark, SF_DIR).collect()
    }
    assert len(got) == 28
    nw = {
        (r["user_a"], r["user_b"]): r["nw_score"]
        for r in entry.queries()["needleman_wunsch"](spark, SF_DIR).collect()
    }
    for i, ua in enumerate(users):
        for ub in users[i + 1:]:
            want = _sw(seqs[ua], seqs[ub])
            assert got[(ua, ub)] == want
            # local alignment dominates global
            assert got[(ua, ub)] >= nw[(ua, ub)]
            assert got[(ua, ub)] >= 0


def _p_b_beats_a_exact(sa, fa, sb, fb):
    # P(pB > pA) with Beta(1,1) priors — exact rational via the identity
    # sum_{i=0}^{aB-1} B(aA+i, bA+bB) / ((bB+i) B(1+i, bB) B(aA, bA))
    # where B(x, y) = (x-1)!(y-1)!/(x+y-1)!.
    aA, bA, aB, bB = sa + 1, fa + 1, sb + 1, fb + 1

    def beta(x, y):
        return Fraction(
            math.factorial(x - 1) * math.factorial(y - 1),
            math.factorial(x + y - 1),
        )

    total = Fraction(0)
    for i in range(aB):
        total += beta(aA + i, bA + bB) / (
            (bB + i) * beta(1 + i, bB) * beta(aA, bA)
        )
    return float(total)


def test_bayes_ab_matches_exact_rational(spark):
    rows = duckdb.sql(
        f"""SELECT event_type, (user_id * 48271) % 2147483647 % 2,
                   CASE WHEN value > 200.0 THEN 1 ELSE 0 END
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    tab = defaultdict(lambda: [0, 0, 0, 0])
    for t, arm, s in rows:
        idx = arm * 2 + (1 - s)  # 0=sa,1=fa,2=sb,3=fb
        tab[t][idx] += 1
    got = {r["event_type"]: r for r in entry.queries()["bayes_ab"](spark, SF_DIR).collect()}
    assert set(got) == set(tab)
    for t, (sa, fa, sb, fb) in tab.items():
        r = got[t]
        assert (r["succ_a"], r["fail_a"], r["succ_b"], r["fail_b"]) == (
            sa, fa, sb, fb,
        )
        want = _p_b_beats_a_exact(sa, fa, sb, fb)
        assert abs(r["p_b_beats_a"] - want) < 1e-6
        assert 0 <= r["p_b_beats_a"] <= 1 + 1e-9


def test_hod_rayleigh_matches_python(spark):
    rows = duckdb.sql(
        f"""SELECT event_type, event_id, epoch_us(ts) % 86400000000
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    per = defaultdict(list)
    for t, eid, us in rows:
        per[t].append(us / 86400e6 * 2 * math.pi)
    got = {r["event_type"]: r for r in entry.queries()["hod_rayleigh"](spark, SF_DIR).collect()}
    for t, ths in per.items():
        n = len(ths)
        sc = sum(math.cos(x) for x in ths)
        ss = sum(math.sin(x) for x in ths)
        rr = math.sqrt(sc * sc + ss * ss) / n
        mh = ((math.atan2(ss, sc) + 2 * math.pi) % (2 * math.pi)) / (
            2 * math.pi
        ) * 24
        row = got[t]
        assert row["n_events"] == n
        assert abs(row["mean_hour"] - mh) < 1e-6
        assert abs(row["resultant_r"] - rr) < 1e-8
        assert abs(row["rayleigh_z"] - n * rr * rr) < 1e-6
        assert 0 <= row["mean_hour"] < 24
        assert 0 <= row["resultant_r"] <= 1
