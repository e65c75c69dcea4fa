"""Burstiness/memory, RANSAC trend, Needleman-Wunsch — independent
Python references (classic 2-D DP matrix for NW)."""

import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_burstiness_memory_matches_python(spark):
    rows = duckdb.sql(
        f"""SELECT user_id, epoch_us(ts) AS us, event_id
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, us, event_id"""
    ).fetchall()
    per = defaultdict(list)
    for uid, us, _ in rows:
        per[uid].append(us)
    got = {r["user_id"]: r for r in entry.queries()["burstiness_memory"](spark, SF_DIR).collect()}
    for uid, times in per.items():
        gaps = [(b - a) / 1e6 for a, b in zip(times, times[1:])]
        if len(gaps) < 3:
            assert uid not in got
            continue
        n = len(gaps)
        mu = sum(gaps) / n
        sig = math.sqrt(sum(g * g for g in gaps) / n - mu * mu)
        b = (sig - mu) / (sig + mu) if sig + mu > 0 else 0.0
        xs, ys = gaps[:-1], gaps[1:]
        m = len(xs)
        sa, sb = sum(xs), sum(ys)
        sab = sum(x * y for x, y in zip(xs, ys))
        saa = sum(x * x for x in xs)
        sbb = sum(y * y for y in ys)
        va, vb = m * saa - sa * sa, m * sbb - sb * sb
        mem = (
            (m * sab - sa * sb) / (math.sqrt(va) * math.sqrt(vb))
            if va > 0 and vb > 0
            else 0.0
        )
        r = got[uid]
        assert r["n_gaps"] == n
        assert abs(r["mean_gap_s"] - mu) < 1e-5
        assert abs(r["burstiness"] - b) < 1e-7
        assert abs(r["memory_coeff"] - mem) < 1e-7
        assert -1 - 1e-9 <= r["burstiness"] <= 1 + 1e-9


def test_ransac_matches_python(spark):
    daily = dict(
        duckdb.sql(
            f"""SELECT epoch_us(ts) // 86400000000, count(*)
                FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"""
        ).fetchall()
    )
    days = sorted(daily)
    best = None
    for i, d1 in enumerate(days):
        for d2 in days[i + 1:]:
            slope = (daily[d2] - daily[d1]) / (d2 - d1)
            inter = daily[d1] - slope * d1
            inl = sum(
                1
                for d in days
                if abs(daily[d] - (inter + slope * d)) <= 15.0
            )
            key = (-inl, d1 * 100000 + d2)
            if best is None or key < best[0]:
                best = (key, d1, d2, slope, inter, inl)
    r = entry.queries()["ransac_trend"](spark, SF_DIR).collect()[0]
    assert (r["d1"], r["d2"], r["n_inliers"]) == (best[1], best[2], best[5])
    assert abs(r["slope"] - best[3]) < 1e-9
    assert abs(r["intercept"] - best[4]) < 1e-6
    assert r["n_inliers"] >= 3


def _nw(a, b):
    n1, n2 = len(a), len(b)
    dp = [[0] * (n2 + 1) for _ in range(n1 + 1)]
    for i in range(n1 + 1):
        dp[i][0] = -i
    for j in range(n2 + 1):
        dp[0][j] = -j
    for i in range(1, n1 + 1):
        for j in range(1, n2 + 1):
            sub = 1 if a[i - 1] == b[j - 1] else -1
            dp[i][j] = max(
                dp[i - 1][j] - 1, dp[i][j - 1] - 1, dp[i - 1][j - 1] + sub
            )
    return dp[n1][n2]


def test_needleman_wunsch_matches_matrix_dp(spark):
    rows = duckdb.sql(
        f"""SELECT user_id, epoch_us(ts) AS us, event_id,
                   substr(event_type, 1, 1) AS ch
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, us, event_id"""
    ).fetchall()
    per = defaultdict(list)
    for uid, _, _, ch in rows:
        if len(per[uid]) < 40:
            per[uid].append(ch)
    users = sorted(per)[:8]
    seqs = {u: "".join(per[u]) for u in users}
    got = {
        (r["user_a"], r["user_b"]): r
        for r in entry.queries()["needleman_wunsch"](spark, SF_DIR).collect()
    }
    assert len(got) == 28
    scores = set()
    for i, ua in enumerate(users):
        for ub in users[i + 1:]:
            r = got[(ua, ub)]
            want = _nw(seqs[ua], seqs[ub])
            assert r["len_a"] == len(seqs[ua])
            assert r["len_b"] == len(seqs[ub])
            assert r["nw_score"] == want
            # score is bounded by the shorter sequence
            assert r["nw_score"] <= min(r["len_a"], r["len_b"])
            scores.add(r["nw_score"])
    assert len(scores) > 1  # non-degenerate across pairs
