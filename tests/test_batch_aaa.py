"""Experimentation suite — CUPED, diff-in-diff, IPW ATE — against
straight-line Python references."""

import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
SPLIT = 19738


def _per_user():
    rows = duckdb.sql(
        f"""SELECT user_id, epoch_us(ts) // 86400000000, round(value * 100)
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    per = defaultdict(lambda: [0, 0])
    for uid, day, cents in rows:
        per[uid][0 if day < SPLIT else 1] += int(cents)
    return {
        uid: ((uid * 1103515245) % 97 % 2, x, y)
        for uid, (x, y) in per.items()
    }


def test_cuped_matches_python(spark):
    per = _per_user()
    n = len(per)
    sx = sum(x for _, x, _ in per.values())
    sy = sum(y for _, _, y in per.values())
    sxy = sum(x * y for _, x, y in per.values())
    sxx = sum(x * x for _, x, _ in per.values())
    theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    xbar = sx / n / 100.0
    got = {r["arm"]: r for r in entry.queries()["cuped_adjusted"](spark, SF_DIR).collect()}
    assert set(got) == {0, 1}
    for arm in (0, 1):
        sub = [(x, y) for a, x, y in per.values() if a == arm]
        na = len(sub)
        mx = sum(x for x, _ in sub) / na / 100.0
        my = sum(y for _, y in sub) / na / 100.0
        r = got[arm]
        assert r["n_users"] == na
        assert abs(r["mean_pre"] - mx) < 1e-7
        assert abs(r["mean_post"] - my) < 1e-7
        assert abs(r["theta"] - theta) < 1e-7
        assert abs(r["adj_mean"] - (my - theta * (mx - xbar))) < 1e-6
    # CUPED must shrink the arm contrast's dependence on pre-period
    # imbalance: adjusted means differ from raw means unless balanced
    assert 0.5 < got[0]["theta"] < 1.5 or got[0]["theta"] != 0.0


def test_did_matches_python(spark):
    per = _per_user()
    cells = defaultdict(list)
    for a, x, y in per.values():
        cells[(a, 0)].append(x)
        cells[(a, 1)].append(y)
    m = {}
    von = {}
    for k, vs in cells.items():
        nk = len(vs)
        mk = sum(vs) / nk
        var = sum((v - mk) ** 2 for v in vs) / (nk - 1)
        m[k] = mk / 100.0
        von[k] = var / nk / 10000.0
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    se = math.sqrt(sum(von.values()))
    r = entry.queries()["diff_in_diff"](spark, SF_DIR).collect()[0]
    assert abs(r["ctrl_pre"] - m[(0, 0)]) < 1e-6
    assert abs(r["ctrl_post"] - m[(0, 1)]) < 1e-6
    assert abs(r["treat_pre"] - m[(1, 0)]) < 1e-6
    assert abs(r["treat_post"] - m[(1, 1)]) < 1e-6
    assert abs(r["did"] - did) < 1e-6
    assert abs(r["se"] - se) < 1e-6
    assert abs(r["t_stat"] - did / se) < 1e-5
    # random assignment, no real treatment: effect consistent with zero
    assert abs(r["t_stat"]) < 4.0


def test_ipw_matches_python(spark):
    per = _per_user()
    sums = {0: [0, 0.0, 0.0], 1: [0, 0.0, 0.0]}
    for uid in sorted(per):
        a, _, y = per[uid]
        p = 1.0 / (1.0 + math.exp(-(-0.2 + 0.08 * (uid % 10))))
        p = min(max(p, 0.05), 0.95)
        w = 1.0 / p if a == 1 else 1.0 / (1.0 - p)
        s = sums[a]
        s[0] += 1
        s[1] += w * (y / 100.0)
        s[2] += w
    r = entry.queries()["ipw_ate"](spark, SF_DIR).collect()[0]
    assert r["n_ctrl"] == sums[0][0]
    assert r["n_treat"] == sums[1][0]
    m0 = sums[0][1] / sums[0][2]
    m1 = sums[1][1] / sums[1][2]
    assert abs(r["ipw_mean_ctrl"] - m0) < 1e-6
    assert abs(r["ipw_mean_treat"] - m1) < 1e-6
    assert abs(r["ate"] - (m1 - m0)) < 1e-6
