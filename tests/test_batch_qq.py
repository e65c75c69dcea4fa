"""Mobility analytics batch — home/work anchors, gap histogram, tile
dwell time — against straight-line Python references."""

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _rows():
    return duckdb.sql(
        f"""SELECT user_id, epoch_us(ts) AS us, event_id
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, us, event_id"""
    ).fetchall()


def _tile(eid):
    lat = -60.0 + (eid * 11 % 120) + (eid % 83) / 83.0
    lng = -170.0 + (eid * 17 % 340) + (eid % 79) / 79.0
    return int(math.floor(lat / 2.0)), int(math.floor(lng / 2.0))


def _angle_tiles(a, b):
    la1, lo1 = math.radians(2 * a[0] + 1), math.radians(2 * a[1] + 1)
    la2, lo2 = math.radians(2 * b[0] + 1), math.radians(2 * b[1] + 1)
    v1 = (
        math.cos(lo1) * math.cos(la1),
        math.sin(lo1) * math.cos(la1),
        math.sin(la1),
    )
    v2 = (
        math.cos(lo2) * math.cos(la2),
        math.sin(lo2) * math.cos(la2),
        math.sin(la2),
    )
    cx = v1[1] * v2[2] - v1[2] * v2[1]
    cy = v1[2] * v2[0] - v1[0] * v2[2]
    cz = v1[0] * v2[1] - v1[1] * v2[0]
    return math.atan2(
        math.sqrt(cx * cx + cy * cy + cz * cz),
        v1[0] * v2[0] + v1[1] * v2[1] + v1[2] * v2[2],
    )


def test_home_work_matches_brute(spark):
    per = defaultdict(lambda: {"home": Counter(), "work": Counter()})
    for uid, us, eid in _rows():
        hod = (us // 3600000000) % 24
        period = "home" if hod <= 6 else ("work" if 9 <= hod <= 17 else None)
        if period:
            per[uid][period][_tile(eid)] += 1
    got = {r["user_id"]: r for r in entry.queries()["home_work_cells"](spark, SF_DIR).collect()}
    expect_users = {
        u for u, p in per.items() if p["home"] and p["work"]
    }
    assert set(got) == expect_users
    for u in expect_users:
        home = min(per[u]["home"].items(), key=lambda kv: (-kv[1], kv[0]))
        work = min(per[u]["work"].items(), key=lambda kv: (-kv[1], kv[0]))
        r = got[u]
        assert (r["home_r"], r["home_c"], r["n_home"]) == (*home[0], home[1])
        assert (r["work_r"], r["work_c"], r["n_work"]) == (*work[0], work[1])
        assert abs(r["commute_rad"] - _angle_tiles(home[0], work[0])) < 1e-8


def test_gap_histogram_matches_brute(spark):
    gaps = []
    prev = {}
    for uid, us, eid in _rows():
        if uid in prev:
            gaps.append(us - prev[uid])
        prev[uid] = us
    buckets = Counter()
    mn, mx = {}, {}
    for g in gaps:
        b = 0 if g == 0 else len(str(g))
        buckets[b] += 1
        mn[b] = min(mn.get(b, g), g)
        mx[b] = max(mx.get(b, g), g)
    got = {r["bucket"]: r for r in entry.queries()["gap_log_histogram"](spark, SF_DIR).collect()}
    assert set(got) == set(buckets)
    for b in buckets:
        r = got[b]
        assert r["n_gaps"] == buckets[b]
        assert r["min_gap_us"] == mn[b]
        assert r["max_gap_us"] == mx[b]
    assert sum(buckets.values()) == len(gaps)


def test_dwell_matches_brute(spark):
    per_user = defaultdict(list)
    for uid, us, eid in _rows():
        per_user[uid].append((us, eid))
    agg = defaultdict(lambda: [0, 0])
    for seq in per_user.values():
        for (us, eid), (nus, _) in zip(seq, seq[1:]):
            t = _tile(eid)
            agg[t][0] += 1
            agg[t][1] += nus - us
    got = {(r["r"], r["c"]): r for r in entry.queries()["dwell_time_cells"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for t, (n, tot) in agg.items():
        r = got[t]
        assert r["n_visits"] == n
        assert r["total_dwell_us"] == tot
        assert abs(r["mean_dwell_us"] - tot / n) < 1e-6
