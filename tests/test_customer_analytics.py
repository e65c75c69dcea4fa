"""RFM segmentation, skip-gram pairs, winsorized stats — python
references over the raw parquet."""

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _events():
    return duckdb.sql(
        f"""SELECT user_id, event_type,
                   epoch_us(ts - TIMESTAMP '1970-01-01 00:00:00') AS us,
                   event_id, value
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()


def test_rfm_matches_python(spark):
    ev = _events()
    max_day = max(us // 86_400_000_000 for _, _, us, _, _ in ev)
    per = {}
    for u, t, us, _, v in ev:
        if t != "purchase":
            continue
        d = us // 86_400_000_000
        rec = per.setdefault(u, [None, 0, 0])
        rec[0] = d if rec[0] is None else max(rec[0], d)
        rec[1] += 1
        rec[2] += round(v * 100)
    got = {r["user_id"]: r for r in entry.queries()["rfm_segments"](spark, SF_DIR).collect()}
    assert set(got) == set(per)
    for u, (last, freq, cents) in per.items():
        r = got[u]
        assert r["recency_days"] == max_day - last
        assert r["frequency"] == freq
        assert r["monetary_cents"] == cents
        assert 1 <= r["r_score"] <= 5 and 1 <= r["f_score"] <= 5

    # quintile monotonicity: sorting by frequency (tie user_id) gives
    # non-decreasing f_score
    order = sorted(per, key=lambda u: (per[u][1], u))
    scores = [got[u]["f_score"] for u in order]
    assert scores == sorted(scores)


def test_skipgrams_match_python(spark):
    ev = _events()
    seqs = defaultdict(list)
    for u, t, us, eid, _ in ev:
        seqs[u].append((us, eid, t))
    ref = Counter()
    for u, rows in seqs.items():
        rows.sort()
        for i, (_, _, ta) in enumerate(rows):
            for _, _, tb in rows[i + 1 : i + 6]:
                ref[(ta, tb)] += 1
    got = {
        (r["type_a"], r["type_b"]): r["n_pairs"]
        for r in entry.queries()["event_skipgrams"](spark, SF_DIR).collect()
    }
    assert got == dict(ref)


def test_winsorized_matches_python(spark):
    ev = _events()
    per = defaultdict(list)
    for _, t, _, eid, v in ev:
        per[t].append((round(v * 100), eid))
    got = {
        r["event_type"]: r
        for r in entry.queries()["winsorized_values"](spark, SF_DIR).collect()
    }
    for t, vals in per.items():
        vals.sort()
        n = len(vals)
        k = max(1, math.ceil(0.1 * n))
        lo = vals[k - 1][0]
        hi = vals[n - k][0]
        cs = sum(min(hi, max(lo, c)) for c, _ in vals)
        r = got[t]
        assert r["n_obs"] == n
        assert r["lo_fence"] == lo / 100.0 and r["hi_fence"] == hi / 100.0
        assert abs(r["winsorized_mean"] - cs / n / 100.0) < 1e-9
        # winsorized mean sits inside the fences
        assert lo / 100.0 <= r["winsorized_mean"] <= hi / 100.0
