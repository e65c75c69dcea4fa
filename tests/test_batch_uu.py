"""Token bucket, trajectory tortuosity, bilinear sampling — Python
reference implementations including a sequential bucket simulator."""

import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _rows():
    return duckdb.sql(
        f"""SELECT user_id, epoch_us(ts) AS us, event_id
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, us, event_id"""
    ).fetchall()


def test_token_bucket_matches_simulator(spark):
    per = defaultdict(list)
    for uid, us, eid in _rows():
        per[uid].append(us)
    got = {r["user_id"]: r for r in entry.queries()["token_bucket_gate"](spark, SF_DIR).collect()}
    assert set(got) == set(per)
    any_denied = False
    for uid, times in per.items():
        tokens, prev, allowed = 2.0, None, 0
        for us in times:
            if prev is not None:
                tokens = min(2.0, tokens + (us - prev) / 4.0e10)
            else:
                tokens = 2.0
            if tokens >= 1.0:
                tokens -= 1.0
                allowed += 1
            prev = us
        r = got[uid]
        assert r["n_events"] == len(times)
        assert r["n_allowed"] == allowed
        assert r["n_denied"] == len(times) - allowed
        assert abs(r["tokens_left"] - tokens) < 1e-6
        if r["n_denied"]:
            any_denied = True
    assert any_denied  # the bucket must actually bite on bursts


def _vec(eid):
    lat = math.radians(-60.0 + (eid * 11 % 120) + (eid % 83) / 83.0)
    lng = math.radians(-170.0 + (eid * 17 % 340) + (eid % 79) / 79.0)
    return (
        math.cos(lng) * math.cos(lat),
        math.sin(lng) * math.cos(lat),
        math.sin(lat),
    )


def _ang(a, b):
    cx = a[1] * b[2] - a[2] * b[1]
    cy = a[2] * b[0] - a[0] * b[2]
    cz = a[0] * b[1] - a[1] * b[0]
    return math.atan2(
        math.sqrt(cx * cx + cy * cy + cz * cz),
        a[0] * b[0] + a[1] * b[1] + a[2] * b[2],
    )


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def test_tortuosity_matches_python(spark):
    per = defaultdict(list)
    for uid, us, eid in _rows():
        per[uid].append(_vec(eid))
    got = {r["user_id"]: r for r in entry.queries()["trajectory_tortuosity"](spark, SF_DIR).collect()}
    for uid, seq in per.items():
        if len(seq) < 3:
            assert uid not in got
            continue
        legs = [_ang(a, b) for a, b in zip(seq, seq[1:])]
        normals = [_cross(a, b) for a, b in zip(seq, seq[1:])]
        turns = [_ang(p, q) for p, q in zip(normals, normals[1:])]
        path = sum(legs)
        direct = _ang(seq[0], seq[-1])
        r = got[uid]
        assert r["n_legs"] == len(legs)
        assert abs(r["path_len_rad"] - path) < 1e-7
        assert abs(r["direct_rad"] - direct) < 1e-8
        if direct > 0:
            assert abs(r["tortuosity"] - path / direct) < 1e-5
            assert r["tortuosity"] >= 1.0 - 1e-9
        assert abs(r["mean_turn_rad"] - sum(turns) / len(legs[1:] or [1])) < 1e-6


def test_bilinear_matches_python(spark):
    def elev(r, c):
        return ((r + 100) * 1299721 + (c + 100) * 7919) * 48271 % 1000003 % 4000

    agg = defaultdict(lambda: [0, 0, None, None])
    for _, _, eid in _rows():
        lat = -60.0 + (eid * 11 % 120) + (eid % 83) / 83.0
        lng = -170.0 + (eid * 17 % 340) + (eid % 79) / 79.0
        gr, gc = lat / 2.0 - 0.5, lng / 2.0 - 0.5
        r0, c0 = math.floor(gr), math.floor(gc)
        fr, fc = gr - r0, gc - c0
        b = (
            elev(r0, c0) * (1 - fr) * (1 - fc)
            + elev(r0, c0 + 1) * (1 - fr) * fc
            + elev(r0 + 1, c0) * fr * (1 - fc)
            + elev(r0 + 1, c0 + 1) * fr * fc
        )
        band = math.floor(lat / 10.0)
        a = agg[band]
        a[0] += 1
        a[1] += round(b * 1e6)
        a[2] = b if a[2] is None else min(a[2], b)
        a[3] = b if a[3] is None else max(a[3], b)
    got = {r["band"]: r for r in entry.queries()["bilinear_elevation"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for band, (n, s, mn, mx) in agg.items():
        r = got[band]
        assert r["n_events"] == n
        assert abs(r["sum_bilinear"] - s / 1e6) < 1e-4
        assert abs(r["min_bilinear"] - mn) < 1e-7
        assert abs(r["max_bilinear"] - mx) < 1e-7
        assert 0 <= r["min_bilinear"] <= r["max_bilinear"] <= 4000
