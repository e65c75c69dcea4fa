"""Retrieval eval + correlation matrix + minimum enclosing cap —
independent Python references (including a from-scratch MEC check)."""

import math
from collections import defaultdict
from itertools import combinations

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_mrr_map_matches_python(spark):
    ranked = entry.queries()["bm25_topk"](spark, SF_DIR).collect()
    per = defaultdict(list)
    for r in ranked:
        per[r["query_id"]].append((r["rank"], r["doc_id"]))
    got = {r["query_id"]: r for r in entry.queries()["mrr_map_bm25"](spark, SF_DIR).collect()}
    assert set(got) == set(per)
    for q, docs in per.items():
        docs.sort()
        rels = [(rank, int(d % 4 >= 2)) for rank, d in docs]
        n_rel = sum(x for _, x in rels)
        first = next((rank for rank, x in rels if x), None)
        hits = 0
        psum = 0.0
        for rank, x in rels:
            hits += x
            if x:
                psum += hits / rank
        r = got[q]
        assert r["n_rel"] == n_rel
        assert r["first_rel_rank"] == (first or 0)
        assert abs(r["rr"] - (1.0 / first if first else 0.0)) < 1e-9
        want_ap = psum / n_rel if n_rel else 0.0
        assert abs(r["ap"] - want_ap) < 1e-8
        assert 0 <= r["ap"] <= 1 + 1e-9


def test_pearson_matrix_matches_python(spark):
    rows = duckdb.sql(
        f"""SELECT epoch_us(ts) // 86400000000, event_type, count(*)
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    days = sorted({d for d, _, _ in rows})
    d0, d1 = min(days), max(days)
    types = sorted({t for _, t, _ in rows})
    series = {t: {d: 0 for d in range(d0, d1 + 1)} for t in types}
    for d, t, n in rows:
        series[t][d] = n
    got = {
        (r["type_a"], r["type_b"]): r
        for r in entry.queries()["pearson_daily_matrix"](spark, SF_DIR).collect()
    }
    assert len(got) == len(types) * (len(types) - 1) // 2
    for a, b in combinations(types, 2):
        xs = [series[a][d] for d in range(d0, d1 + 1)]
        ys = [series[b][d] for d in range(d0, d1 + 1)]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        r = got[(a, b)]
        assert r["n_days"] == n
        if vx > 0 and vy > 0:
            want = (n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy))
            assert abs(r["pearson_r"] - want) < 1e-8


def _vec(lat, lng):
    la, lo = math.radians(lat), math.radians(lng)
    return (
        math.cos(lo) * math.cos(la),
        math.sin(lo) * math.cos(la),
        math.sin(la),
    )


def test_min_enclosing_cap_matches_brute(spark):
    rows = duckdb.sql(
        f"SELECT c_custkey FROM read_parquet('{SF_DIR}/customer.parquet') ORDER BY 1 LIMIT 48"
    ).fetchall()
    pts = []
    for (k,) in rows:
        lat = -60.0 + (k * 7 % 120) + (k % 97) / 97.0
        lng = -170.0 + (k * 13 % 340) + (k % 89) / 89.0
        pts.append(_vec(lat, lng))

    def angle(c, p):
        d = max(-1.0, min(1.0, c[0] * p[0] + c[1] * p[1] + c[2] * p[2]))
        return math.acos(d)

    def norm(v):
        n = math.sqrt(v[0] ** 2 + v[1] ** 2 + v[2] ** 2)
        return (v[0] / n, v[1] / n, v[2] / n) if n > 0 else None

    cands = []
    for a, b in combinations(pts, 2):
        c = norm((a[0] + b[0], a[1] + b[1], a[2] + b[2]))
        if c:
            cands.append(c)
    for a, b, c3 in combinations(pts, 3):
        u = (b[0] - a[0], b[1] - a[1], b[2] - a[2])
        w = (c3[0] - a[0], c3[1] - a[1], c3[2] - a[2])
        n = (
            u[1] * w[2] - u[2] * w[1],
            u[2] * w[0] - u[0] * w[2],
            u[0] * w[1] - u[1] * w[0],
        )
        c = norm(n)
        if c:
            cands.append(c)
            cands.append((-c[0], -c[1], -c[2]))
    best = min(max(angle(c, p) for p in pts) for c in cands)
    r = entry.queries()["min_enclosing_cap"](spark, SF_DIR).collect()[0]
    assert r["n_points"] == 48
    # engine optimum must equal the brute optimum
    assert abs(r["radius_rad"] - best) < 1e-9
    # and the reported center must cover every point at that radius
    c = _vec(r["center_lat"], r["center_lng"])
    assert max(angle(c, p) for p in pts) <= r["radius_rad"] + 1e-8
    assert 0 < r["radius_rad"] < math.pi
