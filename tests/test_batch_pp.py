"""Stylometry + time-series batch — Burrows' Delta, lagged CCF, Hurst
R/S — against straight-line Python references."""

import math
import re
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_burrows_delta_matches_python(spark):
    docs = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    per = defaultdict(Counter)
    corpus = Counter()
    for src, text in docs:
        toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
        per[src].update(toks)
        corpus.update(toks)
    top = [
        t for t, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    ]
    sources = sorted(per)
    tot = {s: sum(per[s].values()) for s in sources}
    f = {(s, t): per[s][t] / tot[s] for s in sources for t in top}
    z = {}
    for t in top:
        vals = [f[(s, t)] for s in sources]
        mu = sum(vals) / len(vals)
        sig = math.sqrt(sum(v * v for v in vals) / len(vals) - mu * mu)
        for s in sources:
            z[(s, t)] = (f[(s, t)] - mu) / sig if sig > 0 else 0.0
    got = {
        (r["source_a"], r["source_b"]): r["delta"]
        for r in entry.queries()["burrows_delta"](spark, SF_DIR).collect()
    }
    assert len(got) == len(sources) * (len(sources) - 1) // 2
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            want = sum(abs(z[(a, t)] - z[(b, t)]) for t in top) / 30.0
            assert abs(got[(a, b)] - want) < 1e-7
            assert got[(a, b)] >= 0


def _hourly(filter_type=None):
    cond = f"WHERE event_type = '{filter_type}'" if filter_type else ""
    rows = duckdb.sql(
        f"""SELECT epoch_us(ts) // 3600000000 AS h, count(*)
            FROM read_parquet('{SF_DIR}/events.parquet') {cond}
            GROUP BY 1"""
    ).fetchall()
    return dict(rows)


def test_ccf_matches_python(spark):
    allh = duckdb.sql(
        f"""SELECT min(epoch_us(ts) // 3600000000),
                   max(epoch_us(ts) // 3600000000)
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchone()
    h0, h1 = allh
    cx, cy = _hourly("click"), _hourly("view")
    xs = [cx.get(h, 0) for h in range(h0, h1 + 1)]
    ys = [cy.get(h, 0) for h in range(h0, h1 + 1)]
    n_all = len(xs)
    got = {r["lag"]: r for r in entry.queries()["ccf_clicks_views"](spark, SF_DIR).collect()}
    assert set(got) == set(range(-24, 25))
    for lag in range(-24, 25):
        pairs = [
            (xs[i], ys[i + lag])
            for i in range(n_all)
            if 0 <= i + lag < n_all
        ]
        n = len(pairs)
        assert got[lag]["n_hours"] == n == n_all - abs(lag)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx > 0 and vy > 0:
            want = (n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy))
            assert abs(got[lag]["r_ccf"] - want) < 1e-8
            assert -1 - 1e-9 <= got[lag]["r_ccf"] <= 1 + 1e-9
        else:
            assert got[lag]["r_ccf"] is None


def test_hurst_matches_python(spark):
    allh = duckdb.sql(
        f"""SELECT min(epoch_us(ts) // 3600000000),
                   max(epoch_us(ts) // 3600000000)
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchone()
    h0, h1 = allh
    c = _hourly()
    xs = [c.get(h, 0) for h in range(h0, h1 + 1)]
    n = len(xs)
    got = {r["m"]: r for r in entry.queries()["hurst_rs"](spark, SF_DIR).collect()}
    ys = {}
    for m in (8, 16, 32, 64):
        rss = []
        for b in range(n // m):
            blk = xs[b * m:(b + 1) * m]
            mean = sum(blk) / m
            s2 = sum(v * v for v in blk) / m - mean * mean
            if s2 <= 0:
                continue
            cum = 0.0
            mx = mn = 0.0
            for v in blk:
                cum += v - mean
                mx = max(mx, cum)
                mn = min(mn, cum)
            rss.append((mx - mn) / math.sqrt(s2))
        mean_rs = sum(rss) / len(rss)
        ys[m] = math.log2(mean_rs)
        r = got[m]
        assert r["n_blocks"] == len(rss)
        assert abs(r["mean_rs"] - mean_rs) < 1e-7
    hurst = (
        -1.5 * ys[8] - 0.5 * ys[16] + 0.5 * ys[32] + 1.5 * ys[64]
    ) / 5.0
    for m in (8, 16, 32, 64):
        assert abs(got[m]["hurst"] - hurst) < 1e-7
    # hourly counts of a memoryless arrival process: H near 0.5, in (0,1)
    assert 0.0 < got[8]["hurst"] < 1.0
