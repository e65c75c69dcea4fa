"""Ninth round-4 operator batch vs independent pure-python replays:
empirical semivariogram, NN G-function, Jaccard link prediction,
bibliographic coupling, recrawl-priority scheduling."""

import math
import random
from collections import defaultdict

from pyspark.sql import functions as F


def _points(spark, rows):
    from gos2_spark.spark.functions import s2_cellid

    df = spark.createDataFrame(rows, "key long, lat double, lng double")
    return df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))


def _angle(p, q):
    (lat1, lng1), (lat2, lng2) = p, q
    r1, l1, r2, l2 = map(math.radians, (lat1, lng1, lat2, lng2))
    a = (
        math.cos(l1) * math.cos(r1),
        math.sin(l1) * math.cos(r1),
        math.sin(r1),
    )
    b = (
        math.cos(l2) * math.cos(r2),
        math.sin(l2) * math.cos(r2),
        math.sin(r2),
    )
    cx = a[1] * b[2] - a[2] * b[1]
    cy = a[2] * b[0] - a[0] * b[2]
    cz = a[0] * b[1] - a[1] * b[0]
    dot = a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
    return math.atan2(math.sqrt(cx * cx + cy * cy + cz * cz), dot)


def test_semivariogram_matches_brute_force(spark):
    """Every occupied bin's (n_pairs, ssd) equals the O(n^2) replay, and
    gamma grows with distance for a spatially smooth field."""
    from gos2_spark.spark.spatialstats import semivariogram

    rng = random.Random(11)
    rows = [
        (i, rng.uniform(10.0, 18.0), rng.uniform(40.0, 48.0))
        for i in range(60)
    ]
    zval = {i: int(3 * math.floor(lat) + math.floor(lng)) for i, lat, lng in rows}
    pts = _points(spark, rows).withColumn(
        "z", (F.floor("lat") * 3 + F.floor("lng")).cast("long")
    )
    n_bins, rmax = 4, 6.0
    binw = math.radians(rmax) / n_bins
    got = {
        r["bin_idx"]: r
        for r in semivariogram(pts, rmax, n_bins, value_col="z").collect()
    }
    exp = defaultdict(lambda: [0, 0])
    for idx, (i, lat1, lng1) in enumerate(rows):
        for j, lat2, lng2 in rows[idx + 1:]:
            d = _angle((lat1, lng1), (lat2, lng2))
            if d > math.radians(rmax):
                continue
            b = min(int(d // binw), n_bins - 1)
            exp[b][0] += 1
            exp[b][1] += (zval[i] - zval[j]) ** 2
    assert set(got) == set(exp)
    gammas = []
    for b, (n, ssd) in exp.items():
        assert got[b]["n_pairs"] == n, b
        assert got[b]["ssd"] == ssd, b
        assert abs(got[b]["gamma"] - ssd / (2.0 * n)) < 1e-9
        gammas.append((b, got[b]["gamma"]))
    gammas.sort()
    # smooth field: the farthest bin is rougher than the nearest
    assert gammas[-1][1] > gammas[0][1]


def test_nn_gfunction_matches_brute_nn(spark):
    """n_within at every radius equals the true-NN replay; G is a CDF
    (monotone, ending at 1 when the largest radius covers all NNs)."""
    from gos2_spark.spark.spatialstats import nn_gfunction

    rng = random.Random(7)
    rows = [
        (i, rng.uniform(-30.0, 30.0), rng.uniform(-60.0, 60.0))
        for i in range(40)
    ]
    pts = _points(spark, rows)
    radii = [1.0, 5.0, 180.0]
    out = {r["r_deg"]: r for r in nn_gfunction(pts, radii).collect()}
    nn = {}
    for i, lat1, lng1 in rows:
        nn[i] = min(
            _angle((lat1, lng1), (lat2, lng2))
            for j, lat2, lng2 in rows
            if j != i
        )
    prev = -1
    for r in radii:
        want = sum(1 for v in nn.values() if v <= math.radians(r))
        assert out[r]["n_within"] == want, r
        assert abs(out[r]["g_hat"] - want / len(rows)) < 1e-9
        assert out[r]["n_within"] >= prev
        prev = out[r]["n_within"]
    assert out[180.0]["g_hat"] == 1.0


def test_neighbor_jaccard_matches_set_replay(spark):
    """Scores equal the literal |N(u) & N(v)| / |N(u) | N(v)| over an
    explicit adjacency map; adjacent pairs are absent."""
    from gos2_spark.pipeline.graph import neighbor_jaccard

    edges = [
        (0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 0), (4, 2), (5, 0),
        (5, 1), (6, 3),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["u"], r["v"]): r for r in neighbor_jaccard(df, "src", "dst").collect()
    }
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    want = {}
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in adj[u]:
                continue
            c = len(adj[u] & adj[v])
            if c == 0:
                continue
            want[(u, v)] = (c, len(adj[u] | adj[v]))
    assert set(got) == set(want)
    for k, (c, un) in want.items():
        assert got[k]["common_neighbors"] == c
        assert got[k]["union_neighbors"] == un
        assert abs(got[k]["jaccard"] - c / un) < 1e-9


def test_bib_coupling_is_cocitation_on_reversed_edges(spark):
    """bib_coupling(E) == cocitation(reverse(E)) — the duality that
    defines it — and matches a python replay with a hub cut."""
    from gos2_spark.pipeline.web import bib_coupling, cocitation

    rng = random.Random(3)
    edges = list(
        {
            (f"s{rng.randrange(8)}", f"d{rng.randrange(6)}")
            for _ in range(60)
        }
    )
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {
        (r["src_a"], r["src_b"]): r["n_coupled"]
        for r in bib_coupling(df, max_in_degree=5).collect()
    }
    rev = df.select(
        F.col("dst_host").alias("src_host"),
        F.col("src_host").alias("dst_host"),
    )
    dual = {
        (r["dst_a"], r["dst_b"]): r["n_cociting"]
        for r in cocitation(rev, max_out_degree=5).collect()
    }
    assert got == dual
    indeg = defaultdict(set)
    for s, d in edges:
        indeg[d].add(s)
    want = defaultdict(int)
    for d, srcs in indeg.items():
        if len(srcs) > 5:
            continue
        ss = sorted(srcs)
        for i, a in enumerate(ss):
            for b in ss[i + 1:]:
                want[(a, b)] += 1
    assert got == dict(want)


def test_recrawl_priority_replay_and_cold_start(spark):
    """Change counts, rates, and priority match a python fold; single-
    fetch and zero-age keys surface NULL rate (the cold-start bucket)."""
    from gos2_spark.pipeline.web import recrawl_priority

    day = 86_400_000_000
    rows = [
        # url 0: 3 fetches, 2 changes over 2 days, last fetch 1 day stale
        ("u0", 0 * day, 1), ("u0", 1 * day, 2), ("u0", 2 * day, 3),
        # url 1: 3 fetches, 0 changes
        ("u1", 0 * day, 7), ("u1", 2 * day, 7), ("u1", 3 * day, 7),
        # url 2: single fetch -> cold start
        ("u2", 1 * day, 9),
    ]
    df = spark.createDataFrame(
        [(u, t, fp) for u, t, fp in rows], "url string, us long, fingerprint long"
    ).select(
        "url",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "fingerprint",
    )
    got = {r["key"]: r for r in recrawl_priority(df).collect()}
    assert got["u0"]["n_changes"] == 2
    assert abs(got["u0"]["lambda_day"] - 1.0) < 1e-9
    assert abs(got["u0"]["stale_days"] - 1.0) < 1e-9
    assert abs(got["u0"]["priority"] - 1.0) < 1e-9
    assert got["u1"]["n_changes"] == 0
    assert got["u1"]["lambda_day"] == 0.0
    assert got["u1"]["priority"] == 0.0
    assert got["u2"]["n_fetches"] == 1
    assert got["u2"]["lambda_day"] is None
    assert got["u2"]["priority"] is None
