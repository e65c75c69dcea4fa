"""Categorical assortativity, GPD tail fit, grid percolation — python
references."""

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_modularity_matches_python(spark):
    ks = [
        r[0]
        for r in duckdb.sql(
            f"SELECT c_custkey FROM read_parquet('{SF_DIR}/customer.parquet')"
        ).fetchall()
    ]
    edges = set()
    for c in ks:
        for mul, add in ((7, 3), (11, 5)):
            s, d = c % 64, (c * mul + add) % 64
            if s != d:
                edges.add((s, d))
    mix = Counter((s % 5, d % 5) for s, d in edges)
    mt = sum(mix.values())
    within = sum(v for (a, b), v in mix.items() if a == b)
    ma = Counter()
    mb = Counter()
    for (a, b), v in mix.items():
        ma[a] += v
        mb[b] += v
    sab = sum(ma[c] * mb.get(c, 0) for c in ma) / (mt * mt)
    r_ref = (within / mt - sab) / (1 - sab)
    r = entry.queries()["modularity_by_group"](spark, SF_DIR).collect()[0]
    assert r["n_edges"] == mt and r["n_within"] == within
    assert abs(r["assortativity_r"] - r_ref) < 1e-8
    assert -1.0 - 1e-9 <= r["assortativity_r"] <= 1.0 + 1e-9


def test_gpd_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT event_type, round(value * 100), event_id FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    per = defaultdict(list)
    for t, c, eid in rows:
        per[t].append((int(c), eid))
    got = {r["event_type"]: r for r in entry.queries()["gpd_tail_fit"](spark, SF_DIR).collect()}
    for t, vals in per.items():
        vals.sort()
        n = len(vals)
        u = vals[math.ceil(0.9 * n) - 1][0]
        ex = [c - u for c, _ in vals if c > u]
        m = len(ex)
        mean = sum(ex) / m
        var = (m * sum(x * x for x in ex) - sum(ex) ** 2) / (m * (m - 1))
        ratio = mean * mean / var
        r = got[t]
        assert r["threshold"] == u / 100.0
        assert r["n_exceed"] == m
        assert abs(r["gpd_xi"] - (1 - ratio) / 2) < 1e-8
        assert abs(r["gpd_sigma"] - mean * (ratio + 1) / 2 / 100.0) < 1e-8


def test_grid_percolation_consistency(spark):
    r = entry.queries()["grid_percolation"](spark, SF_DIR).collect()[0]
    assert 1 <= r["giant_size"] <= r["n_occupied"]
    assert r["n_components"] >= 1
    assert abs(r["giant_frac"] - r["giant_size"] / r["n_occupied"]) < 1e-9
    # components partition the occupied set
    assert r["n_components"] <= r["n_occupied"]


def test_grid_percolation_matches_kernel_replay(spark):
    import numpy as np

    from gos2_spark.kernels import hilbert as H
    from gos2_spark.kernels import projection as PJ

    pts = duckdb.sql(
        f"""SELECT c_custkey,
                   -60.0 + (c_custkey * 7 % 120) + (c_custkey % 97) / 97.0,
                   -170.0 + (c_custkey * 13 % 340) + (c_custkey % 89) / 89.0
            FROM read_parquet('{SF_DIR}/customer.parquet')"""
    ).fetchall()
    ids = PJ.cellid_from_latlng(
        np.array([p[1] for p in pts]), np.array([p[2] for p in pts])
    )
    lsb = np.uint64(1 << 48)
    parents = (ids & ~(lsb - np.uint64(1))) | lsb
    occ = set(int(x) for x in parents)
    nbrs = PJ.edge_neighbors(np.array(sorted(occ), dtype=np.uint64)).reshape(
        len(occ), 4
    )
    adj = defaultdict(set)
    occ_sorted = sorted(occ)
    for cell, row in zip(occ_sorted, nbrs):
        for nb in row:
            if int(nb) in occ:
                adj[cell].add(int(nb))
                adj[int(nb)].add(cell)
    seen = set()
    sizes = []
    for start in occ_sorted:
        if start in seen:
            continue
        stack = [start]
        comp = 0
        while stack:
            u = stack.pop()
            if u in seen:
                continue
            seen.add(u)
            comp += 1
            stack.extend(adj[u] - seen)
        sizes.append(comp)
    r = entry.queries()["grid_percolation"](spark, SF_DIR).collect()[0]
    assert r["n_occupied"] == len(occ)
    assert r["n_components"] == len(sizes)
    assert r["giant_size"] == max(sizes)
