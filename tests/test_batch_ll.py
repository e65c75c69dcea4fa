"""Graph-structure metrics over the trajectory transition graph —
degree assortativity, local clustering, reciprocity — checked against
independent brute-force Python references built straight from the
events parquet (duckdb read, python dict graph)."""

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _graph():
    rows = duckdb.sql(
        f"""SELECT user_id, epoch_us(ts) AS us, event_id
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, us, event_id"""
    ).fetchall()
    per = defaultdict(list)
    for uid, us, eid in rows:
        lat = -60.0 + (eid * 11 % 120) + (eid % 83) / 83.0
        lng = -170.0 + (eid * 17 % 340) + (eid % 79) / 79.0
        node = int((math.floor(lat / 10.0) + 6) * 34 + math.floor(lng / 10.0) + 17)
        per[uid].append(node)
    directed = set()
    for seq in per.values():
        for a, b in zip(seq, seq[1:]):
            if a != b:
                directed.add((a, b))
    und = {(min(a, b), max(a, b)) for a, b in directed}
    return directed, und


def test_degree_assortativity_matches_brute(spark):
    _, und = _graph()
    deg = Counter()
    for u, v in und:
        deg[u] += 1
        deg[v] += 1
    stubs = [(deg[u], deg[v]) for u, v in und] + [(deg[v], deg[u]) for u, v in und]
    n = len(stubs)
    sx = sum(x for x, _ in stubs)
    sxy = sum(x * y for x, y in stubs)
    sxx = sum(x * x for x, _ in stubs)
    den = n * sxx - sx * sx
    want = (n * sxy - sx * sx) / den if den else 0.0
    row = entry.queries()["degree_assortativity"](spark, SF_DIR).collect()[0]
    assert row["n_edges"] == len(und)
    assert abs(row["assortativity"] - want) < 1e-8


def test_local_clustering_matches_brute(spark):
    _, und = _graph()
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    got = {r["node"]: r for r in entry.queries()["local_clustering"](spark, SF_DIR).collect()}
    assert set(got) == set(adj)
    for node, nbrs in adj.items():
        d = len(nbrs)
        tri = sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and (min(x, y), max(x, y)) in und
        )
        r = got[node]
        assert r["deg"] == d
        assert r["n_tri"] == tri
        want = 2.0 * tri / (d * (d - 1)) if d >= 2 else 0.0
        assert abs(r["lcc"] - want) < 1e-8
        assert -1e-9 <= r["lcc"] <= 1 + 1e-9


def test_reciprocity_matches_brute(spark):
    directed, _ = _graph()
    out = defaultdict(int)
    rec = defaultdict(int)
    for a, b in directed:
        out[a] += 1
        if (b, a) in directed:
            rec[a] += 1
    got = {r["node"]: r for r in entry.queries()["reciprocity_links"](spark, SF_DIR).collect()}
    assert set(got) == set(out)
    for node in out:
        r = got[node]
        assert r["out_deg"] == out[node]
        assert r["n_reciprocal"] == rec[node]
        assert abs(r["reciprocity"] - rec[node] / out[node]) < 1e-9


def test_reciprocity_nondegenerate_at_sf001():
    # At sf0.001 the 1000-event graph is too sparse for reverse links;
    # assert the construction yields a non-trivial mix (0 < r < 1) at
    # sf0.01, where the driver's correctness gate runs — duckdb-only.
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/events.parquet')"
    )
    n, r = con.execute(
        f"WITH e AS ({entry._TRAJ_DIRECTED_SQL}) "
        "SELECT count(*), sum(CASE WHEN rv.src IS NOT NULL THEN 1 ELSE 0 END) "
        "FROM e LEFT JOIN e rv ON rv.src = e.dst AND rv.dst = e.src"
    ).fetchone()
    assert 0 < r < n
