"""sf0.1 fixpoint stress tests for the iterative graph algorithms.

The round-3 connected-components under-merge (29 components instead of 23)
was INVISIBLE at sf0.01 — the driver's correctness gate runs there, so any
iterative algorithm whose round budget or merge schedule only cracks at a
bigger graph needs its own truth check at sf0.1. Truths here are
independent reimplementations (union-find; peel-to-convergence; a pure
python replay of the deterministic LPA rounds), not the DuckDB oracles,
which replay the same fixed round count and therefore cannot catch an
insufficient budget.
"""

import os

import pytest

SF_DIR = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.1 testdata not present"
)


def _union_find_components(node_keys, edge_pairs):
    parent = {k: k for k in node_keys}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {k: find(k) for k in parent}


def test_connected_components_sf01_matches_union_find(spark):
    """The sf0.1 eps-graph that exposed the round-3 under-merge: the
    distributed labels must equal union-find truth node-for-node."""
    import __spark_entry__ as e
    from gos2_spark.pipeline.graph import (
        _default_materialize,
        connected_components,
    )
    from gos2_spark.spark.joins import distance_join

    pts = e._cust_points(spark, SF_DIR)
    mat = _default_materialize(spark)
    pairs = mat(
        distance_join(pts, 3.0, point_key="key").select("key_a", "key_b")
    )
    nodes = pts.select("key")
    got = {
        r["key"]: r["component"]
        for r in connected_components(nodes, pairs).collect()
    }
    truth = _union_find_components(
        [r["key"] for r in nodes.collect()],
        [(r["key_a"], r["key_b"]) for r in pairs.collect()],
    )
    assert got == truth


def test_kcore_sf01_rounds_reach_the_true_fixpoint(spark):
    """kcore runs a FIXED round budget (statically unrollable for the
    chained-CTE oracle), so the oracle cannot catch a budget that is too
    small for the graph's peel depth. Compare against peel-to-convergence
    truth on the sf0.1 graph the registered query uses."""
    import __spark_entry__ as e
    from gos2_spark.pipeline.graph import kcore

    k = 3
    edges_df = e._kcore_edges(e._load(spark, SF_DIR, "orders"))
    got = {r["node"]: r["core_deg"] for r in kcore(edges_df, k=k, rounds=6).collect()}

    # truth: peel until stable
    raw = {
        (r[0], r[1])
        for r in edges_df.collect()
        if r[0] != r[1]
    }
    adj: dict = {}
    for a, b in raw:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    while True:
        drop = {n for n in active if len(adj[n] & active) < k}
        if not drop:
            break
        active -= drop
    truth = {n: len(adj[n] & active) for n in active}
    assert got == truth


def test_label_propagation_sf01_matches_pure_python_replay(spark):
    """Deterministic synchronous LPA: mode-of-neighbors with min-label
    tie-break is a pure function of the previous labeling, so a pure
    python replay at sf0.1 must agree row-for-row (catches any
    distributed vote aggregation divergence the sf0.01 oracle misses)."""
    import __spark_entry__ as e
    from gos2_spark.pipeline.graph import label_propagation

    rounds = 3
    edges_df = e._lpa_edges(e._load(spark, SF_DIR, "customer"))
    got = {
        r["node"]: (r["label"], r["community_size"])
        for r in label_propagation(edges_df, rounds=rounds).collect()
    }

    raw = {(r[0], r[1]) for r in edges_df.collect() if r[0] != r[1]}
    sym = raw | {(b, a) for a, b in raw}
    adj: dict = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            counts: dict = {}
            for m in adj[n]:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            # mode, ties to smallest label
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            new[n] = best
        labels = new
    sizes: dict = {}
    for lab in labels.values():
        sizes[lab] = sizes.get(lab, 0) + 1
    truth = {n: (lab, sizes[lab]) for n, lab in labels.items()}
    assert got == truth


def test_ktruss_sf01_fixed_rounds_reach_peel_convergence(spark):
    """ktruss_edges runs _KTRUSS_ROUNDS fixed peel rounds (statically
    unrollable for the chained-CTE oracle). The oracle replays the SAME
    round budget, so only a peel-to-convergence truth can certify the
    budget suffices on the sf0.1 graph."""
    import __spark_entry__ as e

    got = {
        (r["a"], r["b"]): r["support"]
        for r in e.queries()["ktruss_edges"](spark, SF_DIR).collect()
    }

    doc_ids = [
        r["doc_id"]
        for r in e._load(spark, SF_DIR, "documents").select("doc_id").collect()
    ]
    edges = set()
    for d in doc_ids:
        for dst in ((d * 5 + 2) % 24, (d * 7 + 3) % 24, (d * 11 + 5) % 24):
            a, b = d % 24, dst
            if a != b:
                edges.add((min(a, b), max(a, b)))

    k = e._KTRUSS_K
    while True:
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        support = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
        drop = {ab for ab, s in support.items() if s < k - 2}
        if not drop:
            break
        edges -= drop
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    truth = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
    assert got == truth


def test_hex_flow_accumulation_sf01_step_cap_reaches_fixpoint(spark):
    """hex_flow_accumulation walks max_steps=16 token rounds; the oracle
    replays the SAME cap. Truth: route every cell down its
    steepest-descent path to a sink with NO step bound (paths strictly
    descend, so the walk is finite) and count visits — certifying 16
    steps cover the sf0.1 drainage depth, and the engine's flow_dir
    picks argmin (neighbor elev, direction index)."""
    import __spark_entry__ as e
    from gos2_spark.spark.hexgrid import _HEX_DIRS

    rows = e.queries()["hex_flow_accumulation"](spark, SF_DIR).collect()
    cells = {(r["hq"], r["hr"]) for r in rows}
    elev = {
        (q, r): ((q * 1103515245 + r * 12345) % 10007 + 10007) % 10007
        for q, r in cells
    }
    for r in rows:  # engine elevation must be the same hash field
        assert r["elev"] == elev[(r["hq"], r["hr"])]

    nxt = {}
    best_dir = {}
    for c in cells:
        lower = [
            (elev[n], d, n)
            for d, (dq, dr) in enumerate(_HEX_DIRS)
            if (n := (c[0] + dq, c[1] + dr)) in cells and elev[n] < elev[c]
        ]
        if lower:
            ne, d, n = min(lower)
            nxt[c] = n
            best_dir[c] = d

    acc = {c: 0 for c in cells}
    for c in cells:
        cur = c
        acc[cur] += 1
        while cur in nxt:
            cur = nxt[cur]
            acc[cur] += 1

    for r in rows:
        c = (r["hq"], r["hr"])
        assert r["flow_dir"] == best_dir.get(c, -1)
        assert r["is_sink"] == (c not in nxt)
        assert r["flow_acc"] == acc[c]


def test_closeness_seeds_sf01_hop_cap_covers_true_bfs(spark):
    """closeness_from_seeds runs level-synchronous BFS capped at
    max_hops=8; the oracle replays the same cap. Truth: unbounded deque
    BFS per seed over the directed sf0.1 20-host graph — certifying the
    cap exceeds the true eccentricity of every seed."""
    import math
    from collections import deque

    import __spark_entry__ as e

    got = {
        r["node"]: (
            r["n_seeds_reached"],
            r["total_hops"],
            r["harmonic_e9"],
            r["closeness"],
        )
        for r in e.queries()["closeness_seeds"](spark, SF_DIR).collect()
    }

    doc_ids = [
        r["doc_id"]
        for r in e._load(spark, SF_DIR, "documents").select("doc_id").collect()
    ]
    out_adj: dict = {}
    for d in doc_ids:
        for dst in ((d * 7 + 1) % 20, (d * 11 + 3) % 20):
            out_adj.setdefault(d % 20, set()).add(dst)

    per_node: dict = {}
    for seed in e._CLOSENESS_SEEDS:
        dist = {seed: 0}
        q = deque([seed])
        while q:
            u = q.popleft()
            for v in out_adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for node, h in dist.items():
            per_node.setdefault(node, []).append(h)

    truth = {}
    for node, hops in per_node.items():
        n_seeds = len(hops)
        total = sum(hops)
        harm = sum(
            int(math.floor(1e9 / h + 0.5)) for h in hops if h > 0
        )
        clo = round(n_seeds / total, 9) if total > 0 else 0.0
        truth[node] = (n_seeds, total, harm, clo)
    assert got == truth
