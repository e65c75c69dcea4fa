"""pipeline/graph.py (PageRank), pipeline/classify.py (hashed linear
scorer), pipeline/contamination.py (n-gram decontamination): each checked
against an independent pure-Python/numpy reference model.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from xxh64_model import xxh64_signed  # noqa: E402


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def _ref_pagerank(edges, iterations=3, damping=0.85):
    """Dense numpy power iteration with uniform dangling redistribution."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in set(edges):
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in set(edges):
            contrib[idx[d]] += r[idx[s]] / out_deg[idx[s]]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def _run_pagerank(spark, edges, **kw):
    from gos2_spark.pipeline.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_reference(spark):
    rng = np.random.default_rng(7)
    edges = [
        (int(rng.integers(0, 20)), int(rng.integers(0, 20))) for _ in range(80)
    ]
    got = _run_pagerank(spark, edges, iterations=3, damping=0.85)
    want = _ref_pagerank(edges, 3, 0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_mass_redistributed(spark):
    # node 2 has no out-edges: its rank must be redistributed uniformly,
    # and total mass must stay exactly 1
    edges = [(0, 1), (1, 2), (0, 2)]
    got = _run_pagerank(spark, edges, iterations=4, damping=0.85)
    want = _ref_pagerank(edges, 4, 0.85)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got[2] > got[1] > got[0]


def test_pagerank_duplicate_edges_collapse(spark):
    got = _run_pagerank(
        spark, [(0, 1), (0, 1), (0, 1), (1, 0)], iterations=2
    )
    want = _ref_pagerank([(0, 1), (1, 0)], 2)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)


# ---------------------------------------------------------------------------
# Hashed linear classifier
# ---------------------------------------------------------------------------

def _ref_score(text: str, n_features: int) -> float:
    toks = text.strip().split()
    if not toks:
        return 0.0
    acc = 0.0
    for t in toks:
        b = xxh64_signed(t) % n_features
        acc += ((b * 2654435761) % 1000) / 999.0 - 0.5
    return acc / len(toks)


def test_hashed_linear_score_matches_model(spark):
    from gos2_spark.pipeline.classify import hashed_linear_score

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "single",
        "",
        "   ",
        "numbers 123 and symbols #! mixed in a short doc",
        "repeated repeated repeated repeated",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {
        r["key"]: r for r in hashed_linear_score(df, n_features=4096).collect()
    }
    for i, t in enumerate(texts):
        want = _ref_score(t, 4096)
        assert rows[i]["score"] == pytest.approx(want, abs=1e-12), t
        assert rows[i]["keep"] == (want > 0)


def test_hashed_linear_score_no_python_stage(spark):
    from gos2_spark.pipeline.classify import hashed_linear_score

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        hashed_linear_score(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


# ---------------------------------------------------------------------------
# N-gram contamination
# ---------------------------------------------------------------------------

def _ref_contamination(corpus, bench, n):
    def grams(t):
        tk = t.strip().split()
        return {
            " ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)
        } if len(tk) >= n else set()

    bg = set().union(*(grams(t) for _, t in bench)) if bench else set()
    out = {}
    for k, t in corpus:
        g = grams(t)
        out[k] = (len(g), len(g & bg))
    return out


@pytest.mark.parametrize("broadcast", [True, False])
def test_ngram_contamination_matches_model(spark, broadcast):
    from gos2_spark.pipeline.contamination import ngram_contamination

    corpus = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "beta gamma delta epsilon zeta eta theta"),
        (2, "completely different words here nothing shared"),
        (3, "too short"),
        (4, ""),
        (5, "alpha beta gamma delta epsilon zeta"),  # exact dup of 0
    ]
    bench = [(100, "x alpha beta gamma delta epsilon y")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {
        r["key"]: (r["n_ngrams"], r["n_contaminated"], r["contaminated"])
        for r in ngram_contamination(
            cdf, bdf, n=5, broadcast_benchmark=broadcast
        ).collect()
    }
    want = _ref_contamination(corpus, bench, 5)
    assert set(got) == set(want)
    for k, (n_g, n_hit) in want.items():
        assert got[k] == (n_g, n_hit, n_hit > 0), k


def test_ngram_contamination_benchmark_broadcast_plan(spark):
    from gos2_spark.pipeline.contamination import ngram_contamination

    cdf = spark.createDataFrame(
        [(0, "a b c d e f")], "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    plan = (
        ngram_contamination(cdf, bdf, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Connected components
# ---------------------------------------------------------------------------

def _ref_components(nodes, edges):
    parent = {v: v for v in nodes}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node in component
    comp = {}
    for v in nodes:
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in comp.items() for v in vs}


def test_connected_components_matches_union_find(spark):
    from gos2_spark.pipeline.graph import connected_components

    rng = np.random.default_rng(11)
    nodes = list(range(40))
    edges = [
        (int(rng.integers(0, 40)), int(rng.integers(0, 40))) for _ in range(25)
    ]
    ndf = spark.createDataFrame([(v,) for v in nodes], "key long")
    edf = spark.createDataFrame(edges, "key_a long, key_b long")
    got = {
        r["key"]: r["component"]
        for r in connected_components(ndf, edf).collect()
    }
    assert got == _ref_components(nodes, edges)


def test_connected_components_isolated_nodes(spark):
    from gos2_spark.pipeline.graph import connected_components

    ndf = spark.createDataFrame([(1,), (2,), (3,)], "key long")
    edf = spark.createDataFrame([], "key_a long, key_b long")
    got = {
        r["key"]: r["component"]
        for r in connected_components(ndf, edf).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3}


def test_connected_components_long_chain_converges(spark):
    """Regression: plain min-label propagation moves the min ONE hop per
    round, so a diameter-200 path would need 200 shuffles; the pointer-
    doubling step must collapse it within the default round budget."""
    from gos2_spark.pipeline.graph import connected_components

    n = 200
    ndf = spark.createDataFrame([(v,) for v in range(n)], "key long")
    # path n-1 - n-2 - ... - 1 - 0, plus an isolated pair
    edges = [(i, i + 1) for i in range(n - 1)]
    edf = spark.createDataFrame(edges, "key_a long, key_b long")
    got = {
        r["key"]: r["component"]
        for r in connected_components(ndf, edf).collect()
    }
    assert got == {v: 0 for v in range(n)}


def test_connected_components_wide_flat_graph_converges(spark):
    """Regression for the sf0.1 eps-graph under-merge: a large-diameter
    lattice-ordered graph exhausted the old schedule's round budget and
    silently returned split components (29 instead of 23 at sf0.1). The
    hash-to-min fragment broadcast must converge well inside the budget
    and produce exact component minima.

    Graph: 40 parallel chains of 75 nodes with lattice-correlated keys
    (key = col * 40 + row, edges along rows), cross-linked at one end —
    one component of diameter ~115, worst case for per-hop propagation.
    """
    from gos2_spark.pipeline.graph import connected_components

    chains, length = 40, 75
    edges = []
    for c in range(chains):
        edges += [
            (r * chains + c, (r + 1) * chains + c) for r in range(length - 1)
        ]
    # cross-link chain tails so everything is one component
    last = (length - 1) * chains
    edges += [(last + c, last + c + 1) for c in range(chains - 1)]
    nodes = sorted({v for e in edges for v in e})
    ndf = spark.createDataFrame([(v,) for v in nodes], "key long")
    edf = spark.createDataFrame(edges, "key_a long, key_b long")
    got = {
        r["key"]: r["component"]
        for r in connected_components(ndf, edf).collect()
    }
    assert got == {v: 0 for v in nodes}


# ---------------------------------------------------------------------------
# Duplicate-span coverage
# ---------------------------------------------------------------------------

def _ref_dup_coverage(corpus, k):
    from collections import Counter

    occ = []  # (doc, pos 1-based, gram)
    for key, t in corpus:
        tk = t.strip().split() if t.strip() else []
        for i in range(max(0, len(tk) - k + 1)):
            occ.append((key, i + 1, " ".join(tk[i : i + k])))
    counts = Counter(g for _, _, g in occ)
    out = {}
    for key, t in corpus:
        tk = t.strip().split() if t.strip() else []
        n_spans = max(0, len(tk) - k + 1) if len(tk) >= k else 0
        covered = set()
        n_dup = 0
        for d, p, g in occ:
            if d == key and counts[g] > 1:
                n_dup += 1
                covered.update(range(p, p + k))
        out[key] = (len(tk), n_spans, n_dup, len(covered))
    return out


def test_dup_span_coverage_matches_model(spark):
    from gos2_spark.pipeline.spans import duplicated_span_coverage

    shared = "one two three four"
    corpus = [
        (0, f"{shared} alpha beta"),            # shares the 4-gram with 1
        (1, f"x {shared} y"),
        (2, "totally unique words in this document only"),
        (3, "rep rep rep rep rep rep rep"),      # within-doc repeats
        (4, "short"),
        (5, ""),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["key"]: (
            r["n_tokens"], r["n_spans"], r["n_dup_spans"], r["dup_tokens"]
        )
        for r in duplicated_span_coverage(df, k=4).collect()
    }
    assert got == _ref_dup_coverage(corpus, 4)


def test_dup_span_interval_union_overlaps(spark):
    """Overlapping duplicated spans must be union-counted, not summed:
    two copies of a 6-token run with k=4 give 3 dup spans but only 6
    covered tokens per doc."""
    from gos2_spark.pipeline.spans import duplicated_span_coverage

    run = "a b c d e f"
    df = spark.createDataFrame(
        [(0, run), (1, run)], "doc_id long, text string"
    )
    got = {
        r["key"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in duplicated_span_coverage(df, k=4).collect()
    }
    assert got == {0: (3, 6), 1: (3, 6)}


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------

def test_tfidf_top_terms_matches_model(spark):
    import math

    from gos2_spark.pipeline.text import tfidf_top_terms

    corpus = [
        (0, "apple banana apple cherry"),
        (1, "banana cherry cherry date"),
        (2, "apple apple apple eel"),
        (3, ""),
    ]
    n = len(corpus)
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [
        (r["key"], r["rk"], r["term"], r["tf"], r["df"], r["tfidf"])
        for r in tfidf_top_terms(df, top_k=2).orderBy("key", "rk").collect()
    ]
    # reference: tf / df / rational-rank replay
    tfs = {}
    for k, t in corpus:
        for w in t.lower().split():
            tfs[(k, w)] = tfs.get((k, w), 0) + 1
    dfs = {}
    for (k, w), _ in tfs.items():
        dfs[w] = dfs.get(w, 0) + 1
    want = []
    for k, _ in corpus:
        rows = [
            (w, c, dfs[w], c * (n + 1) / (dfs[w] + 1))
            for (kk, w), c in tfs.items()
            if kk == k
        ]
        rows.sort(key=lambda r: (-r[3], r[0]))
        for rk, (w, c, d, _) in enumerate(rows[:2], 1):
            want.append(
                (k, rk, w, c, d, round(c * (math.log((n + 1) / (d + 1)) + 1), 6))
            )
    assert got == want


def _brute_triangles(edges):
    """Reference: per-node triangle counts by direct enumeration."""
    import itertools

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    nbrs = {n: set() for n in nodes}
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    t = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in und and (b, c) in und and (a, c) in und:
            t[a] += 1
            t[b] += 1
            t[c] += 1
    return {n: (len(nbrs[n]), t[n]) for n in nodes}


def test_triangle_count_k4_complete(spark):
    """K4: every node sits in C(3,2)=3 triangles, coefficient exactly 1."""
    from gos2_spark.pipeline.graph import triangle_count

    import itertools

    edges = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(range(4), 2)],
        "src long, dst long",
    )
    rows = {r["node"]: r for r in triangle_count(edges).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        assert r["degree"] == 3
        assert r["n_triangles"] == 3
        assert r["clustering_coeff"] == 1.0


def test_triangle_count_star_has_none(spark):
    """A star (hub + leaves) has zero triangles; the degree-ordered
    orientation must also produce zero WEDGES from the hub's fan-in."""
    from gos2_spark.pipeline.graph import triangle_count

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "src long, dst long"
    )
    rows = {r["node"]: r for r in triangle_count(edges).collect()}
    assert all(r["n_triangles"] == 0 for r in rows.values())
    assert rows[0]["degree"] == 8 and rows[0]["clustering_coeff"] == 0.0
    assert all(rows[i]["clustering_coeff"] == 0.0 for i in range(1, 9))


def test_triangle_count_random_matches_brute_force(spark):
    """Random multigraph with duplicate/reversed/self-loop edges: the
    engine must collapse to the simple undirected graph and match the
    O(n^3) enumeration exactly."""
    import numpy as np

    from gos2_spark.pipeline.graph import triangle_count

    rng = np.random.default_rng(11)
    raw = [(int(a), int(b)) for a, b in rng.integers(0, 30, (400, 2))]
    want = _brute_triangles(raw)
    edges = spark.createDataFrame(raw, "src long, dst long")
    got = {r["node"]: r for r in triangle_count(edges).collect()}
    assert set(got) == set(want)
    for n, (deg, tri) in want.items():
        assert got[n]["degree"] == deg, n
        assert got[n]["n_triangles"] == tri, n
        if deg >= 2:
            assert got[n]["clustering_coeff"] == pytest.approx(
                2.0 * tri / (deg * (deg - 1)), abs=1e-12
            )


def test_bfs_hops_matches_reference_bfs(spark):
    """Directed graph with a cycle, a diamond, an unreachable node, and
    two sources: engine hops == collections.deque BFS."""
    from collections import deque

    from gos2_spark.pipeline.graph import bfs_hops

    edges = [
        (0, 1), (1, 2), (2, 0),          # cycle back to a source
        (1, 3), (2, 3), (3, 4),          # diamond into a tail
        (5, 6), (6, 7),                  # second source's chain
        (4, 5),                          # bridge: 5 reachable both ways
        (8, 9),                          # 8, 9 unreachable from sources
        (0, 1), (0, 1),                  # parallel edges collapse
    ]
    sources = [0, 5]
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    ref = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in ref:
                ref[v] = ref[u] + 1
                q.append(v)

    e_df = spark.createDataFrame(edges, "src long, dst long")
    s_df = spark.createDataFrame([(s,) for s in sources], "node long")
    got = {
        r["node"]: r["hops"] for r in bfs_hops(e_df, s_df).collect()
    }
    assert got == ref
    assert 8 not in got and 9 not in got


def test_bfs_hops_max_hops_cap(spark):
    from gos2_spark.pipeline.graph import bfs_hops

    chain = [(i, i + 1) for i in range(10)]
    e_df = spark.createDataFrame(chain, "src long, dst long")
    s_df = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(e_df, s_df, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_sssp_relax_matches_dijkstra(spark):
    """Weighted digraph with a cheap long path beating an expensive short
    one, a cycle, and an unreachable node: engine == heapq Dijkstra."""
    import heapq

    from gos2_spark.pipeline.graph import sssp_relax

    edges = [
        (0, 1, 10), (0, 2, 1), (2, 3, 1), (3, 1, 1),   # 0->1 via 2,3 costs 3
        (1, 4, 2), (4, 0, 5),                           # cycle back
        (5, 6, 7),                                      # unreachable island
        (0, 2, 4),                                      # parallel edge, worse
    ]
    adj: dict[int, list[tuple[int, int]]] = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    ref = {0: 0}
    pq = [(0, 0)]
    while pq:
        c, u = heapq.heappop(pq)
        if c > ref.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, []):
            if c + w < ref.get(v, 1 << 60):
                ref[v] = c + w
                heapq.heappush(pq, (c + w, v))

    e_df = spark.createDataFrame(edges, "src long, dst long, w long")
    s_df = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["cost"] for r in sssp_relax(e_df, s_df, rounds=6).collect()}
    assert got == ref


def test_sssp_relax_round_cap_partial(spark):
    from gos2_spark.pipeline.graph import sssp_relax

    chain = [(i, i + 1, 1) for i in range(10)]
    e_df = spark.createDataFrame(chain, "src long, dst long, w long")
    s_df = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["cost"]
        for r in sssp_relax(e_df, s_df, rounds=4).collect()
    }
    assert got == {i: i for i in range(5)}


def test_label_propagation_recovers_planted_blocks(spark):
    """Two cliques joined by one bridge edge: LPA converges to exactly
    two communities, each labeled by its minimum member id."""
    from gos2_spark.pipeline.graph import label_propagation

    clique_a = [(i, j) for i in range(5) for j in range(5) if i < j]
    clique_b = [(10 + i, 10 + j) for i in range(5) for j in range(5) if i < j]
    edges = clique_a + clique_b + [(4, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"] for r in label_propagation(e, rounds=4).collect()}
    assert set(got) == set(range(5)) | set(range(10, 15))
    assert len({got[i] for i in range(5)}) == 1
    assert len({got[10 + i] for i in range(5)}) == 1
    assert {got[0]} != {got[10]}
    sizes = {
        r["node"]: r["community_size"]
        for r in label_propagation(e, rounds=4).collect()
    }
    assert all(v == 5 for v in sizes.values())


def test_label_propagation_deterministic_tiebreak(spark):
    """A node with two equal-vote neighbor labels adopts the smaller."""
    from gos2_spark.pipeline.graph import label_propagation

    # node 2 sees labels {1, 3} with one vote each in round 1
    e = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(e, rounds=1).collect()
    }
    assert got[2] == 1


def test_kcore_peels_fringe_cascade(spark):
    """A 4-clique with a pendant chain: the chain peels away over
    multiple rounds (cascade), the clique survives as the 3-core."""
    from gos2_spark.pipeline.graph import kcore

    clique = [(i, j) for i in range(4) for j in range(4) if i < j]
    chain = [(3, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(clique + chain, "src long, dst long")
    got = {r["node"]: r["core_deg"] for r in kcore(e, k=3, rounds=5).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert all(v == 3 for v in got.values())


def test_kcore_empty_when_no_core(spark):
    from gos2_spark.pipeline.graph import kcore

    chain = [(i, i + 1) for i in range(6)]
    e = spark.createDataFrame(chain, "src long, dst long")
    assert kcore(e, k=3, rounds=4).count() == 0
