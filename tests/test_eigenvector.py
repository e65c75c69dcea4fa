"""Eigenvector centrality (pipeline/graph.py) vs a numpy power-iteration
reference and structural fixtures."""

import numpy as np

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _reference(edges, n_iter=4):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    a = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for s, d in set(edges):
        a[idx[s], idx[d]] = 1
    x = np.ones(len(nodes), dtype=np.int64)
    for _ in range(n_iter):
        x = a.T @ x
    n2 = int((x.astype(object) ** 2).sum())
    return {
        u: (int(x[i]), float(x[i]) / np.sqrt(float(n2)) if n2 > 0 else None)
        for u, i in idx.items()
    }


def test_matches_numpy_power_iteration(spark):
    from gos2_spark.pipeline.graph import eigenvector_centrality

    rng = np.random.default_rng(13)
    edges = [
        (int(rng.integers(0, 30)), int(rng.integers(0, 30))) for _ in range(120)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r for r in eigenvector_centrality(df, iterations=4).collect()}
    ref = _reference(edges)
    assert set(got) == set(ref)
    for u, (w, s) in ref.items():
        assert got[u]["walks"] == w
        if s is not None:
            assert abs(got[u]["score"] - s) < 1e-9


def test_star_graph_center_dominates(spark):
    from gos2_spark.pipeline.graph import eigenvector_centrality

    # bidirectional star: center accumulates the most walks
    edges = [(0, i) for i in range(1, 8)] + [(i, 0) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r for r in eigenvector_centrality(df, iterations=4).collect()}
    assert got[0]["walks"] == max(r["walks"] for r in got.values())
    assert all(got[i]["walks"] == got[1]["walks"] for i in range(2, 8))


def test_unit_norm(spark):
    rows = entry.queries()["eigenvector_centrality"](spark, SF_DIR).collect()
    s2 = sum(r["score"] ** 2 for r in rows if r["score"] is not None)
    assert abs(s2 - 1.0) < 1e-6
