"""Distributed convex hull (spark/hull.py) vs an O(n^3) all-sides
reference — the same inclusive edge test the DuckDB oracle runs."""

import numpy as np
import pytest

from gos2_spark.spark.hull import _hull_indices, convex_hull_vertices


def _reference_hull_ids(ids, xs, ys):
    """Inclusive hull via the O(n^3) CCW edge test (oracle semantics):
    id_a is a vertex iff some directed edge (a, b) has every other point
    on the left of or exactly ON the line."""
    n = len(ids)
    out = set()
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            ok = True
            for k in range(n):
                if k in (i, j):
                    continue
                cross = (xs[j] - xs[i]) * (ys[k] - ys[i]) - (
                    ys[j] - ys[i]
                ) * (xs[k] - xs[i])
                if cross < 0.0:
                    ok = False
                    break
            if ok:
                out.add(ids[i])
                break
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_chain_matches_reference(seed):
    rng = np.random.default_rng(seed)
    n = 40
    xs = rng.uniform(-10, 10, n)
    ys = rng.uniform(-10, 10, n)
    ids = np.arange(n)
    got = set(ids[_hull_indices(xs, ys)])
    want = _reference_hull_ids(ids, xs, ys)
    assert got == want


def test_chain_keeps_collinear_boundary():
    # square with a point on the middle of the bottom edge + interior
    xs = np.array([0.0, 2.0, 2.0, 0.0, 1.0, 1.0])
    ys = np.array([0.0, 0.0, 2.0, 2.0, 0.0, 1.0])
    ids = np.arange(6)
    got = set(ids[_hull_indices(xs, ys)])
    assert got == {0, 1, 2, 3, 4}  # collinear (1,0) kept, interior dropped
    assert got == _reference_hull_ids(ids, xs, ys)


def test_two_level_equals_single_level(spark):
    rng = np.random.default_rng(7)
    rows = []
    for key in range(3):
        n = 120
        xs = rng.uniform(-100, 100, n)
        ys = rng.uniform(-50, 50, n)
        rows += [
            (key, key * 1000 + i, float(xs[i]), float(ys[i]))
            for i in range(n)
        ]
    df = spark.createDataFrame(rows, "k long, id long, x double, y double")
    out = convex_hull_vertices(df, "k", "id", "x", "y", n_salt=8)
    got = {(r.k, r.id) for r in out.collect()}
    want = set()
    by_key = {}
    for k, i, x, y in rows:
        by_key.setdefault(k, []).append((i, x, y))
    for k, pts in by_key.items():
        ids = np.array([p[0] for p in pts])
        xs = np.array([p[1] for p in pts])
        ys = np.array([p[2] for p in pts])
        want |= {(k, int(i)) for i in ids[_hull_indices(xs, ys)]}
    assert got == want


def test_tiny_groups(spark):
    df = spark.createDataFrame(
        [(1, 1, 0.0, 0.0), (1, 2, 1.0, 1.0), (2, 3, 5.0, 5.0)],
        "k long, id long, x double, y double",
    )
    out = convex_hull_vertices(df, "k", "id", "x", "y", n_salt=4)
    got = {(r.k, r.id) for r in out.collect()}
    assert got == {(1, 1), (1, 2), (2, 3)}  # <=2 points are all boundary
