"""EdgeIndex / edge-covering parity: candidates ⊇ true crossings
(edgeindex_test.go:37-119 invariant, seeded numpy RNG)."""

import math

import numpy as np

from gos2_spark.cover.edgeindex import (
    EdgeIndex, edge_covering, edge_intersects_cell_boundary, lenient_crossing,
)
from gos2_spark.cover.cellunion import CellUnion
from gos2_spark.geometry import _vec as V
from gos2_spark.geometry.cell import Cell
from gos2_spark.geometry.polyline import Polyline
from gos2_spark.kernels import predicates as PR
from gos2_spark.kernels import projection as PJ


def _random_edge_near(rng, lat0, lng0, spread_deg, max_len_deg):
    a = V.from_degrees(
        lat0 + rng.uniform(-spread_deg, spread_deg),
        lng0 + rng.uniform(-spread_deg, spread_deg),
    )
    b = V.from_degrees(
        lat0 + rng.uniform(-spread_deg, spread_deg),
        lng0 + rng.uniform(-spread_deg, spread_deg),
    )
    return a, b


def test_edge_covering_contains_edge():
    rng = np.random.default_rng(4)
    for _ in range(50):
        a, b = _random_edge_near(rng, 40.0, -74.0, 2.0, 0.5)
        cover, level = edge_covering(a, b, thicken_edge=True)
        cu = CellUnion(cover)
        # both endpoints' leaf cells are inside the covering
        for p in (a, b):
            leaf = int(PJ.cellid_from_xyz(
                np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))[0])
            assert cu.contains_cellid(leaf), (level, len(cover))


def test_candidates_superset_of_true_crossings():
    # edgeindex_test.go:100-119 invariant at small N
    rng = np.random.default_rng(4)
    edges = [_random_edge_near(rng, 10.0, 20.0, 1.0, 0.3) for _ in range(150)]
    idx = EdgeIndex(edges)
    idx.compute_index()
    for _ in range(40):
        qa, qb = _random_edge_near(rng, 10.0, 20.0, 1.0, 0.3)
        cands = set(idx.candidate_crossings(qa, qb))
        for i, (a, b) in enumerate(edges):
            if PR.robust_crossing(qa, qb, a, b) > 0:
                assert i in cands, f"true crossing {i} missing from candidates"


def test_cost_model_lazy_build():
    rng = np.random.default_rng(4)
    edges = [_random_edge_near(rng, 0.0, 0.0, 1.0, 0.2) for _ in range(150)]
    idx = EdgeIndex(edges)
    q = _random_edge_near(rng, 0.0, 0.0, 1.0, 0.2)
    # below the query threshold: brute force (all ids)
    for _ in range(30):
        got = idx.iter_candidates(*q)
        assert got == list(range(150))
    assert not idx.computed
    # crossing the threshold builds the index
    got = idx.iter_candidates(*q)
    assert idx.computed
    assert len(got) <= 150


def test_lenient_crossing_is_lenient():
    a, b = V.from_degrees(0, 0), V.from_degrees(0, 1)
    c, d = V.from_degrees(-0.5, 0.5), V.from_degrees(0.5, 0.5)
    assert lenient_crossing(a, b, c, d)
    e, f = V.from_degrees(5, 0), V.from_degrees(5, 1)
    assert not lenient_crossing(a, b, e, f)
    cell = Cell.from_latlng_deg(0.0, 0.5)
    import numpy as _np

    from gos2_spark.kernels import hilbert as H

    c8 = Cell(int(H.parent(_np.array([cell.id], dtype=_np.uint64), 8)[0]))
    assert edge_intersects_cell_boundary(
        V.from_degrees(0.0, -5.0), V.from_degrees(0.0, 5.0), c8
    )


def test_polyline_basics():
    pl = Polyline.from_latlngs_deg([(0, 0), (0, 1), (1, 1)])
    assert pl.num_vertices() == 3
    assert abs(pl.length() - 2 * math.radians(1)) < 1e-6
    mid = pl.interpolate(0.5)
    lat, lng = math.degrees(V.latitude(mid)), math.degrees(V.longitude(mid))
    assert abs(lat) < 0.01 and abs(lng - 1.0) < 0.01
    rb = pl.rect_bound()
    assert rb.contains_latlng_rad(math.radians(0.5), math.radians(1.0))
    assert len(pl.edges()) == 2
