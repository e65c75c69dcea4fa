"""Polygon boolean ops + PolygonBuilder parity (polygon_test.go:346-419,
polygonbuilder_test.go fixtures)."""

import pytest

from gos2_spark.geometry import Loop, Polygon
from gos2_spark.geometry import _vec as V
from gos2_spark.geometry import boolean_ops as B
from gos2_spark.geometry.builder import (
    DIRECTED_XOR, UNDIRECTED_UNION, UNDIRECTED_XOR, PolygonBuilder,
)


def makeloop(s: str) -> Loop:
    pts = []
    for tok in s.split(","):
        lat, lng = tok.strip().split(":")
        pts.append((float(lat), float(lng)))
    return Loop.from_latlngs_deg(pts)


def makepolygon(s: str) -> Polygon:
    loops = [makeloop(part) for part in s.split(";") if part.strip()]
    return Polygon(loops)


def check_equal(a: Polygon, b: Polygon, max_error: float):
    """CheckEqual (polygon_test.go:540-560): reassemble non-normalized
    polygons through a DIRECTED_XOR builder before comparing boundaries."""
    def normalized(p):
        return all(l.is_normalized() for l in p.loops)

    if normalized(a) and normalized(b):
        assert B.boundary_approx_equals(a, b, max_error), "boundaries differ"
    else:
        b1 = PolygonBuilder(DIRECTED_XOR())
        b1.add_polygon(a)
        a2, unused = b1.assemble_polygon()
        assert not unused
        b2 = PolygonBuilder(DIRECTED_XOR())
        b2.add_polygon(b)
        b2p, unused = b2.assemble_polygon()
        assert not unused
        assert B.boundary_approx_equals(a2, b2p, max_error), "boundaries differ"


# polygon_test.go:346-397 golden boolean-op cases
CASES = [
    (
        "4:2, 3:1, 3:3;",
        "3:1, 2:2, 3:3;",
        "",
        "4:2, 3:1, 2:2, 3:3;",
        "4:2, 3:1, 3:3;",
    ),
    (
        "0:0, 0:2, 3:2, 3:0;   0:3, 0:5, 3:5, 3:3;",
        "1:1, 1:4, 2:4, 2:1;",
        "1:1, 1:2, 2:2, 2:1;   1:3, 1:4, 2:4, 2:3;",
        "0:0, 0:2, 1:2, 1:3, 0:3, 0:5, 3:5, 3:3, 2:3, 2:2, 3:2, 3:0;",
        "0:0, 0:2, 1:2, 1:1, 2:1, 2:2, 3:2, 3:0; 0:3, 0:5, 3:5, 3:3, 2:3, 2:4, 1:4, 1:3;",
    ),
    (
        "1:88, 1:93, 2:93, 2:88;   -1:88, -1:93, 0:93, 0:88;",
        "-2:89, -2:90, 3:90, 3:89;   -2:91, -2:92, 3:92, 3:91;",
        "1:89, 1:90, 2:90, 2:89;   1:91, 1:92, 2:92, 2:91; -1:89, -1:90, 0:90, 0:89;   -1:91, -1:92, 0:92, 0:91;",
        "-1:88, -1:89, -2:89, -2:90, -1:90, -1:91, -2:91, -2:92, -1:92, -1:93, 0:93, 0:92, 1:92, 1:93, 2:93, 2:92, 3:92, 3:91, 2:91, 2:90, 3:90, 3:89, 2:89, 2:88, 1:88, 1:89, 0:89, 0:88; 0:90, 0:91, 1:91, 1:90;",
        "1:88, 1:89, 2:89, 2:88; 1:90, 1:91, 2:91, 2:90; 1:92, 1:93, 2:93, 2:92; -1:88, -1:89, 0:89, 0:88; -1:90, -1:91, 0:91, 0:90; -1:92, -1:93, 0:93, 0:92;",
    ),
    (
        "-1:-93, -1:-89, 3:-89, 3:-93;   0:-92, 0:-90, 2:-90, 2:-92;",
        "-3:-91, -3:-87, 1:-87, 1:-91;   -2:-90, -2:-88, 0:-88, 0:-90;",
        "-1:-91, -1:-90, 0:-90, 0:-91;   0:-90, 0:-89, 1:-89, 1:-90;",
        "-1:-93, -1:-91, -3:-91, -3:-87, 1:-87, 1:-89, 3:-89, 3:-93; 0:-92, 0:-91, 1:-91, 1:-90, 2:-90, 2:-92; -2:-90, -2:-88, 0:-88, 0:-89, -1:-89, -1:-90;",
        "-1:-93, -1:-91, 0:-91, 0:-92, 2:-92, 2:-90, 1:-90, 1:-89, 3:-89, 3:-93; -1:-90, -1:-89, 0:-89, 0:-90;",
    ),
]


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_boolean_operations(idx):
    a_s, b_s, and_s, or_s, minus_s = CASES[idx]
    a, b = makepolygon(a_s), makepolygon(b_s)
    max_err = 1e-4
    got_and = B.intersection(a, b)
    check_equal(got_and, makepolygon(and_s), max_err)
    got_or = B.union(a, b)
    check_equal(got_or, makepolygon(or_s), max_err)
    got_minus = B.difference(a, b)
    check_equal(got_minus, makepolygon(minus_s), max_err)


def test_hemisphere_intersection():
    # polygon_test.go:400-402: farH ∩ southH == farHSouthH (tolerance 1e-31)
    far_h = makepolygon("0:-90, 60:90, -60:90;")
    south_h = makepolygon("0:-180, 0:60, 0:-60;")
    far_south = B.intersection(far_h, south_h)
    check_equal(far_south, makepolygon("0:-180, 0:90, -60:90, 0:-90;"), 1e-31)


def test_builder_assembles_simple_loop():
    loop = makeloop("0:0, 0:10, 10:10, 10:0")
    b = PolygonBuilder(DIRECTED_XOR())
    b.add_loop(loop)
    loops, unused = b.assemble_loops()
    assert not unused
    assert len(loops) == 1
    assert loops[0].boundary_approx_equals(loop, 1e-12)


def test_builder_xor_cancels_duplicate_edges():
    loop = makeloop("0:0, 0:10, 10:10, 10:0")
    b = PolygonBuilder(DIRECTED_XOR())
    b.add_loop(loop)
    # adding the same loop again XORs: reversed edges vanish pairwise?
    # (same-direction edges do NOT cancel; opposite direction does)
    inv = Loop(list(reversed(loop.vertices)))
    b.add_loop(inv)  # hole orientation adds reversed edges -> cancels
    loops, unused = b.assemble_loops()
    assert loops == [] or all(len(l.vertices) == 0 for l in loops)


def test_builder_vertex_merge():
    # two squares sharing an almost-common vertex within merge radius
    import math

    b = PolygonBuilder(DIRECTED_XOR())
    b.options.vertex_merge_radius = math.radians(0.1)
    v = [
        V.from_degrees(0, 0), V.from_degrees(0, 1),
        V.from_degrees(1, 1), V.from_degrees(1.00001, 0.00001),
    ]
    for i in range(4):
        b.add_edge(v[i], v[(i + 1) % 4])
    # perturb: close the loop back to a slightly different corner
    loops, unused = b.assemble_loops()
    assert not unused
    assert len(loops) == 1


def test_destructive_union():
    squares = []
    for k in range(4):
        squares.append(makepolygon(f"0:{2*k}, 0:{2*k+3}, 3:{2*k+3}, 3:{2*k};"))
    out = B.destructive_union(squares)
    assert out.num_loops() == 1
    # the union must contain every input's center point
    for k in range(4):
        assert out.contains_point(V.from_degrees(1.5, 2 * k + 1.5))


def test_split_and_assemble_roundtrip():
    """SplitAndAssemble-style oracle (polygon_test.go:260-307, simplified):
    cover a polygon with cells, clip to each cell, re-union, compare."""
    from gos2_spark.cover import RegionCoverer
    from gos2_spark.geometry.cell import Cell

    poly = makepolygon("-1:0, 0:1, 1:0, 0:-1;")
    coverer = RegionCoverer(min_level=4, max_level=4, max_cells=1000)
    covering = coverer.covering(poly)
    pieces = []
    for cid in covering:
        cell_poly = Polygon.from_cell(Cell(cid))
        piece = B.intersection(poly, cell_poly, vertex_merge_radius=1.49e-8)
        if piece.num_loops():
            pieces.append(piece)
    assert pieces
    reassembled = B.destructive_union(pieces, vertex_merge_radius=1.49e-8)
    # round-trip boundary within the snap tolerance used for clipping
    assert B.boundary_near(reassembled, poly, max_error=1e-6)


# --- Polyline clipping (polygon_test.go:421-523) ---

K_CROSS1 = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1;"
K_CROSS1_SIDE_HOLE = "-1.5:0.5, -1.2:0.5, -1.2:-0.5, -1.5:-0.5;"


def _shared_edge_case(p: Polygon, start_vertex: int, direction: int):
    """polylineIntersectionSharedEdgeTest (polygon_test.go:479-523): a
    polyline running along a polygon edge is kept whole by the operation
    matching the edge's direction and dropped entirely by the other."""
    from gos2_spark.geometry.polyline import Polyline

    loop0 = p.loops[0]
    pts = [loop0.vertex(start_vertex), loop0.vertex(start_vertex + direction)]
    polyline = Polyline(pts)
    if direction < 0:
        assert B.intersect_with_polyline(p, polyline) == []
        out = B.subtract_from_polyline(p, polyline)
    else:
        out = B.intersect_with_polyline(p, polyline)
        assert B.subtract_from_polyline(p, polyline) == []
    assert len(out) == 1
    assert out[0].num_vertices() == 2
    assert tuple(out[0].vertex(0)) == tuple(pts[0])
    assert tuple(out[0].vertex(1)) == tuple(pts[1])


def test_polyline_intersection_shared_edges():
    cross1 = makepolygon(K_CROSS1)
    cross1_side_hole = makepolygon(K_CROSS1 + K_CROSS1_SIDE_HOLE)
    for v in range(3):
        _shared_edge_case(cross1, v, 1)
        _shared_edge_case(cross1, v + 1, -1)
        _shared_edge_case(cross1_side_hole, v, 1)
        _shared_edge_case(cross1_side_hole, v + 1, -1)


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_polyline_intersection_rebuilds_and(idx):
    """polygon_test.go:429-476: clipping each polygon's boundary (as a
    polyline) against the other and reassembling the pieces through a
    DIRECTED_XOR builder reproduces A AND B."""
    from gos2_spark.geometry.polyline import Polyline

    a_s, b_s, and_s, _, _ = CASES[idx]
    a, b = makepolygon(a_s), makepolygon(b_s)
    expected = makepolygon(and_s)

    polylines = []
    for tmp0, tmp1 in ((b, a), (a, b)):
        for loop in tmp0.loops:
            n = len(loop.vertices)
            if loop.is_hole():
                pts = [loop.vertex(v) for v in range(n, -1, -1)]
            else:
                pts = [loop.vertex(v) for v in range(n + 1)]
            polylines.extend(B.intersect_with_polyline(tmp1, Polyline(pts)))

    builder = PolygonBuilder(DIRECTED_XOR())
    for pl in polylines:
        for j in range(pl.num_vertices() - 1):
            builder.add_edge(pl.vertex(j), pl.vertex(j + 1))
    got, unused = builder.assemble_polygon()
    assert not unused
    check_equal(got, expected, 1e-4)


def test_edge_interpolate():
    """edgeutil_test.go:287-303 spirit: endpoints exact, midpoint on the
    geodesic, distances proportional."""
    import math

    from gos2_spark.geometry.polyline import edge_interpolate

    a = V.from_degrees(0.0, 0.0)
    b = V.from_degrees(0.0, 10.0)
    assert edge_interpolate(0.0, a, b) == a
    assert edge_interpolate(1.0, a, b) == b
    mid = edge_interpolate(0.5, a, b)
    assert abs(V.angle(a, mid) - V.angle(mid, b)) < 1e-15
    q = edge_interpolate(0.25, a, b)
    assert abs(V.angle(a, q) - 0.25 * V.angle(a, b)) < 1e-15


def test_turn_angle_sign_and_magnitude():
    import math

    from gos2_spark.kernels.predicates import turn_angle

    a = V.from_degrees(0.0, 0.0)
    b = V.from_degrees(0.0, 10.0)
    c_left = V.from_degrees(10.0, 10.0)
    c_straight = V.from_degrees(0.0, 20.0)
    assert turn_angle(a, b, c_left) > 0  # CCW turn -> positive
    assert turn_angle(c_left, b, a) < 0
    assert abs(turn_angle(a, b, c_straight)) < 1e-9
