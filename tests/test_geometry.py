"""Geometry-layer parity tests: fixtures from loop_test.go / cap / rect / metric."""

import math

import numpy as np
import pytest

from gos2_spark.geometry import Cap, Cell, Loop, Polygon, Rect
from gos2_spark.geometry import _vec as V
from gos2_spark.geometry.metric import (
    AVG_AREA, MAX_DIAG, MIN_WIDTH, average_area,
)
from gos2_spark.kernels import hilbert as H


def makeloop(s: str) -> Loop:
    """Parse "lat:lng, lat:lng, ..." (loop_test.go:16-39)."""
    pts = []
    for tok in s.split(","):
        lat, lng = tok.strip().split(":")
        pts.append((float(lat), float(lng)))
    return Loop.from_latlngs_deg(pts)


# loop_test.go:41-109 fixture loops
north_hemi = makeloop("0:-180, 0:-90, 0:0, 0:90")
north_hemi3 = makeloop("0:-180, 0:-60, 0:60")
south_hemi = makeloop("0:90, 0:0, 0:-90, 0:-180")
west_hemi = makeloop("0:-180, -90:0, 0:0, 90:0")
east_hemi = makeloop("90:0, 0:0, -90:0, 0:-180")
near_hemi = makeloop("0:-90, -90:0, 0:90, 90:0")
far_hemi = makeloop("90:0, 0:90, -90:0, 0:-90")
candy_cane = makeloop("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70")
small_ne_cw = makeloop("35:20, 45:20, 40:25")
arctic_80 = makeloop("80:-150, 80:-30, 80:90")
antarctic_80 = makeloop("-80:120, -80:0, -80:-120")
line_triangle = makeloop("0:1, 0:3, 0:2")
skinny_chevron = makeloop("0:0, -1e-320:80, 0:1e-320, 1e-320:80")
loop_a = makeloop("0:178, -1:180, 0:-179, 1:-180")
loop_b = makeloop("0:179, -1:180, 0:-178, 1:-180")
a_intersect_b = makeloop("0:179, -1:180, 0:-179, 1:-180")
a_union_b = makeloop("0:178, -1:180, 0:-178, 1:-180")
a_minus_b = makeloop("0:178, -1:180, 0:179, 1:-180")
b_minus_a = makeloop("0:-179, -1:180, 0:-178, 1:-180")
loop_c = makeloop("0:178, 0:180, -1:180, 0:-179, 1:-179, 1:-180")
loop_d = makeloop("0:178, -1:178, -1:180, 0:-179, 1:-179, 1:-180")


def test_candy_cane_contains():
    # loop_test.go:255-258
    assert candy_cane.contains(V.from_degrees(5, 71))


def test_hemisphere_contains_under_rotation():
    # loop_test.go:259-288
    cases = [
        (north_hemi, (0, 0, 1), True), (north_hemi, (0, 0, -1), False),
        (south_hemi, (0, 0, 1), False), (south_hemi, (0, 0, -1), True),
        (west_hemi, (0, 1, 0), False), (west_hemi, (0, -1, 0), True),
        (east_hemi, (0, 1, 0), True), (east_hemi, (0, -1, 0), False),
    ]
    loops = {id(l): l for l, _, _ in cases}
    for _rot in range(4):
        for loop, p, want in cases:
            got = loops[id(loop)].contains(tuple(float(x) for x in p))
            assert got == want, (loop, p, want)
        # rotate each loop by one vertex
        for key, l in list(loops.items()):
            loops[key] = Loop([l.vertex(i) for i in range(1, l.num_vertices() + 1)])


def test_cell_partition_property():
    # loop_test.go:290-319: at levels 0-2 every cell center/vertex lies in
    # exactly one cell-loop.
    for level in range(3):
        begin = H.child_begin_at_level(
            np.array([(0 << 61) | (1 << 60)], dtype=np.uint64), level)[0]
        end = H.child_end_at_level(
            np.array([(5 << 61) | (1 << 60)], dtype=np.uint64), level)[0]
        loops = []
        points = set()
        cid = int(begin)
        while cid != int(end):
            cell = Cell(cid)
            points.add(cell.center())
            for k in range(4):
                points.add(cell.vertex(k))
            loops.append(Loop([cell.vertex(k) for k in range(4)]))
            cid = int(H.next_cell(np.array([cid], dtype=np.uint64))[0])
        for p in points:
            count = sum(1 for l in loops if l.contains(p))
            assert count == 1


RELATIONS = [
    # (a, b, contains_or_crosses, intersects, nestable) — loop_test.go:365-460
    (north_hemi, north_hemi, 1, True, False),
    (north_hemi, south_hemi, 0, False, False),
    (north_hemi, east_hemi, -1, True, False),
    (north_hemi, arctic_80, 1, True, True),
    (north_hemi, antarctic_80, 0, False, True),
    (north_hemi, candy_cane, -1, True, False),
    (north_hemi3, north_hemi3, 1, True, False),
    (north_hemi3, east_hemi, -1, True, False),
    (north_hemi3, arctic_80, 1, True, True),
    (north_hemi3, antarctic_80, 0, False, True),
    (north_hemi3, candy_cane, -1, True, False),
    (south_hemi, north_hemi, 0, False, False),
    (south_hemi, south_hemi, 1, True, False),
    (south_hemi, far_hemi, -1, True, False),
    (south_hemi, arctic_80, 0, False, True),
    (south_hemi, antarctic_80, 1, True, True),
    (south_hemi, candy_cane, -1, True, False),
    (candy_cane, north_hemi, -1, True, False),
    (candy_cane, south_hemi, -1, True, False),
    (candy_cane, arctic_80, 0, False, True),
    (candy_cane, antarctic_80, 0, False, True),
    (candy_cane, candy_cane, 1, True, False),
    (near_hemi, west_hemi, -1, True, False),
    (small_ne_cw, south_hemi, 1, True, False),
    (small_ne_cw, west_hemi, 1, True, False),
    (small_ne_cw, north_hemi, -2, True, False),
    (small_ne_cw, east_hemi, -2, True, False),
    (loop_a, loop_a, 1, True, False),
    (loop_a, loop_b, -1, True, False),
    (loop_a, a_intersect_b, 1, True, False),
    (loop_a, a_union_b, 0, True, False),
    (loop_a, a_minus_b, 1, True, False),
    (loop_a, b_minus_a, 0, False, False),
    (loop_b, loop_a, -1, True, False),
    (loop_b, loop_b, 1, True, False),
    (loop_b, a_intersect_b, 1, True, False),
    (loop_b, a_union_b, 0, True, False),
    (loop_b, a_minus_b, 0, False, False),
    (loop_b, b_minus_a, 1, True, False),
    (a_intersect_b, loop_a, 0, True, False),
    (a_intersect_b, loop_b, 0, True, False),
    (a_intersect_b, a_intersect_b, 1, True, False),
    (a_intersect_b, a_union_b, 0, True, True),
    (a_intersect_b, a_minus_b, 0, False, False),
    (a_intersect_b, b_minus_a, 0, False, False),
    (a_union_b, loop_a, 1, True, False),
    (a_union_b, loop_b, 1, True, False),
    (a_union_b, a_intersect_b, 1, True, True),
    (a_union_b, a_union_b, 1, True, False),
    (a_union_b, a_minus_b, 1, True, False),
    (a_union_b, b_minus_a, 1, True, False),
    (a_minus_b, loop_a, 0, True, False),
    (a_minus_b, loop_b, 0, False, False),
    (a_minus_b, a_intersect_b, 0, False, False),
    (a_minus_b, a_union_b, 0, True, False),
    (a_minus_b, a_minus_b, 1, True, False),
    (a_minus_b, b_minus_a, 0, False, True),
    (b_minus_a, loop_a, 0, False, False),
    (b_minus_a, loop_b, 0, True, False),
    (b_minus_a, a_intersect_b, 0, False, False),
    (b_minus_a, a_union_b, 0, True, False),
    (b_minus_a, a_minus_b, 0, False, True),
    (b_minus_a, b_minus_a, 1, True, False),
    (loop_a, loop_c, -1, True, False),
    (loop_c, loop_a, -1, True, False),
    (loop_a, loop_d, 0, True, False),
    (loop_d, loop_a, 1, True, False),
]


@pytest.mark.parametrize("idx", range(len(RELATIONS)))
def test_loop_relations(idx):
    a, b, coc, intersects, nestable = RELATIONS[idx]
    assert a.contains_loop(b) == (coc == 1)
    assert a.intersects(b) == intersects
    if nestable:
        assert a.contains_nested(b) == a.contains_loop(b)
    if coc >= -1:
        assert a.contains_or_crosses(b) == coc


def test_loop_areas():
    eps = 1e-12
    assert abs(north_hemi.area() - 2 * math.pi) < eps
    assert abs(east_hemi.area() - 2 * math.pi) < 1e-10
    # arctic_80: polar cap-ish triangle (loop_test.go TestAreaCentroid)
    lat = math.radians(80)
    expected = 2 * math.pi * (1 - math.sin(lat))
    assert arctic_80.area() < expected * 1.3  # vertices pull the boundary in


def test_turning_angle():
    # loop_test.go:231-252: north_hemi3 ~0, line_triangle -2pi, chevron +2pi
    assert abs(north_hemi3.turning_angle()) < 1e-15
    assert abs(line_triangle.turning_angle() + 2 * math.pi) < 1e-15
    assert abs(skinny_chevron.turning_angle() - 2 * math.pi) < 1e-15
    # invariants: invert negates
    for loop in (line_triangle, candy_cane):
        want = loop.turning_angle()
        inv = Loop(list(reversed(loop.vertices)))
        assert abs(inv.turning_angle() + want) < 1e-14


def test_loop_bound_poles():
    assert arctic_80.bound.lat.hi == math.pi / 2
    assert antarctic_80.bound.lat.lo == -math.pi / 2
    # small CW loop contains both poles
    assert small_ne_cw.bound.is_full() or small_ne_cw.bound.lat.hi == math.pi / 2


def test_cap_basics():
    # cap_test.go style checks
    full = Cap.full()
    empty = Cap.empty()
    assert full.contains_cap(empty)
    assert full.is_full() and empty.is_empty()
    c = Cap.from_latlng_deg(40.0, -74.0, 1.0)
    assert c.contains_point(V.from_degrees(40.5, -74.0))
    assert not c.contains_point(V.from_degrees(42.0, -74.0))
    assert abs(math.degrees(c.radius()) - 1.0) < 1e-12
    exp = c.expanded(math.radians(1.0))
    assert exp.contains_cap(c)
    assert c.complement().contains_point(V.from_degrees(-40.0, 106.0))


def test_rect_basics():
    r = Rect.from_degrees(-10, 100, 10, -100)  # wraps the date line
    assert r.contains_latlng_rad(math.radians(0), math.radians(180))
    assert r.contains_latlng_rad(math.radians(0), math.radians(-170))
    assert not r.contains_latlng_rad(math.radians(0), math.radians(0))
    assert r.lng.is_inverted()
    cb = r.cap_bound()
    for k in range(4):
        assert cb.contains_point(V.from_latlng_rad(*r.vertex(k)))


def test_cell_basics():
    cell = Cell.from_latlng_deg(40.7, -74.0)
    assert cell.is_leaf()
    top = Cell((2 << 61) | (1 << 60))
    assert top.level == 0
    assert top.contains_point((0.0, 0.0, 1.0))
    rb = top.rect_bound()
    assert rb.lat.hi == math.pi / 2
    # vertices of a cell are contained by its rect/cap bounds
    c7 = Cell(int(H.parent(np.array([cell.id], dtype=np.uint64), 7)[0]))
    rb = c7.rect_bound()
    cb = c7.cap_bound()
    for k in range(4):
        v = c7.vertex(k)
        assert rb.contains_point(v)
        assert cb.contains_point(v)
        # raw (unnormalized) vertex projects exactly onto the uv corner;
        # the normalized one may re-round an ulp outside (same as reference)
        assert c7.contains_point(c7.vertex_raw(k))
    assert abs(c7.exact_area() / c7.average_area() - 1) < 0.5


def test_cell_region_vs_cap():
    cap = Cap.from_latlng_deg(40.7, -74.0, 2.0)
    leaf = Cell.from_latlng_deg(40.7, -74.0)
    c8 = Cell(int(H.parent(np.array([leaf.id], dtype=np.uint64), 8)[0]))
    assert cap.may_intersect_cell(c8)
    # a tiny cell at the cap center must be fully contained
    c12 = Cell(int(H.parent(np.array([leaf.id], dtype=np.uint64), 12)[0]))
    assert cap.contains_cell(c12)
    # a far-away cell is neither
    far = Cell.from_latlng_deg(-40.0, 100.0)
    f8 = Cell(int(H.parent(np.array([far.id], dtype=np.uint64), 8)[0]))
    assert not cap.may_intersect_cell(f8)


def test_metric_values():
    # metric_test.go:8-51 spot checks
    assert MIN_WIDTH.value(0) == 2 * math.sqrt(2) / 3
    assert abs(AVG_AREA.value(0) - 4 * math.pi / 6) < 1e-15
    assert average_area(30) == AVG_AREA.value(30)
    # MinLevel/MaxLevel sanity: value at min_level(v) <= v
    for v in (0.1, 0.01, 1e-5):
        lv = MIN_WIDTH.min_level(v)
        assert MIN_WIDTH.value(lv) <= v
        if lv > 0:
            assert MIN_WIDTH.value(lv - 1) > v
        lv = MAX_DIAG.max_level(v)
        assert MAX_DIAG.value(lv) >= v


def test_polygon_nesting_and_contains():
    shell = Loop.regular(40.0, -74.0, 10.0, 24)
    # holes are passed as CCW loops around the hole disc; nesting depth
    # (odd) marks them as holes and the XOR does the rest (polygon.go:201-216)
    hole = Loop.regular(40.0, -74.0, 4.0, 16)
    poly = Polygon([shell, hole])
    assert poly.num_loops() == 2
    assert poly.has_holes
    assert poly.loops[0].depth == 0 and poly.loops[1].depth == 1
    # point inside shell but not in hole ring -> inside
    p_ring = V.from_degrees(40.0, -67.0)  # ~7 deg east of center
    p_hole = V.from_degrees(40.0, -74.0)  # center, inside the hole
    p_out = V.from_degrees(60.0, 100.0)
    assert poly.contains_point(p_ring)
    assert not poly.contains_point(p_hole)
    assert not poly.contains_point(p_out)
    pts = np.array([p_ring, p_hole, p_out])
    assert poly.contains_batch(pts).tolist() == [True, False, False]


def test_batch_matches_scalar_on_fixture_loops():
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(200, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    for loop in (north_hemi, candy_cane, arctic_80, loop_a, small_ne_cw):
        got = loop.contains_batch(pts)
        want = np.array([loop.contains(tuple(p)) for p in pts])
        # batch kernel skips the bound prefilter; scalar includes it — compare
        # against the raw parity walk instead
        raw = np.array([
            _parity_walk(loop, tuple(p)) for p in pts
        ])
        assert (got == raw).all()
        # and bound prefilter only ever removes points the walk rejects
        assert (~want | got).all()


def _parity_walk(loop, p):
    from gos2_spark.kernels import predicates as PR

    inside = loop.origin_inside
    for i in range(loop.num_vertices()):
        if PR.edge_or_vertex_crossing(
            tuple(PR.ORIGIN), p, loop.vertex(i), loop.vertex(i + 1)
        ):
            inside = not inside
    return inside


def test_normalized_compatible_with_contains():
    """loop_test.go:583-607: IsNormalized() != Contains(p) for a degenerate
    loop and its inversion; Normalize() makes Contains(p) false."""
    p = tuple(V.from_latlng_rad(math.radians(40.0), math.radians(40.0)))
    for fixture in ("0:1, 0:3, 0:2", "0:0, -1e-320:80, 0:1e-320, 1e-320:80"):
        loop = makeloop(fixture)
        flip = makeloop(fixture)
        flip.invert()
        assert loop.is_normalized() != loop.contains(p)
        assert flip.is_normalized() != flip.contains(p)
        assert loop.is_normalized() != flip.is_normalized()
        flip.normalize()
        assert not flip.contains(p)


def test_polygon_from_cell_constructor_and_contains():
    """polygon_test.go:525-539: a polygon built from a leaf-area cell
    contains that cell, itself, and survives union with empty."""
    from gos2_spark.geometry.boolean_ops import union

    cell = Cell.from_latlng_deg(40.565459, -74.645276)
    # use a coarser cell (level 10) so the polygon has finite-area edges
    parent = Cell(int(H.parent(np.array([cell.id], dtype=np.uint64), 10)[0]))
    cell_as_poly = Polygon.from_cell(parent)
    poly_copy = union(cell_as_poly, Polygon([]))
    assert poly_copy.contains_polygon(cell_as_poly)
    assert poly_copy.contains_cell(parent)
    assert cell_as_poly.contains_cell(parent)
    assert cell_as_poly.contains_point(parent.center())
