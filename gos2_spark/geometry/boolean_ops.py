"""Polygon boolean operations: intersection, union, difference, n-way union.

Semantics: /root/reference/s2/polygon.go:390-449 (InitToIntersection /
Union / Difference via ClipBoundary + PolygonBuilder with DIRECTED_XOR and
intersectionTolerance merge radius), :531-564 (smallest-first n-way union),
plus edge clipping (ClipEdge/AddIntersection, polygon.go:658-698) and
GetIntersection (edgeutil.go:356-392).

Driver-side ([D] tier, SURVEY §2.4): used for tile clipping and
raster<->vector assembly, not the per-row hot path. Candidate generation is
brute force over the clip polygon's edges (the reference's PolygonIndex is a
pruning optimization with identical output).
"""

from __future__ import annotations

import math

from ..kernels import predicates as PR
from . import _vec as V
from .builder import DIRECTED_XOR, PolygonBuilder
from .loop import Loop
from .polygon import Polygon

INTERSECTION_TOLERANCE = 1.5e-15  # polygon.go:391


def get_intersection(a0, a1, b0, b1):
    """Intersection point of two crossing edges, snapped to the closest
    vertex when numerically ambiguous (edgeutil.go:356-382)."""
    a_norm = V.normalize(PR._point_cross(a0, a1))
    b_norm = V.normalize(PR._point_cross(b0, b1))
    x = V.normalize(PR._point_cross(a_norm, b_norm))
    if V.dot(x, V.add(V.add(a0, a1), V.add(b0, b1))) < 0:
        x = V.neg(x)
    if PR.ordered_ccw(a0, x, a1, a_norm) and PR.ordered_ccw(b0, x, b1, b_norm):
        return x

    dmin2 = 10.0
    vmin = x

    def replace_if_closer(y):
        nonlocal dmin2, vmin
        d2 = V.norm2(V.sub(x, y))
        if d2 < dmin2 or (d2 == dmin2 and y < vmin):
            dmin2 = d2
            vmin = tuple(y)

    if PR.ordered_ccw(b0, a0, b1, b_norm):
        replace_if_closer(a0)
    if PR.ordered_ccw(b0, a1, b1, b_norm):
        replace_if_closer(a1)
    if PR.ordered_ccw(a0, b0, a1, a_norm):
        replace_if_closer(b0)
    if PR.ordered_ccw(a0, b1, a1, a_norm):
        replace_if_closer(b1)
    return vmin


def get_distance_fraction(x, a0, a1) -> float:
    """edgeutil.go:394-398."""
    d0 = V.angle(x, a0)
    d1 = V.angle(x, a1)
    return d0 / (d0 + d1)


def _polygon_edges(poly: Polygon, reverse: bool):
    """Directed edge list matching PolygonIndex.EdgeFromTo
    (polygon.go:770-784): holes (xor reverse) iterate backwards."""
    edges = []
    for loop in poly.loops:
        n = len(loop.vertices)
        if loop.is_hole() != reverse:
            for i in range(n):
                edges.append((loop.vertex(n - 1 - i), loop.vertex((2 * n - 2 - i) % n)))
        else:
            for i in range(n):
                edges.append((loop.vertex(i), loop.vertex((i + 1) % n)))
    return edges


def _add_intersection(a0, a1, b0, b1, add_shared_edges, crossing, intersections):
    """polygon.go:658-678."""
    if crossing > 0:
        x = get_intersection(a0, a1, b0, b1)
        t = get_distance_fraction(x, a0, a1)
        intersections.append((t, tuple(x)))
    elif PR.vertex_crossing(a0, a1, b0, b1):
        t = 0.0 if (a0 == b0 or a0 == b1) else 1.0
        if not add_shared_edges and a1 == b1:
            t = 1.0
        intersections.append((t, a1 if t != 0 else a0))


def _clip_edge(a0, a1, b_edges, add_shared_edges, intersections):
    """polygon.go:680-698 (brute-force candidates)."""
    for f, t in b_edges:
        crossing = PR.robust_crossing(a0, a1, f, t)
        if crossing < 0:
            continue
        _add_intersection(a0, a1, f, t, add_shared_edges, crossing, intersections)


def clip_boundary(
    a: Polygon, reverse_a: bool, b: Polygon, reverse_b: bool,
    invert_b: bool, add_shared_edges: bool, builder: PolygonBuilder,
) -> None:
    """Clip A's boundary to the interior (or exterior) of B
    (polygon.go:700-735): walk each A edge, split at intersections with B's
    boundary, keep the segments inside (the parity walk along the edge)."""
    b_edges = _polygon_edges(b, reverse_b)
    for a_loop in a.loops:
        n = len(a_loop.vertices)
        direction = -1 if (a_loop.is_hole() != reverse_a) else 1
        inside = b.contains_point(a_loop.vertex(0)) != invert_b
        j = 0 if direction > 0 else n  # polygon.go:708-711
        count = n
        while count > 0:
            a0 = a_loop.vertex(j % n)
            a1 = a_loop.vertex((j + direction) % n)
            intersections: list[tuple[float, tuple]] = []
            _clip_edge(a0, a1, b_edges, add_shared_edges, intersections)
            if inside:
                intersections.append((0.0, tuple(a0)))
            inside = (len(intersections) & 1) != 0
            if inside:
                intersections.append((1.0, tuple(a1)))
            intersections.sort()
            for k in range(0, len(intersections), 2):
                if intersections[k] == intersections[k + 1]:
                    continue
                builder.add_edge(intersections[k][1], intersections[k + 1][1])
            count -= 1
            j += direction


def intersection(a: Polygon, b: Polygon,
                 vertex_merge_radius: float = INTERSECTION_TOLERANCE) -> Polygon:
    """polygon.go:393-415."""
    if not a.bound.intersects_rect(b.bound):
        return Polygon([])
    options = DIRECTED_XOR()
    options.vertex_merge_radius = vertex_merge_radius
    builder = PolygonBuilder(options)
    clip_boundary(a, False, b, False, False, True, builder)
    clip_boundary(b, False, a, False, False, False, builder)
    poly, unused = builder.assemble_polygon()
    if unused:
        raise ValueError("bad directed edges in intersection")
    return poly


def union(a: Polygon, b: Polygon,
          vertex_merge_radius: float = INTERSECTION_TOLERANCE) -> Polygon:
    """polygon.go:417-433."""
    options = DIRECTED_XOR()
    options.vertex_merge_radius = vertex_merge_radius
    builder = PolygonBuilder(options)
    clip_boundary(a, False, b, False, True, True, builder)
    clip_boundary(b, False, a, False, True, False, builder)
    poly, unused = builder.assemble_polygon()
    if unused:
        raise ValueError("bad directed edges in union")
    return poly


def difference(a: Polygon, b: Polygon,
               vertex_merge_radius: float = INTERSECTION_TOLERANCE) -> Polygon:
    """polygon.go:435-449."""
    options = DIRECTED_XOR()
    options.vertex_merge_radius = vertex_merge_radius
    builder = PolygonBuilder(options)
    clip_boundary(a, False, b, True, True, True, builder)
    clip_boundary(b, True, a, False, False, False, builder)
    poly, unused = builder.assemble_polygon()
    if unused:
        raise ValueError("bad directed edges in difference")
    return poly


def destructive_union(polygons: list[Polygon],
                      vertex_merge_radius: float = INTERSECTION_TOLERANCE) -> Polygon:
    """Smallest-pair-first n-way union (polygon.go:531-564).

    At engine scale the same op runs as a GROUP BY cell-prefix + per-group
    driver union; this is the per-group kernel.
    """
    import heapq

    if not polygons:
        return Polygon([])
    heap = [(sum(len(l.vertices) for l in p.loops), i, p)
            for i, p in enumerate(polygons)]
    heapq.heapify(heap)
    counter = len(polygons)
    while len(heap) > 1:
        _, _, p1 = heapq.heappop(heap)
        _, _, p2 = heapq.heappop(heap)
        merged = union(p1, p2, vertex_merge_radius)
        heapq.heappush(
            heap, (sum(len(l.vertices) for l in merged.loops), counter, merged)
        )
        counter += 1
    return heap[0][2]


def boundary_approx_equals(a: Polygon, b: Polygon, max_error: float = 1e-6) -> bool:
    """polygon.go:594-612."""
    if len(a.loops) != len(b.loops):
        return False
    for a_loop in a.loops:
        if not any(
            b_loop.depth == a_loop.depth
            and b_loop.boundary_approx_equals(a_loop, max_error)
            for b_loop in b.loops
        ):
            return False
    return True


def _match_boundaries(a: Loop, b: Loop, offset: int, max_error: float) -> bool:
    """loop.go:787-828."""
    pending = [(0, 0)]
    done = set()
    alen, blen = len(a.vertices), len(b.vertices)
    while pending:
        i, j = pending.pop()
        if i == alen and j == blen:
            return True
        done.add((i, j))
        io = i + offset
        if io >= alen:
            io -= alen
        if i < alen and (i + 1, j) not in done:
            if _dist_to_edge(a.vertex((io + 1) % alen), b.vertex(j % blen),
                             b.vertex((j + 1) % blen)) <= max_error:
                pending.append((i + 1, j))
        if j < blen and (i, j + 1) not in done:
            if _dist_to_edge(b.vertex((j + 1) % blen), a.vertex(io % alen),
                             a.vertex((io + 1) % alen)) <= max_error:
                pending.append((i, j + 1))
    return False


def _dist_to_edge(x, a, b) -> float:
    from .builder import PointIndex

    return PointIndex._dist_to_edge(x, a, b, PR._point_cross(a, b))


def loop_boundary_near(a: Loop, b: Loop, max_error: float = 1e-15) -> bool:
    """loop.go:781-785."""
    if len(a.vertices) != len(b.vertices):
        return False
    return any(
        _match_boundaries(a, b, offset, max_error)
        for offset in range(len(a.vertices))
    )


def boundary_near(a: Polygon, b: Polygon, max_error: float = 1e-15) -> bool:
    """polygon.go:615-634 — the SplitAndAssemble round-trip oracle."""
    if len(a.loops) != len(b.loops):
        return False
    for a_loop in a.loops:
        if not any(
            b_loop.depth == a_loop.depth and loop_boundary_near(b_loop, a_loop, max_error)
            for b_loop in b.loops
        ):
            return False
    return True


def internal_clip_polyline(
    poly: Polygon, invert: bool, polyline, merge_radius: float,
) -> list:
    """Clip polyline to the interior (exterior if ``invert``) of ``poly``
    (polygon.go:451-513): walk the polyline edges, split each at its
    intersections with the polygon boundary (sorted by distance fraction
    along the edge), emit the segments on the kept side; adjacent output
    vertices closer than ``merge_radius`` collapse, and a gap larger than
    it starts a new polyline."""
    from .polyline import Polyline

    b_edges = _polygon_edges(poly, False)
    out: list = []
    vertices: list = []
    inside = poly.contains_point(polyline.vertex(0)) != invert
    n = polyline.num_vertices()
    for j in range(n - 1):
        a0 = tuple(polyline.vertex(j))
        a1 = tuple(polyline.vertex(j + 1))
        intersections: list = []
        _clip_edge(a0, a1, b_edges, True, intersections)
        if inside:
            intersections.append((0.0, a0))
        inside = (len(intersections) & 1) != 0
        if inside:
            intersections.append((1.0, a1))
        intersections.sort()
        for k in range(0, len(intersections), 2):
            if intersections[k] == intersections[k + 1]:
                continue
            v0 = intersections[k][1]
            v1 = intersections[k + 1][1]
            if vertices and V.angle(vertices[-1], v0) > merge_radius:
                out.append(Polyline(vertices))
                vertices = []
            if not vertices:
                vertices.append(v0)
            if V.angle(vertices[-1], v1) > merge_radius:
                vertices.append(v1)
    if vertices:
        out.append(Polyline(vertices))
    return out


def intersect_with_polyline(
    poly: Polygon, polyline, merge_radius: float = INTERSECTION_TOLERANCE,
) -> list:
    """polygon.go:516-523 (IntersectWithPolyline / ...Sloppy)."""
    return internal_clip_polyline(poly, False, polyline, merge_radius)


def subtract_from_polyline(
    poly: Polygon, polyline, merge_radius: float = INTERSECTION_TOLERANCE,
) -> list:
    """polygon.go:525-529 (SubtractFromPolyline / ...Sloppy)."""
    return internal_clip_polyline(poly, True, polyline, merge_radius)
