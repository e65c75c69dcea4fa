"""PolygonBuilder: edge soup -> loops/polygons (XOR, merge, splice, assemble).

Semantics: /root/reference/s2/polygonbuilder.go. Driver-side — used by the
polygon boolean ops (raster<->vector assembly, tile clipping), never per
data row. Vertices are exact float tuples (Go compares Point structs the
same way).
"""

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass, field

import numpy as np

from ..kernels import hilbert as H
from ..kernels import predicates as PR
from ..kernels import projection as PJ
from . import _vec as V
from .loop import Loop
from .metric import MIN_WIDTH

MAX_LEVEL = 30
_SENTINEL = (1 << 64) - 1


@dataclass
class BuilderOptions:
    """polygonbuilder.go:14-68."""

    xor_edges: bool = True
    undirected_edges: bool = False
    validate: bool = False
    vertex_merge_radius: float = 0.0  # radians
    edge_splice_fraction: float = 0.866


def DIRECTED_XOR() -> BuilderOptions:
    return BuilderOptions(xor_edges=True, undirected_edges=False)


def UNDIRECTED_XOR() -> BuilderOptions:
    return BuilderOptions(xor_edges=True, undirected_edges=True)


def UNDIRECTED_UNION() -> BuilderOptions:
    return BuilderOptions(xor_edges=False, undirected_edges=True)


def _leaf(p) -> int:
    return int(PJ.cellid_from_xyz(np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))[0])


class PointIndex:
    """Cell-keyed point multimap + nearest-point-to-edge query
    (polygonbuilder.go:81-183)."""

    def __init__(self, vertex_radius: float, edge_fraction: float):
        self.vertex_radius = vertex_radius
        self.edge_fraction = edge_fraction
        self.level = min(MIN_WIDTH.max_level(2 * vertex_radius), MAX_LEVEL - 1)
        self._items: list[tuple[int, tuple]] = [(_SENTINEL, (0.0, 0.0, 0.0))]

    def insert(self, p) -> None:
        for cid in PJ.vertex_neighbors(_leaf(p), self.level):
            bisect.insort(self._items, (cid, tuple(p)))

    def erase(self, p) -> None:
        p = tuple(p)
        for cid in PJ.vertex_neighbors(_leaf(p), self.level):
            i = bisect.bisect_left(self._items, (cid, (-2.0, -2.0, -2.0)))
            while i < len(self._items) and self._items[i][1] != p:
                i += 1
            if i < len(self._items):
                self._items.pop(i)

    def query_cap(self, axis) -> list[tuple]:
        """Points within vertex_radius of axis (same-cell candidates only,
        exactly like the reference, polygonbuilder.go:169-183)."""
        cid = int(H.parent(np.array([_leaf(axis)], dtype=np.uint64), self.level)[0])
        out = []
        i = bisect.bisect_left(self._items, (cid, (-2.0, -2.0, -2.0)))
        while i < len(self._items) and self._items[i][0] == cid:
            p = self._items[i][1]
            if V.angle(axis, p) < self.vertex_radius:
                out.append(p)
            i += 1
        return out

    def find_nearby_point(self, v0, v1):
        """Closest indexed point within vertex_radius of edge (v0,v1), not an
        endpoint; returns (found_bool, point) (polygonbuilder.go:100-141)."""
        length = V.angle(v0, v1)
        normal = PR._point_cross(v0, v1)
        level = min(self.level, MIN_WIDTH.max_level(length))
        ids = sorted(
            set(PJ.vertex_neighbors(_leaf(v0), level))
            | set(PJ.vertex_neighbors(_leaf(v1), level))
        )
        best_dist = 2 * self.vertex_radius
        best = None
        for cid in ids:
            lsb = cid & -cid
            lo, hi = cid - (lsb - 1), cid + (lsb - 1)
            j = bisect.bisect_left(self._items, (lo, (-2.0, -2.0, -2.0)))
            while j < len(self._items) and self._items[j][0] <= hi:
                p = self._items[j][1]
                j += 1
                if p == tuple(v0) or p == tuple(v1):
                    continue
                dist = self._dist_to_edge(p, v0, v1, normal)
                if dist < best_dist:
                    best_dist = dist
                    best = p
        return best_dist < self.edge_fraction * self.vertex_radius, best

    @staticmethod
    def _dist_to_edge(x, a, b, a_cross_b) -> float:
        """Scalar DistanceToEdgeWithNormal (edgeutil.go:77-106)."""
        if PR.simple_ccw(a_cross_b, a, x) and PR.simple_ccw(x, b, a_cross_b):
            sin_dist = abs(V.dot(x, a_cross_b)) / V.norm(a_cross_b)
            return math.asin(min(1.0, sin_dist))
        xa = V.norm2(V.sub(x, a))
        xb = V.norm2(V.sub(x, b))
        return 2 * math.asin(min(1.0, 0.5 * math.sqrt(min(xa, xb))))


class PolygonBuilder:
    """polygonbuilder.go:223-570."""

    def __init__(self, options: BuilderOptions):
        self.options = options
        self.edges: dict[tuple, list[tuple]] = {}  # v0 -> sorted list of v1
        self.starting_vertices: list[tuple] = []

    def has_edge(self, v0, v1) -> bool:
        vs = self.edges.get(tuple(v0))
        if vs is None:
            return False
        i = bisect.bisect_left(vs, tuple(v1))
        return i < len(vs) and vs[i] == tuple(v1)

    def add_edge(self, v0, v1) -> bool:
        """polygonbuilder.go:244-265 (XOR erases opposite-direction dups)."""
        v0, v1 = tuple(v0), tuple(v1)
        if v0 == v1:
            return False
        if self.options.xor_edges and self.has_edge(v1, v0):
            self.erase_edge(v1, v0)
            return False
        if v0 not in self.edges:
            self.edges[v0] = []
            self.starting_vertices.append(v0)
        bisect.insort(self.edges[v0], v1)
        if self.options.undirected_edges:
            if v1 not in self.edges:
                self.edges[v1] = []
                self.starting_vertices.append(v1)
            bisect.insort(self.edges[v1], v0)
        return True

    def add_loop(self, loop: Loop) -> None:
        """polygonbuilder.go:267-273 (holes added reversed)."""
        sign = loop.sign()
        for i in range(len(loop.vertices), 0, -1):
            self.add_edge(loop.vertex(i % len(loop.vertices)),
                          loop.vertex((i + sign) % len(loop.vertices)))

    def add_polygon(self, polygon) -> None:
        for loop in polygon.loops:
            self.add_loop(loop)

    def erase_edge(self, v0, v1) -> None:
        v0, v1 = tuple(v0), tuple(v1)
        vs = self.edges.get(v0)
        if vs is not None:
            i = bisect.bisect_left(vs, v1)
            if i < len(vs) and vs[i] == v1:
                vs.pop(i)
            if not vs:
                del self.edges[v0]
        if self.options.undirected_edges:
            vs = self.edges.get(v1)
            if vs is not None:
                i = bisect.bisect_left(vs, v0)
                if i < len(vs) and vs[i] == v0:
                    vs.pop(i)
                if not vs:
                    del self.edges[v1]

    def erase_loop(self, loop: Loop) -> None:
        n = len(loop.vertices)
        for j in range(n):
            self.erase_edge(loop.vertices[j - 1], loop.vertices[j])

    # --- vertex merging ------------------------------------------------------

    def build_merge_map(self, index: PointIndex) -> dict[tuple, tuple]:
        """Connected components of the <=merge-radius graph
        (polygonbuilder.go:311-359)."""
        vertices = set(self.edges.keys())
        for vs in self.edges.values():
            vertices.update(vs)
        for p in vertices:
            index.insert(p)
        merge_map: dict[tuple, tuple] = {}
        for p in sorted(vertices):  # deterministic iteration
            if p in merge_map:
                continue
            frontier = [p]
            while frontier:
                cur = frontier.pop()
                for v1 in index.query_cap(cur):
                    if v1 != p:
                        index.erase(v1)
                        frontier.append(v1)
                        merge_map[v1] = p
        return merge_map

    def move_vertices(self, merge_map: dict) -> None:
        """polygonbuilder.go:361-394."""
        if not merge_map:
            return
        moved = []
        for v0, vs in self.edges.items():
            for v1 in vs:
                if (v0 in merge_map or v1 in merge_map) and (
                    not self.options.undirected_edges or v0 < v1
                ):
                    moved.append((v0, v1))
        for v0, v1 in moved:
            self.erase_edge(v0, v1)
            self.add_edge(merge_map.get(v0, v0), merge_map.get(v1, v1))

    def splice_edges(self, index: PointIndex) -> None:
        """polygonbuilder.go:396-435."""
        stack = []
        for v0, vs in self.edges.items():
            for v1 in vs:
                if not self.options.undirected_edges or v0 < v1:
                    stack.append((v0, v1))
        while stack:
            v0, v1 = stack.pop()
            if self.options.xor_edges and not self.has_edge(v0, v1):
                continue
            found, vmid = index.find_nearby_point(v0, v1)
            if not found:
                continue
            self.erase_edge(v0, v1)
            if self.add_edge(v0, vmid):
                stack.append((v0, vmid))
            if self.add_edge(vmid, v1):
                stack.append((vmid, v1))

    # --- assembly ------------------------------------------------------------

    def assemble_loop(self, v0, v1, unused_edges: list) -> Loop | None:
        """Greedy CCW-most walk (polygonbuilder.go:444-500)."""
        path = [tuple(v0), tuple(v1)]
        index = {tuple(v1): 1}
        while len(path) >= 2:
            v0, v1 = path[-2], path[-1]
            v2 = None
            for v in self.edges.get(v1, []):
                if v == v0:
                    continue
                if v2 is None or PR.ordered_ccw(v0, v2, v, v1):
                    v2 = v
            if v2 is None:
                unused_edges.append((v0, v1))
                self.erase_edge(v0, v1)
                index.pop(v1, None)
                path.pop()
            elif v2 not in index:
                index[v2] = len(path)
                path.append(v2)
            else:
                path = path[index[v2]:]
                loop = Loop(path)
                if self.options.validate and not _loop_is_valid(loop):
                    self._reject_loop(loop, unused_edges)
                    self.erase_loop(loop)
                    return None
                if self.options.undirected_edges and not loop.is_normalized():
                    return self.assemble_loop(path[1], path[0], unused_edges)
                return loop
        return None

    def _reject_loop(self, loop: Loop, unused_edges: list) -> None:
        n = len(loop.vertices)
        for j in range(n):
            unused_edges.append((loop.vertices[j - 1], loop.vertices[j]))

    def assemble_loops(self, unused_edges: list | None = None) -> tuple[list[Loop], list]:
        """polygonbuilder.go:502-539."""
        if self.options.vertex_merge_radius > 0:
            index = PointIndex(
                self.options.vertex_merge_radius, self.options.edge_splice_fraction
            )
            self.move_vertices(self.build_merge_map(index))
            if self.options.edge_splice_fraction > 0:
                self.splice_edges(index)
        if unused_edges is None:
            unused_edges = []
        loops: list[Loop] = []
        i = 0
        while i < len(self.starting_vertices):
            v0 = self.starting_vertices[i]
            candidates = self.edges.get(v0)
            if candidates:
                v1 = candidates[0]
                loop = self.assemble_loop(v0, v1, unused_edges)
                if loop is not None:
                    loops.append(loop)
                    self.erase_loop(loop)
            else:
                i += 1
        return loops, unused_edges

    def assemble_polygon(self):
        """polygonbuilder.go:541-562. Returns (Polygon, unused_edges)."""
        from .polygon import Polygon

        loops, unused = self.assemble_loops()
        if not self.options.undirected_edges:
            for loop in loops:
                loop.normalize()
        return Polygon(loops), unused


def _loop_is_valid(loop: Loop) -> bool:
    """Simplified Loop.IsValid (loop.go:90-133): >=3 unit vertices, no dups,
    no non-adjacent edge crossings (brute force)."""
    n = len(loop.vertices)
    if n < 3:
        return False
    if len(set(loop.vertices)) != n:
        return False
    for v in loop.vertices:
        if not V.is_unit(v):
            return False
    for i in range(n):
        for j in range(i + 1, n):
            if PR.robust_crossing(
                loop.vertex(i), loop.vertex(i + 1), loop.vertex(j), loop.vertex(j + 1)
            ) > 0:
                return False
    return True
