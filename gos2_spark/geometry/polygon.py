"""Polygon: nested loops (shells even depth, holes odd depth).

Semantics: /root/reference/s2/polygon.go (Init/InsertLoop:241-305,
ContainsPoint:201-216, relations:101-265). Boolean ops (InitToIntersection /
Union / Difference) live with the PolygonBuilder (later build stage).
"""

from __future__ import annotations

import numpy as np

from .loop import Loop
from .rect import Rect


def are_loops_valid(loops: list[Loop]) -> bool:
    """Validation for a loop set about to form a polygon
    (polygon.go:315-340): no directed edge may appear in two loops, every
    loop must be normalized (cover less than half the sphere), and no two
    loop boundaries may cross (contains_or_crosses < 0 also catches
    shared-vertex boundary crossings)."""
    if len(loops) > 1:
        edges: dict = {}
        for i, loop in enumerate(loops):
            n = len(loop.vertices)
            for j in range(n):
                key = (loop.vertex(j), loop.vertex((j + 1) % n))
                if key in edges:
                    return False
                edges[key] = (i, j)
    for i, loop in enumerate(loops):
        if not loop.is_normalized():
            return False
        for j in range(i + 1, len(loops)):
            if loop.contains_or_crosses(loops[j]) < 0:
                return False
    return True


class Polygon:
    def __init__(self, loops: list[Loop]):
        """Takes ownership; nests loops into the depth forest (polygon.go:65-91)."""
        self.loops: list[Loop] = []
        self.has_holes = False
        self.bound = Rect.empty()
        self._init(list(loops))

    @staticmethod
    def from_loop(loop: Loop) -> "Polygon":
        p = Polygon.__new__(Polygon)
        p.loops = [loop]
        p.has_holes = False
        p.bound = loop.bound
        return p

    @staticmethod
    def from_cell(cell) -> "Polygon":
        return Polygon.from_loop(Loop.from_cell(cell))

    def _init(self, loops: list[Loop]) -> None:
        loop_map: dict[int | None, list[Loop]] = {None: []}

        def insert(new_loop: Loop, parent: Loop | None) -> None:
            """polygon.go:287-305."""
            key = id(parent) if parent is not None else None
            for child in loop_map.get(key, []):
                if child.contains_nested(new_loop):
                    insert(new_loop, child)
                    return
            children = loop_map.setdefault(key, [])
            i = 0
            while i < len(children):
                child = children[i]
                if new_loop.contains_nested(child):
                    loop_map.setdefault(id(new_loop), []).append(child)
                    children.pop(i)
                else:
                    i += 1
            children.append(new_loop)

        for loop in loops:
            insert(loop, None)

        # depth-first reorder with depth assignment (polygon.go:276-285)
        self.loops = []

        def init_loop(loop: Loop | None, depth: int) -> None:
            if loop is not None:
                loop.depth = depth
                self.loops.append(loop)
            key = id(loop) if loop is not None else None
            for child in loop_map.get(key, []):
                init_loop(child, depth + 1)

        init_loop(None, -1)

        self.has_holes = False
        self.bound = Rect.empty()
        for loop in self.loops:
            if loop.sign() < 0:
                self.has_holes = True
            else:
                self.bound = self.bound.union(loop.bound)

    def num_loops(self) -> int:
        return len(self.loops)

    # --- containment -------------------------------------------------------

    def contains_point(self, p) -> bool:
        """XOR of loop containments (polygon.go:201-216)."""
        if len(self.loops) == 1:
            return self.loops[0].contains(p)
        if not self.bound.contains_point(p):
            return False
        inside = False
        for loop in self.loops:
            inside = inside != loop.contains(p)
            if inside and not self.has_holes:
                break
        return inside

    def contains_batch(self, points: np.ndarray) -> np.ndarray:
        """Vectorized XOR across loops (same kernel as Loop.contains_batch)."""
        if len(self.loops) == 1:
            return self.loops[0].contains_batch(points)
        inside = np.zeros(len(points), dtype=bool)
        for loop in self.loops:
            inside ^= loop.contains_batch(points)
        return inside

    # --- polygon relations -------------------------------------------------

    def any_loop_contains(self, b: Loop) -> bool:
        return any(loop.contains_loop(b) for loop in self.loops)

    def contains_or_crosses(self, b: Loop) -> int:
        """polygon.go:101-115."""
        inside = False
        for loop in self.loops:
            result = loop.contains_or_crosses(b)
            if result < 0:
                return -1
            if result > 0:
                inside = not inside
        return 1 if inside else 0

    def contains_all_shells(self, b: "Polygon") -> bool:
        return all(
            self.contains_or_crosses(loop) > 0
            for loop in b.loops
            if loop.sign() >= 0
        )

    def excludes_all_holes(self, b: "Polygon") -> bool:
        return all(
            self.contains_or_crosses(loop) == 0
            for loop in b.loops
            if loop.sign() < 0
        )

    def intersects_shell(self, b: Loop) -> bool:
        """polygon.go:164-179."""
        inside = False
        for loop in self.loops:
            if loop.contains_loop(b):
                inside = not inside
            elif not b.contains_loop(loop) and loop.intersects(b):
                return True
        return inside

    def intersects_any_shell(self, b: "Polygon") -> bool:
        return any(self.intersects_shell(loop) for loop in b.loops if loop.sign() >= 0)

    def contains_polygon(self, b: "Polygon") -> bool:
        """polygon.go:181-199."""
        if len(self.loops) == 1 and len(b.loops) == 1:
            return self.loops[0].contains_loop(b.loops[0])
        if not self.bound.contains_rect(b.bound):
            if not self.bound.lng.union(b.bound.lng).is_full():
                return False
        if not self.has_holes and not b.has_holes:
            return all(self.any_loop_contains(loop) for loop in b.loops)
        return self.contains_all_shells(b) and b.excludes_all_holes(self)

    def intersects_polygon(self, b: "Polygon") -> bool:
        """polygon.go:241-264."""
        if len(self.loops) == 1 and len(b.loops) == 1:
            return self.loops[0].intersects(b.loops[0])
        if not self.bound.intersects_rect(b.bound):
            return False
        if not self.has_holes and not b.has_holes:
            return any(l1.intersects(l2) for l1 in self.loops for l2 in b.loops)
        return self.intersects_any_shell(b) or b.intersects_any_shell(self)

    # --- Region contract ---------------------------------------------------

    def parent(self, k: int) -> int:
        """Index of loop k's parent in the nesting forest, -1 for top-level
        shells (polygon.go:341-351): scan left for the nearest loop with a
        strictly smaller depth."""
        depth = self.loops[k].depth
        if depth == 0:
            return -1
        k -= 1
        while k >= 0 and self.loops[k].depth >= depth:
            k -= 1
        return k

    def is_normalized(self) -> bool:
        """polygon.go:353-380: no child loop may share more than one vertex
        with its parent (boundary pairs must have been merged by the
        builder's undirected-xor assembly)."""
        last_parent: Loop | None = None
        vertices: set = set()
        for i, child in enumerate(self.loops):
            if child.depth == 0:
                continue
            par = self.loops[self.parent(i)]
            if par is not last_parent:
                vertices = set(par.vertices)
                last_parent = par
            count = sum(1 for v in child.vertices if v in vertices)
            if count > 1:
                return False
        return True

    def cap_bound(self):
        return self.bound.cap_bound()

    def rect_bound(self) -> Rect:
        return self.bound

    def contains_cell(self, cell) -> bool:
        """polygon.go:218-227."""
        if len(self.loops) == 1:
            return self.loops[0].contains_cell(cell)
        if not self.bound.contains_point(cell.center()):
            return False
        return self.contains_polygon(Polygon.from_cell(cell))

    def may_intersect_cell(self, cell) -> bool:
        """polygon.go:229-239."""
        if len(self.loops) == 1:
            return self.loops[0].may_intersect_cell(cell)
        if not self.bound.intersects_rect(cell.rect_bound()):
            return False
        return self.intersects_polygon(Polygon.from_cell(cell))

    def area(self) -> float:
        """Sum of signed loop areas (shells minus holes)."""
        total = 0.0
        for loop in self.loops:
            a = loop.area()
            total += a if loop.sign() > 0 else -a
        return total

    def __repr__(self) -> str:
        return f"Polygon({len(self.loops)} loops, holes={self.has_holes})"
