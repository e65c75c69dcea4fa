"""RegionCoverer: best-first cell covering of a region.

Algorithm-identical port of /root/reference/s2/regioncoverer.go including the
integer-packed priority (regioncoverer.go:164-175), the 4-cell seeded start
(178-210), and the parent-over-4-terminal-children optimization (153-163).
Runs once per query region / polygon tile on the driver; the resulting
CellUnion is broadcast as the build side of the spatial join.

Determinism: the priority heap uses (negated priority, insertion counter) so
equal-priority candidates pop FIFO — self-deterministic across runs (the
property the reference's own determinism test checks,
regioncoverer_test.go:160-171).
"""

from __future__ import annotations

import heapq

import numpy as np

from ..geometry.cell import Cell
from ..geometry.metric import MIN_WIDTH
from ..kernels import projection as PJ
from .cellunion import CellUnion

MAX_LEVEL = 30
DEFAULT_MAX_CELLS = 8


class _Candidate:
    __slots__ = ("cell", "is_terminal", "children")

    def __init__(self, cell: Cell, is_terminal: bool):
        self.cell = cell
        self.is_terminal = is_terminal
        self.children: list["_Candidate"] = []


class RegionCoverer:
    def __init__(
        self,
        min_level: int = 0,
        max_level: int = MAX_LEVEL,
        level_mod: int = 1,
        max_cells: int = DEFAULT_MAX_CELLS,
    ):
        self.min_level = max(0, min(MAX_LEVEL, min_level))
        self.max_level = max(0, min(MAX_LEVEL, max_level))
        self.level_mod = max(1, min(3, level_mod))
        self.max_cells = max_cells
        self._result: list[int] = []
        self._pq: list[tuple[int, int, _Candidate]] = []
        self._counter = 0
        self._region = None
        self._interior = False

    def _max_children_shift(self) -> int:
        return 2 * self.level_mod

    def _new_candidate(self, cell: Cell) -> _Candidate | None:
        """regioncoverer.go:70-96."""
        if not self._region.may_intersect_cell(cell):
            return None
        is_terminal = False
        lvl = cell.level
        if lvl >= self.min_level:
            if self._interior:
                if self._region.contains_cell(cell):
                    is_terminal = True
                elif lvl + self.level_mod > self.max_level:
                    return None
            else:
                if lvl + self.level_mod > self.max_level or self._region.contains_cell(cell):
                    is_terminal = True
        return _Candidate(cell, is_terminal)

    def _expand_children(self, candidate: _Candidate, cell: Cell, num_levels: int) -> int:
        """regioncoverer.go:98-119."""
        num_levels -= 1
        num_terminals = 0
        for child_id in cell.children():
            c = Cell(child_id)
            if num_levels > 0:
                if self._region.may_intersect_cell(c):
                    num_terminals += self._expand_children(candidate, c, num_levels)
                continue
            child = self._new_candidate(c)
            if child is not None:
                candidate.children.append(child)
                if child.is_terminal:
                    num_terminals += 1
        return num_terminals

    def _add_candidate(self, candidate: _Candidate | None) -> None:
        """regioncoverer.go:128-176."""
        if candidate is None:
            return
        if candidate.is_terminal:
            self._result.append(candidate.cell.id)
            return
        level = candidate.cell.level
        num_levels = 1 if level < self.min_level else self.level_mod
        num_terminals = self._expand_children(candidate, candidate.cell, num_levels)
        shift = self._max_children_shift()
        num_children = len(candidate.children)
        if num_children == 0:
            return
        if (
            not self._interior
            and num_terminals == 1 << shift
            and level >= self.min_level
        ):
            # parent instead of 4 terminal children (regioncoverer.go:153-163)
            candidate.is_terminal = True
            self._add_candidate(candidate)
        else:
            priority = -((((level << shift) + num_children) << shift) + num_terminals)
            self._counter += 1
            heapq.heappush(self._pq, (-priority, self._counter, candidate))

    def _initial_candidates(self) -> None:
        """regioncoverer.go:178-210."""
        if self.max_cells >= 4:
            cap = self._region.cap_bound()
            level = min(
                MIN_WIDTH.max_level(2 * cap.radius()),
                min(self.max_level, MAX_LEVEL - 1),
            )
            if self.level_mod > 1 and level > self.min_level:
                level -= (level - self.min_level) % self.level_mod
            if level > 0:
                cid = int(
                    PJ.cellid_from_xyz(
                        np.array([cap.center[0]]),
                        np.array([cap.center[1]]),
                        np.array([cap.center[2]]),
                    )[0]
                )
                for nbr in PJ.vertex_neighbors(cid, level):
                    self._add_candidate(self._new_candidate(Cell(nbr)))
                return
        for face in range(6):
            self._add_candidate(self._new_candidate(Cell((face << 61) | (1 << 60))))

    def _covering_internal(self, region) -> None:
        """Main best-first loop (regioncoverer.go:212-257)."""
        self._region = region
        self._result = []
        self._pq = []
        self._counter = 0

        self._initial_candidates()
        while self._pq and (not self._interior or len(self._result) < self.max_cells):
            _, _, candidate = heapq.heappop(self._pq)
            num_children = len(candidate.children)
            count = 0 if self._interior else len(self._pq)
            if (
                candidate.cell.level < self.min_level
                or num_children == 1
                or len(self._result) + num_children + count <= self.max_cells
            ):
                for child in candidate.children:
                    self._add_candidate(child)
            elif self._interior:
                pass  # drop
            else:
                candidate.is_terminal = True
                candidate.children = []
                self._add_candidate(candidate)
        self._pq = []
        self._region = None

    def cell_union_covering(self, region) -> CellUnion:
        """regioncoverer.go:272-278 (normalized covering)."""
        self._interior = False
        self._covering_internal(region)
        return CellUnion(self._result)

    def covering(self, region) -> list[int]:
        """Covering denormalized to minLevel/levelMod (regioncoverer.go:259-270)."""
        cu = self.cell_union_covering(region)
        return cu.denormalize(self.min_level, self.level_mod)

    def interior_covering(self, region) -> list[int]:
        """Cells fully contained in the region."""
        self._interior = True
        self._covering_internal(region)
        cu = CellUnion(self._result)
        self._interior = False
        return cu.denormalize(self.min_level, self.level_mod)


def flood_fill(region, start: int) -> list[int]:
    """BFS same-level covering from a seed cell (regioncoverer.go:280-303)."""
    seen = {start}
    frontier = [start]
    output = []
    while frontier:
        cid = frontier.pop()
        if not region.may_intersect_cell(Cell(cid)):
            continue
        output.append(cid)
        for nbr in PJ.edge_neighbors(np.array([cid], dtype=np.uint64))[0]:
            nbr = int(nbr)
            if nbr not in seen:
                seen.add(nbr)
                frontier.append(nbr)
    return output


def simple_covering(region, start_xyz, level: int) -> list[int]:
    """regioncoverer.go:305-307."""
    from ..kernels import hilbert as H

    cid = int(
        PJ.cellid_from_xyz(
            np.array([start_xyz[0]]), np.array([start_xyz[1]]), np.array([start_xyz[2]])
        )[0]
    )
    start = int(H.parent(np.array([cid], dtype=np.uint64), level)[0])
    return flood_fill(region, start)
