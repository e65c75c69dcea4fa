"""Edge coverings + sorted cell-keyed edge index (quadtree substitute).

Driver/executor-side helper mirroring /root/reference/s2/edgeindex.go: edges
are covered by cells (EdgeCovering:256-317), inserted into a sorted
(cell_id, edge_id) array, and candidate crossings for a query edge come from
parent-cell lookups plus a range scan over descendants with the 16-edge
rewind heuristic (FindCandidateCrossings:115-206). The guarantee the
reference tests (edgeindex_test.go:37-68): candidates ⊇ true crossings.

At engine scale this same structure IS the edge table of a polygon set
sorted by cell token; this in-memory form serves polygon assembly, loop
validity checks, and small-N parity tests.
"""

from __future__ import annotations

import math

import numpy as np

from ..geometry import _vec as V
from ..geometry.cell import Cell
from ..geometry.metric import MIN_WIDTH
from ..kernels import hilbert as H
from ..kernels import projection as PJ

MAX_LEVEL = 30
_SENTINEL = (1 << 64) - 1
ALWAYS_RECURSE_ON_CHILDREN = False


def _cellid_from_point(p) -> int:
    return int(PJ.cellid_from_xyz(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))[0])


def _immediate_parent(cid: int) -> int:
    nlsb = (cid & -cid) << 2
    return (cid & ~(nlsb - 1)) | nlsb


def containing_cell2(pa, pb) -> int:
    """Smallest cell containing both points, Sentinel across faces
    (edgeindex.go:242-254)."""
    a, b = _cellid_from_point(pa), _cellid_from_point(pb)
    if a >> 61 != b >> 61:
        return _SENTINEL
    while a != b:
        a, b = _immediate_parent(a), _immediate_parent(b)
    return a


def containing_cell4(pa, pb, pc, pd) -> int:
    """edgeindex.go:224-240."""
    ids = [_cellid_from_point(p) for p in (pa, pb, pc, pd)]
    if len({c >> 61 for c in ids}) != 1:
        return _SENTINEL
    a, b, c, d = ids
    while not (a == b == c == d):
        a, b, c, d = (_immediate_parent(x) for x in (a, b, c, d))
    return a


def edge_covering(a, b, thicken_edge: bool) -> tuple[list[int], int]:
    """Cover one edge (edgeindex.go:256-317). Returns (cells, level)."""
    THICKENING = 0.01
    edge_length = V.angle(a, b)
    ideal_level = MIN_WIDTH.max_level(edge_length * (1 + 2 * THICKENING))
    if not thicken_edge:
        containing = containing_cell2(a, b)
    else:
        if ideal_level == MAX_LEVEL:
            # tiny edge: force the 'needs covering' path (edgeindex.go:278-283)
            containing = int(H.parent(np.array([0xFFF0], dtype=np.uint64), 3)[0])
        else:
            pq = V.mul(V.sub(b, a), THICKENING)
            ortho = V.mul(V.normalize(V.cross(pq, a)), edge_length * THICKENING)
            p = V.sub(a, pq)
            q = V.add(b, pq)
            containing = containing_cell4(
                V.sub(p, ortho), V.add(p, ortho), V.sub(q, ortho), V.add(q, ortho)
            )
    if containing != _SENTINEL and H.level_scalar(containing) >= ideal_level - 2:
        return [containing], H.level_scalar(containing)
    if ideal_level == 0:
        # whole sphere: all 6 faces
        return [(f << 61) | (1 << 60) for f in range(6)], 0
    middle = V.normalize(V.mul(V.add(a, b), 0.5))
    actual_level = min(ideal_level, MAX_LEVEL - 1)
    cells = PJ.vertex_neighbors(_cellid_from_point(middle), actual_level)
    return cells, actual_level


def lenient_crossing(a, b, c, d) -> bool:
    """Tolerant crossing for covering recursion (edgeindex.go:391-407)."""
    MAX_DET = 1e-14
    acb = V.dot(V.cross(a, c), b)
    bda = V.dot(V.cross(b, d), a)
    if abs(acb) < MAX_DET or abs(bda) < MAX_DET:
        return True
    if acb * bda < 0:
        return False
    cbd = V.dot(V.cross(c, b), d)
    dac = V.dot(V.cross(d, a), c)
    if abs(cbd) < MAX_DET or abs(dac) < MAX_DET:
        return True
    return acb * cbd >= 0 and acb * dac >= 0


def edge_intersects_cell_boundary(a, b, cell: Cell) -> bool:
    """edgeindex.go:409-421."""
    verts = [cell.vertex(k) for k in range(4)]
    for i in range(4):
        if lenient_crossing(a, b, verts[i], verts[(i + 1) % 4]):
            return True
    return False


class EdgeIndex:
    """Sorted (cell_id, edge_id) multimap over an edge list.

    Mirrors the reference's lazy build with a query-count cost model
    (PredictAdditionalCalls, edgeindex.go:319-326): callers iterate
    candidates brute-force until >100 edges and >30 queries.
    """

    def __init__(self, edges: list[tuple]):
        """edges: list of (a_xyz, b_xyz) tuples."""
        self.edges = edges
        self.computed = False
        self.query_count = 0
        self.min_level_used = MAX_LEVEL
        self._cells: np.ndarray | None = None
        self._edge_ids: np.ndarray | None = None

    def num_edges(self) -> int:
        return len(self.edges)

    def compute_index(self) -> None:
        """edgeindex.go:208-220 (cover every edge thickened, sort)."""
        cells: list[int] = []
        ids: list[int] = []
        for i, (a, b) in enumerate(self.edges):
            cover, level = edge_covering(a, b, True)
            self.min_level_used = min(self.min_level_used, level)
            for cid in cover:
                cells.append(cid)
                ids.append(i)
        order = np.lexsort((np.array(ids), np.array(cells, dtype=np.uint64)))
        self._cells = np.array(cells, dtype=np.uint64)[order]
        self._edge_ids = np.array(ids, dtype=np.int64)[order]
        self.computed = True

    def predict_additional_calls(self, n: int) -> None:
        if self.computed:
            return
        if self.num_edges() > 100 and self.query_count + n > 30:
            self.compute_index()

    def candidate_crossings(self, a, b) -> list[int]:
        """FindCandidateCrossings (edgeindex.go:115-128): parents +
        descendants of the query edge's covering; superset of true crossings."""
        assert self.computed
        cover, _ = edge_covering(a, b, False)
        out: set[int] = set()
        self._edges_in_parent_cells(cover, out)
        self._edges_in_children_cells(a, b, list(cover), out)
        return sorted(out)

    def _lower_bound(self, cid: int) -> int:
        return int(np.searchsorted(self._cells, np.uint64(cid), side="left"))

    def _upper_bound(self, cid: int) -> int:
        return int(np.searchsorted(self._cells, np.uint64(cid), side="right"))

    def _edges_in_parent_cells(self, cover: list[int], out: set[int]) -> None:
        """edgeindex.go:130-152."""
        parent_cells: set[int] = set()
        for cid in cover:
            for level in range(H.level_scalar(cid) - 1, self.min_level_used - 1, -1):
                p = int(H.parent(np.array([cid], dtype=np.uint64), level)[0])
                if p in parent_cells:
                    break
                parent_cells.add(p)
        for p in parent_cells:
            i = self._lower_bound(p)
            while i < len(self._cells) and int(self._cells[i]) == p:
                out.add(int(self._edge_ids[i]))
                i += 1

    def _edges_in_children_cells(self, a, b, cover: list[int], out: set[int]) -> None:
        """edgeindex.go:153-206 (range scan + 16-edge rewind heuristic)."""
        while cover:
            cid = cover.pop()
            lsb = cid & -cid
            start = self._lower_bound(cid - (lsb - 1))
            end = self._upper_bound(cid + (lsb - 1))
            rewind = ALWAYS_RECURSE_ON_CHILDREN
            added: list[int] = []
            if not rewind:
                for it in range(start, end):
                    added.append(int(self._edge_ids[it]))
                    if len(added) == 16 and lsb != 1:
                        rewind = True
                        break
            if not rewind:
                out.update(added)
                continue
            # uninsert, take the cell's own entries, recurse on children
            i = self._lower_bound(cid)
            j = self._upper_bound(cid)
            for it in range(i, j):
                out.add(int(self._edge_ids[it]))
            if i != start or j != end:
                cell = Cell(cid)
                for child_id in cell.children():
                    if edge_intersects_cell_boundary(a, b, Cell(child_id)):
                        cover.append(child_id)

    def iter_candidates(self, a, b) -> list[int]:
        """EdgeIndexIterator.GetCandidates semantics (edgeindex.go:349-364):
        brute force (all edge ids) until the cost model builds the index."""
        self.predict_additional_calls(1)
        if not self.computed:
            self.query_count += 1
            return list(range(self.num_edges()))
        return self.candidate_crossings(a, b)
