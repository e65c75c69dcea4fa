"""TestLoopRelations2 port (loop_test.go:462-532): loops assembled from
the XOR-union of cell boundaries over Hilbert ranges must have
containment/intersection relations EQUAL to the interval algebra on the
underlying id ranges — a randomized end-to-end check of cell vertices,
loop construction, and loop-pair relations together."""

import numpy as np
import pytest

from gos2_spark.geometry import Loop
from gos2_spark.geometry.cell import Cell
from gos2_spark.kernels import hilbert as H


def _skewed(rng, max_log: int) -> int:
    base = int(rng.integers(0, max_log + 1))
    return int(rng.integers(0, 1 << 31)) & ((1 << base) - 1)


def _advance(cid: int, n: int) -> int:
    return int(H.advance(np.array([cid], dtype=np.uint64), n)[0])


def make_cell_loop(begin: int, end: int) -> Loop | None:
    """loop_test.go:494-532: XOR duplicate directed edges of every cell in
    [begin, end), then walk the remaining boundary chain."""
    edges: dict[tuple, dict[tuple, bool]] = {}
    cid = begin
    while cid != end:
        cell = Cell(cid)
        for k in range(4):
            a = cell.vertex(k)
            b = cell.vertex((k + 1) & 3)
            if a not in edges.get(b, {}):
                edges.setdefault(a, {})[b] = True
            if b in edges and a in edges[b]:
                del edges[b][a]
                if not edges[b]:
                    del edges[b]
        cid = int(H.next_cell(np.array([cid], dtype=np.uint64))[0])
    if not edges:
        return None
    vertices = []
    p = next(iter(edges))
    while edges:
        if len(edges[p]) != 1:
            return None  # disconnected boundary (range straddles a face seam)
        nxt = next(iter(edges[p]))
        vertices.append(p)
        del edges[p]
        p = nxt
    return Loop(vertices)


@pytest.mark.parametrize("seed", [4, 17])
def test_cell_loop_relations_match_interval_algebra(seed):
    rng = np.random.default_rng(seed)
    checked = 0
    for _ in range(400):
        raw = int(rng.integers(0, 1 << 63, dtype=np.uint64)) | 1
        u = np.array([raw], dtype=np.uint64)
        if not bool(H.is_valid(u)[0]):
            continue
        begin = int(H.parent(u, int(rng.integers(0, H.MAX_LEVEL)))[0])
        a_begin = _advance(begin, _skewed(rng, 6))
        a_end = _advance(a_begin, _skewed(rng, 6) + 1)
        b_begin = _advance(begin, _skewed(rng, 6))
        b_end = _advance(b_begin, _skewed(rng, 6) + 1)
        if not bool(H.is_valid(np.array([a_end], dtype=np.uint64))[0]):
            continue
        if not bool(H.is_valid(np.array([b_end], dtype=np.uint64))[0]):
            continue
        a = make_cell_loop(a_begin, a_end)
        b = make_cell_loop(b_begin, b_end)
        if a is None or b is None:
            continue
        contained = a_begin <= b_begin and b_end <= a_end
        intersects = a_begin < b_end and b_begin < a_end
        assert a.contains_loop(b) == contained, (hex(a_begin), hex(a_end), hex(b_begin), hex(b_end))
        assert a.intersects(b) == intersects, (hex(a_begin), hex(a_end), hex(b_begin), hex(b_end))
        checked += 1
    assert checked > 150  # the skip paths must not eat the test
