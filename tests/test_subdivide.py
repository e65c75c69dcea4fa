"""Port of TestSubdivide + CheckMinMaxAvg (reference s2/cell_test.go:312-460).

The Go test subdivides recursively with random sampling below level 5; here we
enumerate EVERY cell at levels 0..MAX_TEST_LEVEL deterministically (8190 cells)
and run the same checks:

  * child-geometry consistency: centers, areas, cellid arithmetic
    (cell_test.go:107-155)
  * containment lattice: parent contains child cell/center/vertices, siblings
    are disjoint (cell_test.go:157-183)
  * cap/rect bounds contain the cell's own center and vertices, and are tight
    enough to exclude >2 vertices of each sibling (cell_test.go:185-260)
  * per-level min/max/avg of area/width/edge/diag/angle-span vs. the Metric
    tables with the reference's sampling tolerance (cell_test.go:347-420 +
    CheckMinMaxAvg at :423-460), and the edge/diag aspect ceilings.
"""

import math

import numpy as np
import pytest

from gos2_spark.geometry import _vec as V
from gos2_spark.geometry.cell import Cell
from gos2_spark.geometry import metric as M
from gos2_spark.kernels import hilbert as H

MAX_TEST_LEVEL = 5
M_PI_2 = math.pi / 2


def _all_cells_at(level: int):
    """Every cell id at `level`, via ChildBeginAtLevel + Next arithmetic."""
    ids = []
    step = 1 << (2 * (30 - level) + 1)
    for face in range(6):
        face_id = np.array([(face << 61) | (1 << 60)], dtype=np.uint64)
        begin = int(H.child_begin_at_level(face_id, level)[0])
        ids.extend(range(begin, begin + 4 ** level * step, step))
    return ids


def _gather(cell: Cell):
    """GatherStats for one cell (cell_test.go:45-104). Returns a stats row."""
    exact = cell.exact_area()
    approx = cell.approx_area()
    vr = [np.asarray(cell.vertex_raw(k), dtype=float) for k in range(4)]
    er = [np.asarray(cell.edge_raw(k), dtype=float) for k in range(4)]
    edges, widths, diags, spans = [], [], [], []
    for i in range(4):
        edges.append(V.angle(vr[i], vr[(i + 1) & 3]))
        mid = vr[i] + vr[(i + 1) & 3]
        widths.append(M_PI_2 - V.angle(mid, er[i ^ 2]))
        if i < 2:
            diags.append(V.angle(vr[i], vr[i ^ 2]))
            spans.append(V.angle(er[i], -er[i ^ 2]))
    return dict(
        level=cell.level,
        exact=exact,
        approx=approx,
        min_edge=min(edges), max_edge=max(edges), avg_edge=sum(edges) / 4,
        min_width=min(widths), max_width=max(widths),
        min_diag=min(diags), max_diag=max(diags),
        min_span=min(spans), max_span=max(spans),
    )


@pytest.fixture(scope="module")
def level_stats():
    """Accumulated per-level stats over ALL cells at levels 0..MAX_TEST_LEVEL."""
    stats = [None] * (MAX_TEST_LEVEL + 1)
    for level in range(MAX_TEST_LEVEL + 1):
        rows = [_gather(Cell(cid)) for cid in _all_cells_at(level)]
        n = len(rows)
        assert n == 6 * 4 ** level
        stats[level] = dict(
            count=n,
            min_area=min(r["exact"] for r in rows),
            max_area=max(r["exact"] for r in rows),
            avg_area=sum(r["exact"] for r in rows) / n,
            min_width=min(r["min_width"] for r in rows),
            max_width=max(r["max_width"] for r in rows),
            avg_width=sum(0.5 * (r["min_width"] + r["max_width"]) for r in rows) / n,
            min_edge=min(r["min_edge"] for r in rows),
            max_edge=max(r["max_edge"] for r in rows),
            avg_edge=sum(r["avg_edge"] for r in rows) / n,
            max_edge_aspect=max(r["max_edge"] / r["min_edge"] for r in rows),
            min_diag=min(r["min_diag"] for r in rows),
            max_diag=max(r["max_diag"] for r in rows),
            avg_diag=sum(0.5 * (r["min_diag"] + r["max_diag"]) for r in rows) / n,
            max_diag_aspect=max(r["max_diag"] / r["min_diag"] for r in rows),
            min_span=min(r["min_span"] for r in rows),
            max_span=max(r["max_span"] for r in rows),
            avg_span=sum(0.5 * (r["min_span"] + r["max_span"]) for r in rows) / n,
            min_approx_ratio=min(r["approx"] / r["exact"] for r in rows),
            max_approx_ratio=max(r["approx"] / r["exact"] for r in rows),
        )
    return stats


def test_child_geometry_and_area_sums():
    """cell_test.go:115-155 + :283-309 — exhaustive at levels 0..3."""
    for level in range(4):
        for cid in _all_cells_at(level):
            cell = Cell(cid)
            children = cell.child_cells()
            child_ids = H.children_scalar(cid)
            exact = approx = avg = 0.0
            for child, expect_id in zip(children, child_ids):
                assert child.id == expect_id
                exact += child.exact_area()
                approx += child.approx_area()
                avg += child.average_area()
            assert abs(math.log(exact / cell.exact_area())) <= abs(math.log(1 + 1e-6))
            assert abs(math.log(approx / cell.approx_area())) <= abs(math.log(1.03))
            assert abs(math.log(avg / cell.average_area())) <= abs(math.log(1 + 1e-15))


def test_containment_lattice():
    """cell_test.go:157-183 — exhaustive at levels 0..3."""
    for level in range(4):
        for cid in _all_cells_at(level):
            cell = Cell(cid)
            children = cell.child_cells()
            for i, child in enumerate(children):
                assert cell.contains_cell(child)
                assert cell.may_intersect_cell(child)
                assert not child.contains_cell(cell)
                assert cell.contains_point(child.center_raw())
                for j in range(4):
                    assert cell.contains_point(child.vertex_raw(j))
                    if j != i:
                        assert not child.contains_point(children[j].center_raw())
                        assert not child.may_intersect_cell(children[j])


def test_bounds_contain_and_tight():
    """cell_test.go:185-260 — cap/rect bounds, exhaustive at levels 0..3."""
    for level in range(4):
        for cid in _all_cells_at(level):
            cell = Cell(cid)
            parent_cap = cell.cap_bound()
            parent_rect = cell.rect_bound()
            if cell.contains_point((0.0, 0.0, 1.0)) or cell.contains_point(
                (0.0, 0.0, -1.0)
            ):
                assert parent_rect.lng.is_full()
            children = cell.child_cells()
            for i, child in enumerate(children):
                child_cap = child.cap_bound()
                child_rect = child.rect_bound()
                assert child_cap.contains_point(child.center())
                assert child_rect.contains_point(child.center_raw())
                assert parent_cap.contains_point(child.center())
                assert parent_rect.contains_point(child.center_raw())
                for j in range(4):
                    v = child.vertex(j)
                    assert child_cap.contains_point(v)
                    assert child_rect.contains_point(v)
                    assert child_rect.contains_point(child.vertex_raw(j))
                    assert parent_cap.contains_point(v)
                    assert parent_rect.contains_point(v)
                    assert parent_rect.contains_point(child.vertex_raw(j))
                for j in range(4):
                    if j == i:
                        continue
                    # Bounds must exclude >= 2 vertices of each sibling.
                    cap_count = sum(
                        child_cap.contains_point(children[j].vertex(k))
                        for k in range(4)
                    )
                    rect_count = sum(
                        child_rect.contains_point(children[j].vertex_raw(k))
                        for k in range(4)
                    )
                    assert cap_count <= 2
                    if child_rect.lat.lo > -M_PI_2 and child_rect.lat.hi < M_PI_2:
                        assert rect_count <= 2


def _check_min_max_avg(
    label, level, stats, abs_error, min_v, max_v, avg_v, min_m, max_m, avg_m
):
    """CheckMinMaxAvg (cell_test.go:423-460)."""
    count = stats["count"]
    shift = 1 << level
    tolerance = max_m.value(level) - min_m.value(level)
    tolerance /= math.sqrt(min(count, 0.5 * shift))
    if tolerance == 0:
        tolerance = abs_error
    assert min_m.value(level) <= min_v + abs_error, label
    assert min_m.value(level) >= min_v - tolerance, label
    assert max_m.value(level) >= max_v - abs_error, label
    assert max_m.value(level) <= max_v + tolerance, label
    assert abs(avg_m.value(level) - avg_v) <= 10 * tolerance, label


def test_level_stats_vs_metric_tables(level_stats):
    """cell_test.go:347-420 — every level 0..MAX_TEST_LEVEL is fully sampled,
    so min/max bounds are exact up to float error."""
    for level in range(MAX_TEST_LEVEL + 1):
        s = level_stats[level]
        _check_min_max_avg(
            "area", level, s, 1e-15 * s["min_width"],
            s["min_area"], s["max_area"], s["avg_area"],
            M.MIN_AREA, M.MAX_AREA, M.AVG_AREA,
        )
        _check_min_max_avg(
            "width", level, s, 1e-15,
            s["min_width"], s["max_width"], s["avg_width"],
            M.MIN_WIDTH, M.MAX_WIDTH, M.AVG_WIDTH,
        )
        _check_min_max_avg(
            "edge", level, s, 1e-15,
            s["min_edge"], s["max_edge"], s["avg_edge"],
            M.MIN_EDGE, M.MAX_EDGE, M.AVG_EDGE,
        )
        _check_min_max_avg(
            "diagonal", level, s, 1e-15,
            s["min_diag"], s["max_diag"], s["avg_diag"],
            M.MIN_DIAG, M.MAX_DIAG, M.AVG_DIAG,
        )
        _check_min_max_avg(
            "angle span", level, s, 1e-15,
            s["min_span"], s["max_span"], s["avg_span"],
            M.MIN_ANGLE_SPAN, M.MAX_ANGLE_SPAN, M.AVG_ANGLE_SPAN,
        )
        shift = 1 << level
        assert s["max_edge_aspect"] <= M.MAX_EDGE_ASPECT + 1e-15 * shift
        assert s["max_diag_aspect"] <= M.MAX_DIAG_ASPECT + 1e-15 * shift


def test_approx_area_ratio(level_stats):
    """ApproxArea accurate within a few percent once level >= 2
    (cell.go:66-88 contract)."""
    for level in range(2, MAX_TEST_LEVEL + 1):
        s = level_stats[level]
        assert s["min_approx_ratio"] > 0.97
        assert s["max_approx_ratio"] < 1.03
