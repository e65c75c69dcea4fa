"""RegionCoverer + CellUnion invariants (ported from regioncoverer_test.go /
cellunion_test.go — same invariants, numpy RNG with fixed seeds)."""

import math

import numpy as np
import pytest

from gos2_spark.cover import CellUnion, RegionCoverer, simple_covering
from gos2_spark.geometry import Cap, Cell, Loop, Rect
from gos2_spark.geometry.metric import AVG_AREA
from gos2_spark.kernels import hilbert as H
from gos2_spark.kernels import projection as PJ


def check_covering(coverer: RegionCoverer, region, covering, interior=False):
    """Port of CheckCovering (regioncoverer_test.go:102-141)."""
    min_level_cells = {}
    for cid in covering:
        level = int(H.level(np.array([cid], dtype=np.uint64))[0])
        assert level >= coverer.min_level
        assert level <= coverer.max_level
        assert (level - coverer.min_level) % coverer.level_mod == 0
        par = int(H.parent(np.array([cid], dtype=np.uint64), coverer.min_level)[0])
        min_level_cells[par] = min_level_cells.get(par, 0) + 1
    if len(covering) > coverer.max_cells:
        for v in min_level_cells.values():
            assert v == 1, "covering not minimal: 4 siblings present"
    if interior:
        for cid in covering:
            assert region.contains_cell(Cell(cid))
    else:
        cu = CellUnion(covering)
        for face in range(6):
            check_complete_covering(region, cu, True, (face << 61) | (1 << 60))


def check_complete_covering(region, covering: CellUnion, check_tight, cid):
    """Port of CheckCompleteCovering (regioncoverer_test.go:68-100)."""
    cell = Cell(cid)
    if not region.may_intersect_cell(cell):
        if check_tight:
            assert not covering.intersects_cellid(cid)
    elif not covering.contains_cellid(cid):
        assert not region.contains_cell(cell)
        assert not H.is_leaf(np.array([cid], dtype=np.uint64))[0]
        for child in H.children(np.array([cid], dtype=np.uint64))[0]:
            check_complete_covering(region, covering, check_tight, int(child))


def random_point(rng):
    v = rng.normal(size=3)
    return tuple(v / np.linalg.norm(v))


def random_cap(rng, min_area, max_area):
    cap_area = max_area * (min_area / max_area) ** rng.random()
    return Cap(random_point(rng), cap_area / (2 * math.pi))


def test_random_caps():
    # regioncoverer_test.go:143-186 (fewer iterations: same invariants)
    rng = np.random.default_rng(4)
    for _ in range(60):
        while True:
            min_level = int(rng.integers(0, 31))
            max_level = int(rng.integers(0, 31))
            if min_level <= max_level:
                break
        max_cells = int(np.clip(rng.geometric(0.2), 1, 20))
        level_mod = int(rng.integers(1, 4))
        coverer = RegionCoverer(min_level, max_level, level_mod, max_cells)
        max_area = min(4 * math.pi, (3 * max_cells + 1) * AVG_AREA.value(min_level))
        cap = random_cap(rng, 0.1 * AVG_AREA.value(30), max_area)
        covering = coverer.covering(cap)
        check_covering(coverer, cap, covering, False)
        # determinism (regioncoverer_test.go:160-171)
        covering2 = RegionCoverer(min_level, max_level, level_mod, max_cells).covering(cap)
        assert covering == covering2
        denorm = CellUnion(covering).denormalize(min_level, level_mod)
        check_covering(coverer, cap, denorm, False)


def test_random_cells_self_covering():
    # regioncoverer_test.go:199-213: a cell's covering is exactly itself.
    rng = np.random.default_rng(4)
    coverer = RegionCoverer(max_cells=1)
    for _ in range(300):
        raw = int(rng.integers(0, 2**63, dtype=np.int64)) * 2 + 1
        cid = np.uint64(raw % (6 << 61))
        lvl = int(rng.integers(0, 31))
        cid = int(H.parent(np.array([cid], dtype=np.uint64), lvl)[0])
        if not H.is_valid(np.array([cid], dtype=np.uint64))[0]:
            continue
        covering = coverer.covering(Cell(cid))
        assert len(covering) == 1
        assert covering[0] == cid


def test_simple_covering():
    rng = np.random.default_rng(4)
    for _ in range(30):
        level = int(rng.integers(0, 18))
        coverer = RegionCoverer(level, level, 1, 10**9)
        max_area = min(4 * math.pi, 1000 * AVG_AREA.value(level))
        cap = random_cap(rng, 0.1 * AVG_AREA.value(30), max_area)
        covering = simple_covering(cap, cap.center, level)
        check_covering(coverer, cap, covering, False)


def test_cellunion_normalize_pittsburgh():
    # cellunion_test.go:8-35: 8 cells in -> 2 out (4 siblings collapse, dup
    # and contained cells drop).
    base = int(PJ.cellid_from_latlng(np.array([40.4406]), np.array([-79.9959]))[0])
    parent10 = int(H.parent(np.array([base], dtype=np.uint64), 10)[0])
    kids = [int(k) for k in H.children(np.array([parent10], dtype=np.uint64))[0]]
    other = int(H.parent(np.array([base], dtype=np.uint64), 8)[0])
    # all four children + parent's sibling + a duplicate + a contained leaf
    cu = CellUnion(kids + [kids[0], base, other])
    # 4 siblings -> parent10; parent10 and base are inside other=parent8
    assert cu.ids == [other]


def test_cellunion_contains_batch_matches_scalar():
    loop = Loop.regular(40.0, -74.0, 3.0, 12)
    cov = RegionCoverer(max_cells=16).cell_union_covering(loop)
    rng = np.random.default_rng(42)
    lat = 40.0 + rng.uniform(-6, 6, 500)
    lng = -74.0 + rng.uniform(-6, 6, 500)
    leaves = PJ.cellid_from_latlng(lat, lng)
    batch = cov.contains_batch(leaves)
    scalar = np.array([cov.contains_cellid(int(c)) for c in leaves])
    assert (batch == scalar).all()


def test_covering_rect_and_loop_regions():
    coverer = RegionCoverer(max_cells=8)
    rect = Rect.from_degrees(30.0, -80.0, 45.0, -60.0)
    cov = coverer.covering(rect)
    assert 1 <= len(cov) <= 8
    check_covering(coverer, rect, cov, False)

    loop = Loop.regular(40.0, -74.0, 5.0, 32)
    cov = coverer.covering(loop)
    assert 1 <= len(cov) <= 8
    check_covering(coverer, loop, cov, False)

    # interior coverings need a bounded max_level: near the cell budget the
    # frontier of boundary cells would otherwise be refined toward level 30
    # (same behavior as the reference algorithm)
    icov = RegionCoverer(max_cells=8, max_level=12)
    interior = icov.interior_covering(loop)
    check_covering(icov, loop, interior, True)


def test_covering_denormalize_min_level():
    cap = Cap.from_latlng_deg(10.0, 10.0, 0.1)
    coverer = RegionCoverer(min_level=8, max_level=12, max_cells=8)
    cov = coverer.covering(cap)
    levels = H.level(np.array(cov, dtype=np.uint64))
    assert (levels >= 8).all() and (levels <= 12).all()
