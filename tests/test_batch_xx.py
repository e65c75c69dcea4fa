"""Raster suite depth — zonal overlay cross-tab, grid viewshed,
Zevenbergen-Thorne curvature — against Python references."""

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _elev(r, c):
    return ((r + 100) * 1299721 + (c + 100) * 7919) * 48271 % 1000003 % 4000


def _cells():
    rows = duckdb.sql(
        f"SELECT event_id FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    cnt = Counter()
    for (eid,) in rows:
        lat = -60.0 + (eid * 11 % 120) + (eid % 83) / 83.0
        lng = -170.0 + (eid * 17 % 340) + (eid % 79) / 79.0
        cnt[(int(math.floor(lat / 2.0)), int(math.floor(lng / 2.0)))] += 1
    return cnt


def test_zonal_overlay_matches_brute(spark):
    cnt = _cells()
    tab = defaultdict(lambda: [0, 0])
    for (r, c), n in cnt.items():
        key = (_elev(r, c) // 1000, len(str(n)))
        tab[key][0] += 1
        tab[key][1] += n
    got = {
        (row["elev_class"], row["density_class"]): row
        for row in entry.queries()["zonal_overlay"](spark, SF_DIR).collect()
    }
    assert set(got) == set(tab)
    for key, (nc, ne) in tab.items():
        assert got[key]["n_cells"] == nc
        assert got[key]["n_events"] == ne
    assert sum(v[1] for v in tab.values()) == sum(cnt.values())


def test_viewshed_matches_brute(spark):
    cnt = _cells()
    e0 = _elev(0, 0) + 100
    got = {
        (row["r"], row["c"]): row
        for row in entry.queries()["viewshed_grid"](spark, SF_DIR).collect()
    }
    expect = {rc for rc in cnt if rc != (0, 0)}
    assert set(got) == expect
    n_vis = 0
    for (r, c) in expect:
        d = max(abs(r), abs(c))
        tan_t = (_elev(r, c) - e0) / d
        row = got[(r, c)]
        assert row["d"] == d
        assert abs(row["target_tan"] - tan_t) < 1e-6
        if d <= 1:
            assert row["visible"]
        else:
            mb = max(
                (
                    _elev(
                        int(math.floor(r * t / d + 0.5)),
                        int(math.floor(c * t / d + 0.5)),
                    )
                    - e0
                )
                / t
                for t in range(1, d)
            )
            assert abs(row["max_block_tan"] - mb) < 1e-6
            assert row["visible"] == (tan_t > mb)
        if row["visible"]:
            n_vis += 1
    # a rough random surface occludes most but not all distant cells
    assert 0 < n_vis < len(expect)


def test_curvature_matches_brute(spark):
    cnt = _cells()
    got = {
        (row["r"], row["c"]): row
        for row in entry.queries()["terrain_curvature"](spark, SF_DIR).collect()
    }
    assert set(got) == set(cnt)
    for (r, c) in cnt:
        zxx = _elev(r, c + 1) - 2 * _elev(r, c) + _elev(r, c - 1)
        zyy = _elev(r + 1, c) - 2 * _elev(r, c) + _elev(r - 1, c)
        zxy = (
            _elev(r + 1, c + 1)
            - _elev(r + 1, c - 1)
            - _elev(r - 1, c + 1)
            + _elev(r - 1, c - 1)
        ) / 4.0
        row = got[(r, c)]
        assert row["zxx"] == zxx
        assert row["zyy"] == zyy
        assert abs(row["zxy"] - zxy) < 1e-9
        assert row["curvature"] == -2 * (zxx + zyy)
