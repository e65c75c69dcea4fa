"""Square-grid raster batch — Horn slope/aspect, hillshade, D8 flow
direction over the deterministic hash-elevation surface — checked
against a straight-line numpy-free Python reference."""

import math

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

SQRT2 = 1.4142135623730951
DIRS = [
    (0, 0, 1), (1, 1, 1), (2, 1, 0), (3, 1, -1),
    (4, 0, -1), (5, -1, -1), (6, -1, 0), (7, -1, 1),
]


def _elev(r, c):
    return ((r + 100) * 1299721 + (c + 100) * 7919) * 48271 % 1000003 % 4000


def _occ():
    rows = duckdb.sql(
        f"SELECT event_id FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    occ = set()
    for (eid,) in rows:
        lat = -60.0 + (eid * 11 % 120) + (eid % 83) / 83.0
        lng = -170.0 + (eid * 17 % 340) + (eid % 79) / 79.0
        occ.add((int(math.floor(lat / 2.0)), int(math.floor(lng / 2.0))))
    return sorted(occ)


def _gradients(r, c):
    z = {(dr, dc): _elev(r + dr, c + dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)}
    a, b, cc = z[(1, -1)], z[(1, 0)], z[(1, 1)]
    d, f = z[(0, -1)], z[(0, 1)]
    g, h, i = z[(-1, -1)], z[(-1, 0)], z[(-1, 1)]
    dzdx = ((cc + 2 * f + i) - (a + 2 * d + g)) / 8.0
    dzdy = ((g + 2 * h + i) - (a + 2 * b + cc)) / 8.0
    return dzdx, dzdy


def test_horn_slope_aspect_matches_brute(spark):
    got = {
        (r["r"], r["c"]): r
        for r in entry.queries()["horn_slope_aspect"](spark, SF_DIR).collect()
    }
    occ = _occ()
    assert set(got) == set(occ)
    for r, c in occ:
        dzdx, dzdy = _gradients(r, c)
        row = got[(r, c)]
        assert row["elev"] == _elev(r, c)
        assert abs(row["slope_rad"] - math.atan(math.hypot(dzdx, dzdy))) < 1e-8
        assert abs(row["aspect_rad"] - math.atan2(dzdy, -dzdx)) < 1e-8


def test_hillshade_matches_brute(spark):
    zen = math.radians(45)
    az = math.radians(315)
    got = {
        (r["r"], r["c"]): r
        for r in entry.queries()["hillshade_grid"](spark, SF_DIR).collect()
    }
    for r, c in _occ():
        dzdx, dzdy = _gradients(r, c)
        slope = math.atan(math.hypot(dzdx, dzdy))
        aspect = math.atan2(dzdy, -dzdx)
        s = max(
            0.0,
            math.cos(zen) * math.cos(slope)
            + math.sin(zen) * math.sin(slope) * math.cos(az - aspect),
        )
        row = got[(r, c)]
        assert row["shade"] == int(math.floor(255.0 * s))
        assert abs(row["shade_f"] - 255.0 * s) < 1e-7
        assert 0 <= row["shade"] <= 255


def test_d8_matches_brute(spark):
    got = {
        (r["r"], r["c"]): r
        for r in entry.queries()["flow_direction_d8"](spark, SF_DIR).collect()
    }
    n_sinks = 0
    for r, c in _occ():
        e0 = _elev(r, c)
        drops = [
            (e0 - _elev(r + dr, c + dc)) / (SQRT2 if dr and dc else 1.0)
            for _, dr, dc in DIRS
        ]
        best = max(drops)
        row = got[(r, c)]
        assert abs(row["drop_norm"] - best) < 1e-8
        if best > 0:
            assert row["d8_dir"] == drops.index(best)
        else:
            assert row["d8_dir"] == -1
            n_sinks += 1
    # sanity: a random surface has some sinks but not mostly sinks
    assert 0 < n_sinks < len(got) / 2
