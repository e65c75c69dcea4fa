"""Point-pattern completion batch — empty-space F/J functions, global
Getis-Ord General G, exact central feature (1-medoid) — checked against
independent brute-force Python references."""

import math
from collections import Counter

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _events():
    rows = duckdb.sql(
        f"SELECT event_id FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    out = []
    for (eid,) in rows:
        lat = -60.0 + (eid * 11 % 120) + (eid % 83) / 83.0
        lng = -170.0 + (eid * 17 % 340) + (eid % 79) / 79.0
        out.append((eid, lat, lng))
    return out


def _vec(lat, lng):
    la, lo = math.radians(lat), math.radians(lng)
    return (
        math.cos(lo) * math.cos(la),
        math.sin(lo) * math.cos(la),
        math.sin(la),
    )


def _angle(a, b):
    cx = a[1] * b[2] - a[2] * b[1]
    cy = a[2] * b[0] - a[0] * b[2]
    cz = a[0] * b[1] - a[1] * b[0]
    return math.atan2(
        math.sqrt(cx * cx + cy * cy + cz * cz),
        a[0] * b[0] + a[1] * b[1] + a[2] * b[2],
    )


def test_nn_ffunction_matches_brute(spark):
    sub = [(e, _vec(la, ln)) for e, la, ln in _events() if e % 20 == 0]
    grid = [
        _vec(-55.0 + i * 10, -165.0 + j * 10)
        for i in range(12)
        for j in range(34)
    ]
    fdists = [min(_angle(g, p) for _, p in sub) for g in grid]
    gdists = [
        min(_angle(p, q) for f, q in sub if f != e) for e, p in sub
    ]
    got = {r["r_deg"]: r for r in entry.queries()["nn_ffunction"](spark, SF_DIR).collect()}
    assert set(got) == {1.0, 2.5, 5.0}
    for r_deg, row in got.items():
        rr = math.radians(r_deg)
        f = sum(1 for d in fdists if d <= rr) / len(fdists)
        g = sum(1 for d in gdists if d <= rr) / len(gdists)
        assert row["n_test"] == len(grid)
        assert row["n_points"] == len(sub)
        assert abs(row["f_hat"] - f) < 1e-8
        assert abs(row["g_hat"] - g) < 1e-8
        if f < 1.0:
            want_j = (1.0 - round(g, 9)) / (1.0 - round(f, 9))
            assert abs(row["j_hat"] - want_j) < 1e-6
        else:
            assert row["j_hat"] is None


def test_general_g_matches_brute(spark):
    tiles = Counter()
    for _, lat, lng in _events():
        tiles[
            (int(math.floor(lat / 10.0)) + 6, int(math.floor(lng / 10.0)) + 17)
        ] += 1
    num = 0
    w = 0
    for (r, c), x in tiles.items():
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if (dr, dc) == (0, 0):
                    continue
                other = tiles.get((r + dr, c + dc))
                if other is not None:
                    w += 1
                    num += x * other
    sx = sum(tiles.values())
    sxx = sum(x * x for x in tiles.values())
    den = sx * sx - sxx
    n = len(tiles)
    row = entry.queries()["general_g"](spark, SF_DIR).collect()[0]
    assert (row["n_cells"], row["w_pairs"], row["num"], row["den"]) == (
        n, w, num, den,
    )
    assert abs(row["g_obs"] - num / den) < 1e-9
    assert abs(row["g_exp"] - w / (n * (n - 1))) < 1e-9
    assert abs(row["g_ratio"] - (num / den) / (w / (n * (n - 1)))) < 1e-7


def test_central_feature_matches_brute(spark):
    sub = [(e, la, ln, _vec(la, ln)) for e, la, ln in _events() if e % 40 == 0]
    best = min(
        (
            sum(_angle(p, q) for f, _, _, q in sub if f != e),
            e, la, ln,
        )
        for e, la, ln, p in sub
    )
    row = entry.queries()["central_feature"](spark, SF_DIR).collect()[0]
    assert row["event_id"] == best[1]
    assert abs(row["lat"] - best[2]) < 1e-8
    assert abs(row["lng"] - best[3]) < 1e-8
    assert abs(row["sum_dist_rad"] - best[0]) < 1e-6
