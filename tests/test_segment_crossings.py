"""segment_crossing_join (spark/joins.py) vs a brute-force python
reference — certifies the tile blocking drops nothing and the proper-
crossing semantics (shared endpoints / touches excluded)."""

import random

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _ccw(p, q, r):
    return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])


def _crosses(a, b, c, d):
    return (
        _ccw(a, b, c) * _ccw(a, b, d) < 0 and _ccw(c, d, a) * _ccw(c, d, b) < 0
    )


def _brute(segs, same_group):
    out = set()
    for i, (id1, g1, rn1, a, b) in enumerate(segs):
        for id2, g2, rn2, c, d in segs[i + 1 :]:
            lo, hi = (id1, id2) if id1 < id2 else (id2, id1)
            if same_group:
                if g1 != g2 or abs(rn1 - rn2) < 2:
                    continue
            elif g1 == g2:
                continue
            if _crosses(a, b, c, d):
                out.add((lo, hi))
    return out


def _mk_segs(rng, n_groups=6, per_group=15, spread=8.0):
    segs = []
    sid = 0
    for g in range(n_groups):
        # clustered bases so cross-group overlaps actually occur
        bx = rng.uniform(-6, 6)
        by = rng.uniform(-6, 6)
        prev = (bx + rng.uniform(-spread, spread), by + rng.uniform(-spread, spread))
        for rn in range(1, per_group + 1):
            cur = (bx + rng.uniform(-spread, spread), by + rng.uniform(-spread, spread))
            segs.append((sid, f"g{g}", rn, prev, cur))
            prev = cur
            sid += 1
    return segs


def _to_df(spark, segs):
    rows = [
        (sid, g, rn, a[0], a[1], b[0], b[1]) for sid, g, rn, a, b in segs
    ]
    return spark.createDataFrame(
        rows,
        "seg_id long, group_id string, rn int, ax double, ay double,"
        " bx double, by double",
    )


def test_cross_group_matches_brute_force(spark):
    from gos2_spark.spark.joins import segment_crossing_join

    rng = random.Random(99)
    segs = _mk_segs(rng)
    got = segment_crossing_join(
        _to_df(spark, segs), id_col="seg_id", group_col="group_id", tile_deg=4.0
    ).collect()
    pairs = {(r["seg_a"], r["seg_b"]) for r in got}
    assert pairs == _brute(segs, same_group=False)
    assert len(pairs) > 0  # non-degenerate fixture


def test_within_group_adjacency_excluded(spark):
    from gos2_spark.spark.joins import segment_crossing_join

    rng = random.Random(5)
    segs = _mk_segs(rng, n_groups=3, per_group=20)
    got = segment_crossing_join(
        _to_df(spark, segs),
        id_col="seg_id",
        group_col="group_id",
        seq_col="rn",
        within_group=True,
        tile_deg=4.0,
    ).collect()
    pairs = {(r["seg_a"], r["seg_b"]) for r in got}
    assert pairs == _brute(segs, same_group=True)
    assert len(pairs) > 0
    # adjacent segments share an endpoint; proper-crossing must exclude them
    by_id = {s[0]: s for s in segs}
    for x, y in pairs:
        assert abs(by_id[x][2] - by_id[y][2]) >= 2 or by_id[x][1] != by_id[y][1]


def test_touching_endpoint_is_not_a_crossing(spark):
    from gos2_spark.spark.joins import segment_crossing_join

    # X touching at one shared endpoint, plus a T-junction: neither crosses
    segs = [
        (0, "a", 1, (0.0, 0.0), (1.0, 1.0)),
        (1, "b", 1, (1.0, 1.0), (2.0, 0.0)),   # shares endpoint with 0
        (2, "c", 1, (0.0, 2.0), (2.0, 2.0)),
        (3, "d", 1, (1.0, 2.0), (1.0, 3.0)),   # T-touch on segment 2
        (4, "e", 1, (0.0, 5.0), (2.0, 5.0)),
        (5, "f", 1, (1.0, 4.0), (1.0, 6.0)),   # true proper crossing with 4
    ]
    got = segment_crossing_join(
        _to_df(spark, segs), id_col="seg_id", group_col="group_id", tile_deg=4.0
    ).collect()
    assert {(r["seg_a"], r["seg_b"]) for r in got} == {(4, 5)}


def test_driver_queries_consistent(spark):
    qs = entry.queries()
    pc = qs["path_crossings"](spark, SF_DIR).collect()
    si = qs["self_intersections"](spark, SF_DIR).collect()
    assert all(r["group_a"] != r["group_b"] for r in pc)
    assert all(r["n_crossings"] > 0 for r in si)
