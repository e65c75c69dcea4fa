"""spark.aggregates: wrap-aware bounding-rect aggregation and native
CellUnion.Denormalize, plus the edge-interpolate kernels they ride on.

Reference semantics: Rect/S1Interval union (rect.go, edgeutil.go:282-333),
CellUnion.Denormalize (cellunion.go:68-88), EdgeInterpolate /
GetDistanceFraction (edgeutil.go:335-354, 394-398).
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from gos2_spark.spark.aggregates import denormalize_to_level, rect_bound_agg


def _brute_min_interval(lngs):
    """Minimal covering arc of a set of longitudes: complement of the
    largest circular gap, O(n log n) reference implementation."""
    s = sorted(lngs)
    if len(s) == 1:
        return s[0], s[0]
    # same float-op order as the engine: wrap gap is (min + 360) - last
    nxts = s[1:] + [s[0] + 360.0]
    gaps = [nxts[i] - s[i] for i in range(len(s))]
    k = max(range(len(s)), key=lambda i: (gaps[i], -s[i]))
    lo = nxts[k] - 360.0 if nxts[k] >= 180.0 else nxts[k]
    hi = s[k]
    return lo, hi


@pytest.fixture(scope="module")
def groups_df(spark):
    rows = []
    # narrow group (< 180 span): minimal == greedy RectBounder bound
    for i, (lat, lng) in enumerate([(10.0, -5.0), (12.0, 3.0), (8.0, 20.0)]):
        rows.append(("narrow", lat, lng))
    # wrap group: points hug the antimeridian on both sides
    for lat, lng in [(0.0, 170.0), (5.0, -175.0), (-3.0, 178.0), (2.0, -160.0)]:
        rows.append(("wrap", lat, lng))
    # wide group spanning > 180 without wrapping through 180
    for lat, lng in [(0.0, -120.0), (0.0, 0.0), (0.0, 100.0)]:
        rows.append(("wide", lat, lng))
    # singleton
    rows.append(("one", 42.0, 13.0))
    return spark.createDataFrame(rows, "g string, lat double, lng double")


def test_rect_bound_agg_matches_brute(groups_df, spark):
    out = {r["g"]: r for r in rect_bound_agg(groups_df, ["g"], "lat", "lng").collect()}
    data = groups_df.collect()
    for g in ["narrow", "wrap", "wide", "one"]:
        pts = [(r["lat"], r["lng"]) for r in data if r["g"] == g]
        lo, hi = _brute_min_interval([p[1] for p in pts])
        r = out[g]
        assert r["lat_lo"] == min(p[0] for p in pts)
        assert r["lat_hi"] == max(p[0] for p in pts)
        assert (r["lng_lo"], r["lng_hi"]) == (lo, hi), g
        assert r["n_pts"] == len(pts)
    # the wrap group must actually produce an inverted interval
    assert out["wrap"]["lng_lo"] > out["wrap"]["lng_hi"]


def test_rect_bound_agg_random_vs_brute(spark):
    rng = np.random.default_rng(11)
    rows = []
    for g in range(8):
        n = int(rng.integers(1, 40))
        lats = rng.uniform(-80, 80, n)
        lngs = np.round(rng.uniform(-180, 180, n), 6)
        rows += [(f"g{g}", float(a), float(o)) for a, o in zip(lats, lngs)]
    df = spark.createDataFrame(rows, "g string, lat double, lng double")
    out = {r["g"]: r for r in rect_bound_agg(df, ["g"], "lat", "lng").collect()}
    for g in {r[0] for r in rows}:
        lngs = [r[2] for r in rows if r[0] == g]
        lo, hi = _brute_min_interval(lngs)
        assert (out[g]["lng_lo"], out[g]["lng_hi"]) == (lo, hi), g


def test_denormalize_to_level_counts(spark):
    from gos2_spark.kernels import hilbert as H
    from gos2_spark.kernels import projection as PJ

    lats = np.array([40.7, -33.9, 51.5, 35.7])
    lngs = np.array([-74.0, 151.2, -0.13, 139.7])
    leaves = PJ.cellid_from_latlng(lats, lngs)
    for lvl_in, lvl_out in [(3, 5), (5, 5), (0, 2)]:
        parents = H.parent(leaves, lvl_in)
        biased = H.to_signed(parents)
        df = spark.createDataFrame([(int(b),) for b in set(biased.tolist())], "cell long")
        out = denormalize_to_level(df, "cell", lvl_out, "child").collect()
        n_parents = len(set(biased.tolist()))
        assert len(out) == n_parents * 4 ** (lvl_out - lvl_in)
        # every child is at lvl_out and its ancestor at lvl_in is the source
        childs = np.array([r["child"] for r in out], dtype=np.int64)
        raw = H.from_signed(childs)
        assert (H.level(raw) == lvl_out).all()
        anc = H.parent(raw, lvl_in)
        assert set(anc.tolist()) == set(parents.tolist())
        # children are distinct
        assert len(set(childs.tolist())) == len(childs)


def test_denormalize_drops_too_deep_cells(spark):
    from gos2_spark.kernels import hilbert as H
    from gos2_spark.kernels import projection as PJ

    leaf = PJ.cellid_from_latlng(np.array([10.0]), np.array([20.0]))
    deep = int(H.to_signed(H.parent(leaf, 8))[0])
    shallow = int(H.to_signed(H.parent(leaf, 2))[0])
    df = spark.createDataFrame([(deep,), (shallow,)], "cell long")
    out = denormalize_to_level(df, "cell", 4, "child").collect()
    # the level-8 cell is deeper than target 4 -> dropped; level-2 -> 4^2
    assert len(out) == 16
    src = {r["cell"] for r in out}
    assert src == {shallow}


def test_interpolate_kernel_matches_scalar():
    from gos2_spark.geometry import _vec as V
    from gos2_spark.geometry.polyline import edge_interpolate_at_distance
    from gos2_spark.kernels import predicates as PR

    a = V.from_degrees(10.0, 20.0)
    b = V.from_degrees(40.0, 100.0)
    ab = V.angle(a, b)
    ts = np.array([0.0, 0.1, 0.5, 0.9, 1.0])
    batch = PR.interpolate_on_edge(ts, a, b)
    for i, t in enumerate(ts):
        want = (
            a if t == 0.0 else b if t == 1.0
            else edge_interpolate_at_distance(t * ab, a, b, ab)
        )
        assert V.distance(tuple(batch[i]), want) < 1e-15
    # fraction recovery is the identity on on-edge points
    np.testing.assert_allclose(PR.distance_fractions(batch, a, b), ts, atol=1e-12)


def test_sessionize_gap_semantics(spark):
    # Spark session_window merges iff diff <= gap (boundary-INCLUSIVE):
    # u1's 90m event is exactly gap after the 30m event -> same session;
    # the 151m event is 61m later -> new session. u2: one event.
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=30)),
        (1, base + dt.timedelta(minutes=90)),
        (1, base + dt.timedelta(minutes=151)),
        (2, base),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    from gos2_spark.spark.aggregates import sessionize

    out = sessionize(df, gap="1 hour").orderBy("key", "session_start").collect()
    assert [(r["key"], r["n_events"]) for r in out] == [(1, 3), (1, 1), (2, 1)]
    # session end = last event + gap
    assert out[0]["session_end"] == base + dt.timedelta(minutes=150)


def test_capped_sample_two_level_equals_single_window(spark):
    # Hot-key input: one key with 5000 rows, two cold keys. The sharded
    # two-level plan must return EXACTLY the single-window top-k.
    from pyspark.sql import Window
    from gos2_spark.spark.aggregates import capped_sample_per_key

    df = spark.range(5200).select(
        F.when(F.col("id") < 5000, F.lit("hot"))
        .when(F.col("id") < 5100, F.lit("cold_a"))
        .otherwise(F.lit("cold_b"))
        .alias("k"),
        F.col("id"),
        ((F.col("id") * 2654435761) % 999983).alias("ord"),
    )
    got = {
        (r["k"], r["id"])
        for r in capped_sample_per_key(df, ["k"], 7, F.col("ord"), shards=16).collect()
    }
    w = Window.partitionBy("k").orderBy("ord", "id")
    want = {
        (r["k"], r["id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 7)
        .collect()
    }
    assert got == want and len(got) == 21


def test_capped_sample_deterministic_under_ties(spark):
    # order_col collides heavily WITHIN keys (ord = id % 5 over 4000 rows):
    # with a row-unique tiebreak the selection must be exactly the
    # single-window (ord, id) top-k, independent of input partitioning.
    from pyspark.sql import Window
    from gos2_spark.spark.aggregates import capped_sample_per_key

    df = spark.range(4000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        F.col("id"),
        (F.col("id") % 5).alias("ord"),
    )
    w = Window.partitionBy("k").orderBy("ord", "id")
    want = {
        (r["k"], r["id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 9)
        .collect()
    }
    for nparts in (1, 7, 32):
        got = {
            (r["k"], r["id"])
            for r in capped_sample_per_key(
                df.repartition(nparts), ["k"], 9, F.col("ord"),
                shards=8, tiebreak_cols=[F.col("id")],
            ).collect()
        }
        assert got == want and len(got) == 27


def test_cell_pyramid_rollup_invariants(spark):
    """Pyramid consistency: every level's counts sum to the point total,
    and each parent's count equals the sum of its level-(l+1) children
    (parent arithmetic, not re-aggregation)."""
    import numpy as np

    from gos2_spark.kernels import hilbert as H
    from gos2_spark.spark.aggregates import cell_pyramid
    from gos2_spark.spark.functions import s2_cellid
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    n = 500
    rows = [
        (i, float(rng.uniform(-80, 80)), float(rng.uniform(-179, 179)))
        for i in range(n)
    ]
    pts = (
        spark.createDataFrame(rows, "key long, lat double, lng double")
        .withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    )
    out = cell_pyramid(pts, levels=(3, 4, 5)).collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r["level"], {})[r["cell"]] = r["n"]
    assert set(by_level) == {3, 4, 5}
    for lvl, cells in by_level.items():
        assert sum(cells.values()) == n, lvl
    for lvl in (3, 4):
        child = by_level[lvl + 1]
        rolled = {}
        for c, cnt in child.items():
            u = H.from_signed(np.array([c]))
            p = int(H.to_signed(H.parent(u, lvl))[0])
            rolled[p] = rolled.get(p, 0) + cnt
        assert rolled == by_level[lvl], lvl


class TestCapBoundPerKey:
    def test_contains_all_points_and_tight_on_circle(self, spark):
        """Cap invariants: every member point is within radius of the
        axis; for points on a small circle around a center the axis
        recovers the center and the radius the circle's angular radius."""
        import math

        import numpy as np
        from pyspark.sql import Row

        from gos2_spark.spark.aggregates import cap_bound_per_key

        clat, clng, r = 35.0, 120.0, 0.05  # radians radius
        rows = []
        for i in range(40):
            t = 2 * math.pi * i / 40
            # small-circle offsets in the local tangent plane
            rows.append(
                Row(
                    key=1,
                    lat=clat + math.degrees(r) * math.cos(t),
                    lng=clng
                    + math.degrees(r) * math.sin(t) / math.cos(math.radians(clat)),
                )
            )
        rows.append(Row(key=2, lat=10.0, lng=10.0))  # singleton group
        out = {
            r_["key"]: r_
            for r_ in cap_bound_per_key(spark.createDataFrame(rows)).collect()
        }
        g = out[1]
        assert g["n_pts"] == 40
        # The lat/lng-parameterized ring is not a true spherical circle;
        # its centroid sits ~r^2*tan(lat)/2 rad poleward of the center
        # (~0.04 deg here), so allow that bias.
        assert abs(g["axis_lat"] - clat) < 0.06
        assert abs(g["axis_lng"] - clng) < 0.01
        # tangent-plane circle -> spherical radius within a few percent
        assert 0.9 * r < g["radius_rad"] < 1.1 * r
        # every point within the cap
        ax = np.array([
            math.cos(math.radians(g["axis_lng"])) * math.cos(math.radians(g["axis_lat"])),
            math.sin(math.radians(g["axis_lng"])) * math.cos(math.radians(g["axis_lat"])),
            math.sin(math.radians(g["axis_lat"])),
        ])
        for row in rows[:40]:
            p = np.array([
                math.cos(math.radians(row.lng)) * math.cos(math.radians(row.lat)),
                math.sin(math.radians(row.lng)) * math.cos(math.radians(row.lat)),
                math.sin(math.radians(row.lat)),
            ])
            assert math.acos(min(1.0, float(ax @ p))) <= g["radius_rad"] + 1e-9
        s = out[2]
        assert s["n_pts"] == 1 and s["radius_rad"] < 1e-7
        assert abs(s["axis_lat"] - 10.0) < 1e-6 and abs(s["axis_lng"] - 10.0) < 1e-6
