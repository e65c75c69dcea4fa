"""Round-3 additions: bearing / midpoint / 1-NN classify / char entropy /
Zipf table. Each op is a native codegen expression (or a bounded top-k
plan); tests pin the math against independent pure-python references."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _bearing_py(lat1, lng1, lat2, lng2):
    rlat1, rlat2 = math.radians(lat1), math.radians(lat2)
    dlng = math.radians(lng2) - math.radians(lng1)
    y = math.sin(dlng) * math.cos(rlat2)
    x = math.cos(rlat1) * math.sin(rlat2) - math.sin(rlat1) * math.cos(rlat2) * math.cos(dlng)
    b = math.atan2(y, x)
    return b + 2 * math.pi if b < 0 else b


class TestBearing:
    CASES = [
        # due north / east / south / west from the equator
        ((0.0, 0.0, 10.0, 0.0), 0.0),
        ((0.0, 0.0, 0.0, 10.0), math.pi / 2),
        ((10.0, 0.0, 0.0, 0.0), math.pi),
        ((0.0, 10.0, 0.0, 0.0), 3 * math.pi / 2),
    ]

    def test_cardinal_directions(self, spark):
        from gos2_spark.spark.functions import initial_bearing_rad

        rows = [Row(i=i, a=c[0][0], b=c[0][1], c=c[0][2], d=c[0][3])
                for i, c in enumerate(self.CASES)]
        df = spark.createDataFrame(rows)
        got = {
            r["i"]: r["brg"]
            for r in df.select(
                "i",
                initial_bearing_rad(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("brg"),
            ).collect()
        }
        for i, (_, want) in enumerate(self.CASES):
            assert got[i] == pytest.approx(want, abs=1e-12)

    def test_matches_python_reference(self, spark):
        from gos2_spark.spark.functions import initial_bearing_rad

        pts = [
            (40.7128, -74.0060, 51.5074, -0.1278),
            (35.6762, 139.6503, -33.8688, 151.2093),
            (-23.5505, -46.6333, 6.5244, 3.3792),
            (89.0, 10.0, -89.0, -170.0),
        ]
        df = spark.createDataFrame(
            [Row(i=i, a=a, b=b, c=c, d=d) for i, (a, b, c, d) in enumerate(pts)]
        )
        got = {
            r["i"]: r["brg"]
            for r in df.select(
                "i",
                initial_bearing_rad(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("brg"),
            ).collect()
        }
        for i, (a, b, c, d) in enumerate(pts):
            assert got[i] == pytest.approx(_bearing_py(a, b, c, d), abs=1e-12)
            assert 0.0 <= got[i] < 2 * math.pi


class TestSphericalMidpoint:
    def test_equator_midpoint(self, spark):
        from gos2_spark.spark.functions import spherical_midpoint

        df = spark.createDataFrame([Row(a=0.0, b=10.0, c=0.0, d=30.0)])
        m = df.select(
            spherical_midpoint(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
        ).collect()[0]["m"]
        assert m["mid_lat"] == pytest.approx(0.0, abs=1e-12)
        assert m["mid_lng"] == pytest.approx(20.0, abs=1e-12)

    def test_midpoint_is_equidistant(self, spark):
        from gos2_spark.spark.functions import haversine_rad, spherical_midpoint

        pts = [
            (40.7128, -74.0060, 51.5074, -0.1278),
            (-33.8688, 151.2093, 35.6762, 139.6503),
            (10.0, 179.5, 12.0, -179.0),  # antimeridian crossing
        ]
        df = spark.createDataFrame(
            [Row(i=i, a=a, b=b, c=c, d=d) for i, (a, b, c, d) in enumerate(pts)]
        )
        m = df.select(
            "i", "a", "b", "c", "d",
            spherical_midpoint(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m"),
        )
        out = m.select(
            "i",
            haversine_rad(F.col("a"), F.col("b"), F.col("m.mid_lat"), F.col("m.mid_lng")).alias("d1"),
            haversine_rad(F.col("c"), F.col("d"), F.col("m.mid_lat"), F.col("m.mid_lng")).alias("d2"),
            haversine_rad(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("full"),
        ).collect()
        for r in out:
            assert r["d1"] == pytest.approx(r["d2"], abs=1e-9)
            assert r["d1"] + r["d2"] == pytest.approx(r["full"], rel=1e-9)


class TestNearestCenter:
    def test_picks_closest_and_tiebreaks_by_name(self, spark):
        from gos2_spark.spark.functions import nearest_center

        centers = [("alpha", 0.0, 0.0), ("beta", 0.0, 90.0)]
        df = spark.createDataFrame(
            [Row(lat=1.0, lng=2.0), Row(lat=0.0, lng=45.0), Row(lat=-5.0, lng=80.0)]
        )
        out = df.select(
            nearest_center(F.col("lat"), F.col("lng"), centers).alias("nn")
        ).collect()
        assert out[0]["nn"]["name"] == "alpha"
        # exact tie at lng=45 on the equator -> lexicographically first name
        assert out[1]["nn"]["name"] == "alpha"
        assert out[2]["nn"]["name"] == "beta"


class TestCharEntropy:
    def _entropy_py(self, text):
        import collections

        counts = collections.Counter(c for c in text.lower() if c.isalpha() and c.isascii())
        n = sum(counts.values())
        if n == 0:
            return 0.0
        return math.log(n) - sum(c * math.log(c) for c in counts.values()) / n

    def test_known_values(self, spark):
        from gos2_spark.pipeline.text import char_entropy

        texts = ["", "aaaa", "ab", "abcd", "Hello, World!", "the quick brown fox"]
        df = spark.createDataFrame([Row(i=i, text=t) for i, t in enumerate(texts)])
        got = {
            r["i"]: r["h"]
            for r in df.select("i", char_entropy(F.col("text")).alias("h")).collect()
        }
        assert got[0] == 0.0
        assert got[1] == 0.0  # single-symbol distribution
        assert got[2] == pytest.approx(math.log(2), abs=1e-12)
        assert got[3] == pytest.approx(math.log(4), abs=1e-12)
        for i, t in enumerate(texts):
            assert got[i] == pytest.approx(self._entropy_py(t), abs=1e-12)


class TestZipf:
    def test_rank_and_cumshare(self, spark):
        from gos2_spark.pipeline.text import zipf_top_tokens

        docs = spark.createDataFrame(
            [
                Row(doc_id=0, text="a a a b b c"),
                Row(doc_id=1, text="a b. C!"),
                Row(doc_id=2, text="d"),
            ]
        )
        out = zipf_top_tokens(docs, top_k=3).orderBy("rank").collect()
        # counts: a=4 b=3 c=2 d=1, total=10
        assert [(r["rank"], r["token"], r["n_occurrences"]) for r in out] == [
            (1, "a", 4), (2, "b", 3), (3, "c", 2),
        ]
        assert [r["cum_frac"] for r in out] == [0.4, 0.7, 0.9]

    def test_tie_breaks_on_token(self, spark):
        from gos2_spark.pipeline.text import zipf_top_tokens

        docs = spark.createDataFrame([Row(doc_id=0, text="z y x z y x")])
        out = zipf_top_tokens(docs, top_k=3).orderBy("rank").collect()
        assert [r["token"] for r in out] == ["x", "y", "z"]


class TestUrlCanonicalize:
    CASES = [
        ("HTTPS://Example.COM:443/a/b#frag", "https://example.com/a/b"),
        ("http://Example.com:80/x", "http://example.com/x"),
        ("https://a.com/p?utm_source=x&utm_medium=y", "https://a.com/p"),
        ("https://a.com/p?id=1&utm_source=x", "https://a.com/p?id=1"),
        ("https://a.com/p?utm_source=x&id=1", "https://a.com/p?id=1"),
        ("https://a.com/p/", "https://a.com/p"),
        ("https://a.com/", "https://a.com"),
        ("https://a.com/p?fbclid=abc", "https://a.com/p"),
        ("https://a.com:8080/p", "https://a.com:8080/p"),  # non-default port kept
        ("https://a.com/p?gclid=1&keep=2&utm_x=3", "https://a.com/p?keep=2"),
    ]

    def test_cases(self, spark):
        from pyspark.sql import Row

        from gos2_spark.pipeline.web import url_canonicalize

        df = spark.createDataFrame(
            [Row(i=i, url=raw) for i, (raw, _) in enumerate(self.CASES)]
        )
        got = {
            r["i"]: r["c"]
            for r in df.select("i", url_canonicalize(F.col("url")).alias("c")).collect()
        }
        for i, (raw, want) in enumerate(self.CASES):
            assert got[i] == want, f"{raw!r} -> {got[i]!r}, want {want!r}"

    def test_idempotent(self, spark):
        from pyspark.sql import Row

        from gos2_spark.pipeline.web import url_canonicalize

        df = spark.createDataFrame(
            [Row(i=i, url=want) for i, (_, want) in enumerate(self.CASES)]
        )
        got = df.select("i", url_canonicalize(F.col("url")).alias("c")).collect()
        for r in got:
            assert r["c"] == self.CASES[r["i"]][1]


class TestLinksAndRobots:
    def test_extract_links(self, spark):
        from pyspark.sql import Row

        from gos2_spark.pipeline.web import extract_links

        html = '<a href="https://x.com/a">1</a><p></p><a href="/rel">2</a>'
        df = spark.createDataFrame([Row(html=html), Row(html="<p>none</p>")])
        out = [r["l"] for r in df.select(extract_links(F.col("html")).alias("l")).collect()]
        assert out[0] == ["https://x.com/a", "/rel"]
        assert out[1] == []

    def test_robots_gate(self, spark):
        from pyspark.sql import Row

        from gos2_spark.pipeline.web import robots_gate

        pages = spark.createDataFrame(
            [
                Row(url="https://a.com/admin/x"),      # blocked by '*'
                Row(url="https://a.com/public"),       # kept
                Row(url="https://b.com/tmp/1"),        # blocked host rule
                Row(url="https://c.com/tmp/1"),        # kept (rule is b.com only)
            ]
        )
        rules = spark.createDataFrame(
            [("*", "/admin"), ("b.com", "/tmp")], "host string, path_prefix string"
        )
        kept = sorted(r["url"] for r in robots_gate(pages, rules).collect())
        assert kept == ["https://a.com/public", "https://c.com/tmp/1"]
        # original columns survive untouched
        assert robots_gate(pages, rules).columns == ["url"]


def _ref_arc_dist(p, a, b):
    """Independent point-to-geodesic-segment distance (projection form,
    different formulas from kernels.predicates.distance_to_edges)."""
    import numpy as np

    p, a, b = (np.asarray(v, dtype=float) for v in (p, a, b))
    ang = lambda u, v: math.atan2(np.linalg.norm(np.cross(u, v)), float(u @ v))
    n = np.cross(a, b)
    nn = np.linalg.norm(n)
    if nn < 1e-12:
        return ang(p, a)
    n = n / nn
    c = p - (p @ n) * n
    cn = np.linalg.norm(c)
    if cn > 1e-12:
        c = c / cn
        if abs(ang(a, c) + ang(c, b) - ang(a, b)) < 1e-9:
            return ang(p, c)
    return min(ang(p, a), ang(p, b))


def _ref_dp(xyz, tol):
    """Independent recursive Douglas-Peucker using _ref_arc_dist."""
    n = len(xyz)
    keep = [False] * n
    keep[0] = keep[-1] = True

    def rec(lo, hi):
        if hi - lo < 2:
            return
        dists = [_ref_arc_dist(xyz[i], xyz[lo], xyz[hi]) for i in range(lo + 1, hi)]
        imax = max(range(len(dists)), key=lambda i: dists[i])
        if dists[imax] > tol:
            split = lo + 1 + imax
            keep[split] = True
            rec(lo, split)
            rec(split, hi)

    rec(0, n - 1)
    return keep


def _latlng_xyz(lat, lng):
    rlat, rlng = math.radians(lat), math.radians(lng)
    return (
        math.cos(rlng) * math.cos(rlat),
        math.sin(rlng) * math.cos(rlat),
        math.sin(rlat),
    )


class TestSimplifyTrajectories:
    def _run(self, spark, pts, tol, parts=4):
        from gos2_spark.spark.trajectory import simplify_trajectories

        df = spark.createDataFrame(
            [Row(user_id=u, ts=i, pt_id=i, lat=la, lng=ln) for u, i, la, ln in pts]
        ).repartition(parts)
        out = simplify_trajectories(df, tolerance_rad=tol, key_col="user_id")
        return sorted((r["user_id"], r["pt_id"]) for r in out.collect())

    def test_collinear_keeps_endpoints_only(self, spark):
        pts = [(1, i, 0.0, float(i)) for i in range(10)]  # equator great circle
        assert self._run(spark, pts, 1e-9) == [(1, 0), (1, 9)]

    def test_detour_kept_below_tolerance_dropped_above(self, spark):
        pts = [(1, 0, 0.0, 0.0), (1, 1, 5.0, 10.0), (1, 2, 0.0, 20.0)]
        lo = self._run(spark, pts, 0.01)   # 5 deg detour >> 0.01 rad
        hi = self._run(spark, pts, 0.2)    # 0.2 rad ~ 11.5 deg > deviation
        assert lo == [(1, 0), (1, 1), (1, 2)]
        assert hi == [(1, 0), (1, 2)]

    def test_matches_independent_dp_and_tolerance_bound(self, spark):
        import random

        random.seed(7)
        users = {}
        rows = []
        for u in range(5):
            lat, lng = random.uniform(-50, 50), random.uniform(-150, 150)
            traj = []
            for i in range(40):
                lat += random.uniform(-1.5, 1.5)
                lng += random.uniform(0.5, 2.5)
                traj.append((lat, lng))
                rows.append((u, i, lat, lng))
            users[u] = traj
        tol = 0.01
        got = self._run(spark, rows, tol)
        by_user = {}
        for u, i in got:
            by_user.setdefault(u, []).append(i)
        for u, traj in users.items():
            xyz = [_latlng_xyz(la, ln) for la, ln in traj]
            want = [i for i, k in enumerate(_ref_dp(xyz, tol)) if k]
            assert by_user[u] == want, f"user {u}"
            # every dropped vertex within tol of the simplified chain
            kept = by_user[u]
            for i in range(len(traj)):
                if i in kept:
                    continue
                lo = max(k for k in kept if k < i)
                hi = min(k for k in kept if k > i)
                assert _ref_arc_dist(xyz[i], xyz[lo], xyz[hi]) <= tol + 1e-12

    def test_larger_tolerance_is_subset(self, spark):
        import random

        random.seed(11)
        rows = []
        lat = lng = 0.0
        for i in range(60):
            lat += random.uniform(-2, 2)
            lng += random.uniform(0.5, 2)
            rows.append((1, i, lat, lng))
        small = {i for _, i in self._run(spark, rows, 0.005)}
        large = {i for _, i in self._run(spark, rows, 0.05)}
        assert large <= small
        assert {0, 59} <= large

    def test_partitioning_invariant(self, spark):
        rows = [(u, i, math.sin(i / 3.0) * 20.0, i * 2.0) for u in (1, 2) for i in range(25)]
        assert self._run(spark, rows, 0.01, parts=1) == self._run(
            spark, rows, 0.01, parts=8
        )


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [Row(k=1, ts=t, eid=i) for i, t in enumerate([5, 10, 15, 20])]
            + [Row(k=2, ts=t, eid=100 + i) for i, t in enumerate([1, 9])]
        )
        right = spark.createDataFrame(
            [Row(k=1, ts=10, v="a"), Row(k=1, ts=18, v="b"), Row(k=2, ts=50, v="z")]
        )
        return left, right

    def test_backward_inclusive(self, spark):
        from gos2_spark.spark.temporal import asof_join

        left, right = self._frames(spark)
        out = {
            r["eid"]: r["v"]
            for r in asof_join(left, right, on="k", ts_col="ts").collect()
        }
        # ts=5: no update yet; ts=10: equal-ts inclusive; ts=15: still 'a';
        # ts=20: 'b'; key 2 has no update before either event
        assert out == {0: None, 1: "a", 2: "a", 3: "b", 100: None, 101: None}

    def test_null_payload_value_survives(self, spark):
        from gos2_spark.spark.temporal import asof_join

        left = spark.createDataFrame([Row(k=1, ts=10, eid=0), Row(k=1, ts=30, eid=1)])
        right = spark.createDataFrame(
            [Row(k=1, ts=5, v="x"), Row(k=1, ts=20, v=None)]
        )
        out = {
            r["eid"]: r["v"]
            for r in asof_join(left, right, on="k", ts_col="ts").collect()
        }
        # the ts=20 update really sets v to NULL; carry-forward must not
        # skip back to 'x'
        assert out == {0: "x", 1: None}

    def test_matches_pandas_merge_asof(self, spark):
        import numpy as np
        import pandas as pd

        from gos2_spark.spark.temporal import asof_join

        rng = np.random.default_rng(3)
        lpd = pd.DataFrame(
            {
                "k": rng.integers(0, 5, 300),
                "ts": rng.integers(0, 1000, 300),
                "eid": np.arange(300),
            }
        )
        rpd = (
            pd.DataFrame(
                {
                    "k": rng.integers(0, 5, 40),
                    "ts": rng.integers(0, 1000, 40),
                }
            )
            .drop_duplicates(["k", "ts"])
            .reset_index(drop=True)
        )
        rpd["val"] = np.arange(len(rpd))
        want = pd.merge_asof(
            lpd.sort_values("ts", kind="mergesort"),
            rpd.sort_values("ts", kind="mergesort"),
            on="ts", by="k", direction="backward",
        ).set_index("eid")["val"].to_dict()
        out = asof_join(
            spark.createDataFrame(lpd), spark.createDataFrame(rpd),
            on="k", ts_col="ts",
        ).collect()
        got = {r["eid"]: r["val"] for r in out}
        for eid, w in want.items():
            g = got[eid]
            assert (g is None and pd.isna(w)) or g == w, f"eid {eid}: {g} != {w}"

    def test_collision_raises(self, spark):
        from gos2_spark.spark.temporal import asof_join

        left, right = self._frames(spark)
        with pytest.raises(ValueError):
            asof_join(left.withColumnRenamed("eid", "v"), right, on="k", ts_col="ts")


class TestGcDestination:
    def test_roundtrip_bearing_and_distance(self, spark):
        from gos2_spark.spark.functions import (
            gc_destination, haversine_rad, initial_bearing_rad,
        )

        rows = [
            Row(i=0, lat=40.7128, lng=-74.0060, brg=1.0, dist=0.05),
            Row(i=1, lat=-33.8688, lng=151.2093, brg=4.5, dist=0.2),
            Row(i=2, lat=0.0, lng=179.9, brg=math.pi / 2, dist=0.1),  # wraps
            Row(i=3, lat=80.0, lng=10.0, brg=0.0, dist=0.3),  # over the pole region
        ]
        df = spark.createDataFrame(rows)
        d = gc_destination(F.col("lat"), F.col("lng"), F.col("brg"), F.col("dist"))
        out = df.select(
            "i", "brg", "dist",
            haversine_rad(F.col("lat"), F.col("lng"), d["dst_lat"], d["dst_lng"]).alias("hd"),
            initial_bearing_rad(F.col("lat"), F.col("lng"), d["dst_lat"], d["dst_lng"]).alias("hb"),
            d["dst_lng"].alias("dst_lng"),
        ).collect()
        for r in out:
            assert r["hd"] == pytest.approx(r["dist"], rel=1e-9)
            werr = abs(r["hb"] - r["brg"])
            assert min(werr, 2 * math.pi - werr) < 1e-9  # bearing wraps at 2pi
            assert -180.0 <= r["dst_lng"] < 180.0

    def test_due_east_on_equator(self, spark):
        from gos2_spark.spark.functions import gc_destination

        df = spark.createDataFrame([Row(lat=0.0, lng=0.0)])
        d = gc_destination(F.col("lat"), F.col("lng"), F.lit(math.pi / 2), F.lit(0.5))
        r = df.select(d.alias("d")).collect()[0]["d"]
        assert r["dst_lat"] == pytest.approx(0.0, abs=1e-12)
        assert r["dst_lng"] == pytest.approx(math.degrees(0.5), abs=1e-9)


class TestIntervalJoin:
    def test_matches_brute_force_and_bucket_invariance(self, spark):
        import datetime as dt
        import random

        random.seed(5)
        base = dt.datetime(2024, 1, 1)
        evs = [
            Row(k=random.randint(0, 3), ts=base + dt.timedelta(seconds=random.randint(0, 200_000)), eid=i)
            for i in range(300)
        ]
        wins = [
            Row(
                k=random.randint(0, 3),
                wid=j,
                start_ts=(s := base + dt.timedelta(seconds=random.randint(0, 150_000))),
                end_ts=s + dt.timedelta(seconds=random.randint(0, 30_000)),
            )
            for j in range(25)
        ]
        left = spark.createDataFrame(evs)
        iv = spark.createDataFrame(wins)
        brute = {
            (e.eid, w.wid)
            for e in evs
            for w in wins
            if e.k == w.k and w.start_ts <= e.ts <= w.end_ts
        }
        from gos2_spark.spark.temporal import interval_join

        for bucket in (600, 3600, 86400):
            got = {
                (r["eid"], r["wid"])
                for r in interval_join(
                    left, iv, on="k", ts_col="ts", bucket_seconds=bucket
                ).collect()
            }
            assert got == brute, f"bucket={bucket}"

    def test_boundaries_inclusive(self, spark):
        import datetime as dt

        from gos2_spark.spark.temporal import interval_join

        t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
        left = spark.createDataFrame(
            [Row(ts=t0, eid=0), Row(ts=t0 + dt.timedelta(hours=2), eid=1),
             Row(ts=t0 + dt.timedelta(hours=2, seconds=1), eid=2)]
        )
        iv = spark.createDataFrame(
            [Row(wid=9, start_ts=t0, end_ts=t0 + dt.timedelta(hours=2))]
        )
        got = sorted(r["eid"] for r in interval_join(left, iv).collect())
        assert got == [0, 1]


class TestHits:
    def test_star_graph(self, spark):
        from gos2_spark.pipeline.graph import hits

        # hub 0 points at 1..3; node 9 isolated-ish (one self-contained edge pair)
        edges = spark.createDataFrame(
            [Row(src=0, dst=1), Row(src=0, dst=2), Row(src=0, dst=3)]
        )
        out = {r["node"]: (r["hub"], r["authority"]) for r in hits(edges, 2).collect()}
        assert out[0][0] == pytest.approx(1.0)      # the only hub
        assert out[0][1] == 0.0                      # no in-links
        for v in (1, 2, 3):
            assert out[v][0] == 0.0
            assert out[v][1] == pytest.approx(1 / 3)

    def test_l1_normalized(self, spark):
        from gos2_spark.pipeline.graph import hits

        edges = spark.createDataFrame(
            [Row(src=i % 7, dst=(i * 3 + 1) % 7) for i in range(20)]
        )
        rows = hits(edges, 3).collect()
        assert sum(r["hub"] for r in rows) == pytest.approx(1.0, abs=1e-12)
        assert sum(r["authority"] for r in rows) == pytest.approx(1.0, abs=1e-12)


class TestJaccardJoin:
    def test_matches_brute_force(self, spark):
        import itertools
        import random

        from gos2_spark.pipeline.dedup import jaccard_join

        random.seed(13)
        # alphabetic-only words: the engine tokenizer splits on [^a-z]+
        vocab = [f"w{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(40)]
        docs = []
        base = random.sample(vocab, 12)
        for i in range(30):
            if i % 3 == 0:  # near-dup cluster around `base`
                toks = base.copy()
                for _ in range(random.randint(0, 2)):
                    toks[random.randrange(len(toks))] = random.choice(vocab)
            else:
                toks = random.sample(vocab, random.randint(3, 15))
            docs.append((i, " ".join(toks)))
        sets = {i: set(t.split()) for i, t in docs}

        for thr in (0.4, 0.7, 0.9):
            want = {
                (a, b): round(len(sets[a] & sets[b]) / len(sets[a] | sets[b]), 9)
                for a, b in itertools.combinations(sorted(sets), 2)
                if len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= thr
            }
            df = spark.createDataFrame(docs, "doc_id long, text string")
            got = {
                (r["key_a"], r["key_b"]): round(r["jaccard"], 9)
                for r in jaccard_join(df, thr).collect()
            }
            assert got == want, f"threshold {thr}"

    def test_exact_duplicates_found(self, spark):
        from gos2_spark.pipeline.dedup import jaccard_join

        df = spark.createDataFrame(
            [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "unrelated words here")],
            "doc_id long, text string",
        )
        out = jaccard_join(df, 1.0).collect()
        assert [(r["key_a"], r["key_b"], r["jaccard"]) for r in out] == [(0, 1, 1.0)]


class TestColocationJoin:
    """Brute-force parity for the spatiotemporal encounter join: the
    time-bucket EQUI decomposition must reproduce the naive O(n^2)
    definition exactly (each qualifying pair once, canonical order)."""

    def _points(self, spark, n=240, keys=8, seed=7):
        import datetime

        import numpy as np

        rng = np.random.default_rng(seed)
        epoch = datetime.datetime(2024, 3, 1)
        rows = [
            Row(
                user_id=int(rng.integers(0, keys)),
                event_id=i,
                ts=epoch + datetime.timedelta(seconds=float(rng.uniform(0, 7200))),
                lat=float(rng.uniform(-10, 10)),
                lng=float(rng.uniform(-10, 10)),
            )
            for i in range(n)
        ]
        return rows, spark.createDataFrame(rows)

    @staticmethod
    def _brute(rows, window_s, radius):
        out = set()
        for a in rows:
            for b in rows:
                if a.event_id >= b.event_id or a.user_id == b.user_id:
                    continue
                dt = abs((b.ts - a.ts).total_seconds())
                if dt > window_s:
                    continue
                h = (
                    math.sin(0.5 * (math.radians(b.lat) - math.radians(a.lat))) ** 2
                    + math.sin(0.5 * (math.radians(b.lng) - math.radians(a.lng))) ** 2
                    * math.cos(math.radians(a.lat)) * math.cos(math.radians(b.lat))
                )
                d = 2 * math.atan2(math.sqrt(h), math.sqrt(max(0.0, 1.0 - h)))
                if d <= radius:
                    out.add((a.event_id, b.event_id))
        return out

    @pytest.mark.parametrize("window_s,radius", [(900, 0.05), (600, 0.2)])
    def test_matches_brute_force(self, spark, window_s, radius):
        from gos2_spark.spark.temporal import colocation_join

        rows, df = self._points(spark)
        got = colocation_join(
            df, window_seconds=window_s, radius_rad=radius
        ).collect()
        pairs = [(r["id_a"], r["id_b"]) for r in got]
        assert len(pairs) == len(set(pairs)), "pair emitted more than once"
        assert set(pairs) == self._brute(rows, window_s, radius)
        for r in got:
            assert r["id_a"] < r["id_b"] and r["key_a"] != r["key_b"]
            assert abs(r["dt_us"]) <= window_s * 1_000_000
            assert r["dist_rad"] <= radius

    def test_window_boundary_inclusive(self, spark):
        import datetime

        from gos2_spark.spark.temporal import colocation_join

        epoch = datetime.datetime(2024, 3, 1)
        df = spark.createDataFrame(
            [
                Row(user_id=1, event_id=0, ts=epoch, lat=0.0, lng=0.0),
                # exactly at the window edge: must match (<=)
                Row(
                    user_id=2,
                    event_id=1,
                    ts=epoch + datetime.timedelta(seconds=900),
                    lat=0.0,
                    lng=0.0,
                ),
                # one microsecond past: must not
                Row(
                    user_id=3,
                    event_id=2,
                    ts=epoch + datetime.timedelta(seconds=900, microseconds=1),
                    lat=0.0,
                    lng=0.0,
                ),
            ]
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in colocation_join(
                df, window_seconds=900, radius_rad=0.01
            ).collect()
        }
        assert got == {(0, 1), (1, 2)}

    def test_equi_join_not_nested_loop(self, spark):
        from gos2_spark.spark.temporal import colocation_join

        _, df = self._points(spark, n=50)
        plan = (
            colocation_join(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_dp_batched_matches_per_group_kernel():
    """The level-synchronous batched DP must reproduce the per-group
    kernel's keep mask bit-for-bit (same metric arithmetic, same
    first-max tie-break) across jagged, smooth, tiny and duplicate-point
    trajectories."""
    import numpy as np

    from gos2_spark.spark.trajectory import (
        _dp_keep_mask,
        _dp_keep_mask_batched,
    )

    rng = np.random.default_rng(42)
    for trial in range(10):
        sizes = rng.integers(1, 120, 40)
        xyzs, starts, ends, masks = [], [], [], []
        off = 0
        for s in sizes:
            if trial % 3 == 0:  # globe-jagged: nearly every point kept
                lat = np.radians(rng.uniform(-60, 60, s))
                lng = np.radians(rng.uniform(-170, 170, s))
            else:  # smooth local walk: most points dropped
                lat = np.radians(40 + np.cumsum(rng.normal(0, 0.01, s)))
                lng = np.radians(-70 + np.cumsum(rng.normal(0, 0.01, s)))
            if trial % 5 == 0 and s > 3:  # repeated-point degeneracy
                lat[1], lng[1] = lat[0], lng[0]
            xyz = np.column_stack(
                (np.cos(lng) * np.cos(lat), np.sin(lng) * np.cos(lat),
                 np.sin(lat))
            )
            xyzs.append(xyz)
            starts.append(off)
            ends.append(off + s - 1)
            off += s
            masks.append(
                np.ones(s, bool) if s <= 2 else _dp_keep_mask(xyz, 0.02)
            )
        got = _dp_keep_mask_batched(
            np.vstack(xyzs), np.array(starts), np.array(ends), 0.02
        )
        assert np.array_equal(got, np.concatenate(masks))
