"""Round-4 operator tests: deterministic k-means, exact TF-cosine join,
Morton (Z-order) keys, and great-circle interpolation — each vs an
independent numpy/pure-python replay (the DuckDB oracles replay the same
SQL algebra, so these catch algorithm bugs the oracles share)."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- k-means
def _ref_kmeans(keys, lat, lng, k, rounds, scale=1_000_000):
    ilat = np.floor(np.asarray(lat) * scale + 0.5).astype(np.int64)
    ilng = np.floor(np.asarray(lng) * scale + 0.5).astype(np.int64)
    order = np.argsort(keys)
    sl = ilat[order[:k]].astype(object)
    sg = ilng[order[:k]].astype(object)
    cnt = np.ones(k, dtype=np.int64)
    for _ in range(rounds):
        clat = np.array([float(s) / c for s, c in zip(sl, cnt)])
        clng = np.array([float(s) / c for s, c in zip(sg, cnt)])
        d2 = (ilat[:, None].astype(float) - clat[None, :]) ** 2 + (
            ilng[:, None].astype(float) - clng[None, :]
        ) ** 2
        assign = np.argmin(d2, axis=1)  # argmin ties to lowest cid
        sl = np.array(
            [int(ilat[assign == c].sum()) for c in range(k)], dtype=object
        )
        sg = np.array(
            [int(ilng[assign == c].sum()) for c in range(k)], dtype=object
        )
        cnt = np.array([(assign == c).sum() for c in range(k)], dtype=np.int64)
    return {
        c: (int(cnt[c]), round(float(sl[c]) / cnt[c] / scale, 9),
            round(float(sg[c]) / cnt[c] / scale, 9))
        for c in range(k)
        if cnt[c] > 0
    }


def test_kmeans_fixed_matches_numpy_replay(spark):
    from gos2_spark.spark.clustering import kmeans_fixed

    rng = random.Random(7)
    rows = [
        (i, rng.uniform(-60, 60), rng.uniform(-170, 170)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "key long, lat double, lng double")
    got = {
        r["cid"]: (r["n"], r["c_lat"], r["c_lng"])
        for r in kmeans_fixed(df, k=5, rounds=3).collect()
    }
    keys = np.array([r[0] for r in rows])
    want = _ref_kmeans(
        keys,
        [r[1] for r in rows],
        [r[2] for r in rows],
        k=5,
        rounds=3,
    )
    assert got == want


def test_kmeans_fixed_deterministic_across_partitionings(spark):
    from gos2_spark.spark.clustering import kmeans_fixed

    rng = random.Random(11)
    rows = [
        (i, rng.uniform(-80, 80), rng.uniform(-179, 179)) for i in range(300)
    ]
    df1 = spark.createDataFrame(rows, "key long, lat double, lng double")
    df2 = df1.repartition(17)
    a = sorted(map(tuple, kmeans_fixed(df1, k=4, rounds=2).collect()))
    b = sorted(map(tuple, kmeans_fixed(df2, k=4, rounds=2).collect()))
    assert a == b  # exact int sums → order/partitioning independent


# ------------------------------------------------------------- TF cosine
def test_cosine_tf_join_matches_brute(spark):
    from gos2_spark.pipeline.dedup import cosine_tf_join

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox sleeps"),
        (2, "lorem ipsum dolor sit amet"),
        (3, "the the the quick quick fox"),
        (4, "completely unrelated words here entirely"),
        (5, "lorem ipsum dolor sit amet lorem ipsum"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["key_a"], r["key_b"]): (r["dot"], round(r["cosine"], 9))
        for r in cosine_tf_join(df, threshold=0.3).collect()
    }

    import re
    from collections import Counter

    tfs = {d: Counter(t for t in re.split(r"[^a-z]+", s.lower()) if t)
           for d, s in docs}
    want = {}
    for a in tfs:
        for b in tfs:
            if a >= b:
                continue
            dot = sum(tfs[a][t] * tfs[b][t] for t in tfs[a])
            if dot == 0:
                continue
            na = math.sqrt(sum(v * v for v in tfs[a].values()))
            nb = math.sqrt(sum(v * v for v in tfs[b].values()))
            cos = dot / (na * nb)
            if cos >= 0.3:
                want[(a, b)] = (dot, round(cos, 9))
    assert got == want


def test_cosine_tf_join_no_pairs_below_threshold(spark):
    from gos2_spark.pipeline.dedup import cosine_tf_join

    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    )
    assert cosine_tf_join(df, threshold=0.1).count() == 0


# ----------------------------------------------------------------- Morton
def _ref_morton(lat, lng, bits=16):
    n = 1 << bits
    x = min(n - 1, int(math.floor((lng + 180.0) / 360.0 * n)))
    y = min(n - 1, int(math.floor((lat + 90.0) / 180.0 * n)))
    key = 0
    for i in range(bits):
        key |= ((x >> i) & 1) << (2 * i)
        key |= ((y >> i) & 1) << (2 * i + 1)
    return key


def test_morton_encode_matches_python(spark):
    from gos2_spark.spark.functions import morton_encode

    rng = random.Random(3)
    rows = [(rng.uniform(-90, 90), rng.uniform(-180, 180)) for _ in range(200)]
    rows += [(90.0, 180.0), (-90.0, -180.0), (0.0, 0.0)]  # clamp edges
    df = spark.createDataFrame(rows, "lat double, lng double")
    got = [
        r["m"]
        for r in df.select(
            morton_encode(F.col("lat"), F.col("lng")).alias("m")
        ).collect()
    ]
    want = [_ref_morton(lat, lng) for lat, lng in rows]
    assert got == want


def test_morton_encode_locality():
    # adjacent grid cells share long key prefixes more often than far ones
    near = bin(_ref_morton(10.0, 10.0) ^ _ref_morton(10.01, 10.01)).count("1")
    far = bin(_ref_morton(10.0, 10.0) ^ _ref_morton(-70.0, 160.0)).count("1")
    assert near < far


# ----------------------------------------------------- gc interpolation
def _ref_slerp(lat1, lng1, lat2, lng2, f):
    def xyz(lat, lng):
        rlat, rlng = math.radians(lat), math.radians(lng)
        return np.array(
            [
                math.cos(rlat) * math.cos(rlng),
                math.cos(rlat) * math.sin(rlng),
                math.sin(rlat),
            ]
        )

    p, q = xyz(lat1, lng1), xyz(lat2, lng2)
    theta = math.acos(max(-1.0, min(1.0, float(p @ q))))
    if theta < 1e-9:
        v = p
    else:
        v = (math.sin((1 - f) * theta) * p + math.sin(f * theta) * q) / math.sin(
            theta
        )
    lat = math.degrees(math.atan2(v[2], math.hypot(v[0], v[1])))
    lng = math.degrees(math.atan2(v[1], v[0]))
    return lat, lng


def test_gc_interpolate_matches_slerp(spark):
    from gos2_spark.spark.functions import gc_interpolate

    rng = random.Random(5)
    rows = [
        (
            rng.uniform(-80, 80),
            rng.uniform(-179, 179),
            rng.uniform(-80, 80),
            rng.uniform(-179, 179),
            rng.random(),
        )
        for _ in range(100)
    ]
    df = spark.createDataFrame(
        rows, "lat1 double, lng1 double, lat2 double, lng2 double, f double"
    )
    out = df.select(
        gc_interpolate(
            F.col("lat1"), F.col("lng1"), F.col("lat2"), F.col("lng2"), F.col("f")
        ).alias("p")
    ).collect()
    for row, r in zip(rows, out):
        wlat, wlng = _ref_slerp(*row)
        assert r["p"]["lat"] == pytest.approx(wlat, abs=1e-9)
        assert r["p"]["lng"] == pytest.approx(wlng, abs=1e-9)


def test_gc_interpolate_endpoints_and_degenerate(spark):
    from gos2_spark.spark.functions import gc_interpolate

    df = spark.createDataFrame(
        [
            (10.0, 20.0, -30.0, 140.0, 0.0),
            (10.0, 20.0, -30.0, 140.0, 1.0),
            (10.0, 20.0, 10.0, 20.0, 0.5),  # zero-length edge
        ],
        "lat1 double, lng1 double, lat2 double, lng2 double, f double",
    )
    out = df.select(
        gc_interpolate(
            F.col("lat1"), F.col("lng1"), F.col("lat2"), F.col("lng2"), F.col("f")
        ).alias("p")
    ).collect()
    assert out[0]["p"]["lat"] == pytest.approx(10.0, abs=1e-9)
    assert out[0]["p"]["lng"] == pytest.approx(20.0, abs=1e-9)
    assert out[1]["p"]["lat"] == pytest.approx(-30.0, abs=1e-9)
    assert out[1]["p"]["lng"] == pytest.approx(140.0, abs=1e-9)
    assert out[2]["p"]["lat"] == pytest.approx(10.0, abs=1e-9)
