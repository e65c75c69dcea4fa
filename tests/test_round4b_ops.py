"""Second round-4 operator batch, each vs an independent numpy /
pure-python replay (the DuckDB oracles replay the same SQL algebra, so
these catch algorithm bugs oracle and engine might share): hex binning,
Clark-Evans NN index, spatial k-anonymity, spatial entropy, co-travel
mining, co-citation, Kneser-Ney bigrams, Benford screen, 2-D skyline."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------------- hexbin
def _ref_hex(lat, lng, size):
    x = math.radians(lng)
    y = math.log(math.tan(math.radians(lat)) + 1.0 / math.cos(math.radians(lat)))
    qf = (0.5773502691896258 * x - y / 3.0) / size
    rf = (2.0 * y / 3.0) / size
    xf, zf = qf, rf
    yf = -qf - rf
    rx, ry, rz = (math.floor(v + 0.5) for v in (xf, yf, zf))
    dx, dy, dz = abs(rx - xf), abs(ry - yf), abs(rz - zf)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dy > dz:
        ry = -rx - rz
    else:
        rz = -rx - ry
    return int(rx), int(rz)


def test_hex_axial_matches_reference_replay(spark):
    from gos2_spark.spark.hexgrid import hex_axial

    rng = random.Random(7)
    rows = [
        (i, rng.uniform(-80.0, 80.0), rng.uniform(-179.9, 179.9))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "key long, lat double, lng double")
    hq, hr = hex_axial(F.col("lat"), F.col("lng"), 0.35)
    got = {
        r["key"]: (r["hq"], r["hr"])
        for r in df.select("key", hq.alias("hq"), hr.alias("hr")).collect()
    }
    for k, lat, lng in rows:
        assert got[k] == _ref_hex(lat, lng, 0.35), (k, lat, lng)


def test_hex_cube_invariant_and_locality(spark):
    """x + y + z == 0 after correction (y = -hq - hr is implied), and two
    points closer than the inradius land in the same or adjacent hex."""
    from gos2_spark.spark.hexgrid import hex_axial

    rng = random.Random(11)
    base = [(rng.uniform(-60, 60), rng.uniform(-170, 170)) for _ in range(200)]
    rows = []
    for i, (lat, lng) in enumerate(base):
        rows.append((2 * i, lat, lng))
        rows.append((2 * i + 1, lat + 1e-7, lng + 1e-7))
    df = spark.createDataFrame(rows, "key long, lat double, lng double")
    hq, hr = hex_axial(F.col("lat"), F.col("lng"), 0.35)
    got = {
        r["key"]: (r["hq"], r["hr"])
        for r in df.select("key", hq.alias("hq"), hr.alias("hr")).collect()
    }
    for i in range(200):
        a, b = got[2 * i], got[2 * i + 1]
        # hex-grid distance between nearly-identical points is 0 or 1
        dq, dr = b[0] - a[0], b[1] - a[1]
        dist = (abs(dq) + abs(dr) + abs(dq + dr)) // 2
        assert dist <= 1


# ----------------------------------------------------------- clark-evans
def test_clark_evans_matches_brute_force(spark):
    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.spatialstats import clark_evans

    rng = random.Random(3)
    rows = [
        (i, rng.uniform(-70, 70), rng.uniform(-170, 170)) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "key long, lat double, lng double")
    df = df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    out = clark_evans(df, point_key="key").collect()[0]

    lat = np.radians([r[1] for r in rows])
    lng = np.radians([r[2] for r in rows])
    x = np.cos(lat) * np.cos(lng)
    y = np.cos(lat) * np.sin(lng)
    z = np.sin(lat)
    p = np.stack([x, y, z], axis=1)
    dots = np.clip(p @ p.T, -1.0, 1.0)
    cross = np.linalg.norm(
        np.cross(p[:, None, :], p[None, :, :]), axis=2
    )
    ang = np.arctan2(cross, dots)
    np.fill_diagonal(ang, np.inf)
    nn = ang.min(axis=1)
    n = len(rows)
    mean_nn = nn.mean()
    expected = 0.5 / math.sqrt(n / (4.0 * math.pi))
    assert out["n_points"] == n
    assert out["mean_nn_rad"] == pytest.approx(mean_nn, rel=1e-6)
    assert out["r_index"] == pytest.approx(mean_nn / expected, rel=1e-6)


# ------------------------------------------------------------ k-anonymity
def test_k_anonymity_levels_engineered(spark):
    """9 points in one tight cluster (same level-12 cell at k=5 -> finest
    level wins) + 3 spread points that only anonymize coarser."""
    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.pages import s2_parent_sql
    from gos2_spark.spark.spatialstats import k_anonymity_levels

    rows = [(i, 40.0 + i * 1e-7, -74.0 + i * 1e-7) for i in range(9)]
    rows += [(100, 40.0, -73.0), (101, 40.5, -74.8), (102, 41.2, -73.7)]
    df = spark.createDataFrame(rows, "key long, lat double, lng double")
    df = df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    hist = {
        r["level"]: r["n_points"]
        for r in k_anonymity_levels(df, k=5, levels=(4, 6, 8, 10, 12)).collect()
    }
    # replay with the engine's own parent keys (independent of the join
    # plumbing under test): per point, max level whose ancestor holds >= 5
    pts = df.select(
        "key",
        *[s2_parent_sql(F.col("cell_id"), l).alias(f"l{l}") for l in (4, 6, 8, 10, 12)],
    ).collect()
    from collections import Counter, defaultdict

    per_level = defaultdict(Counter)
    for r in pts:
        for l in (4, 6, 8, 10, 12):
            per_level[l][r[f"l{l}"]] += 1
    want = Counter()
    for r in pts:
        best = -1
        for l in (4, 6, 8, 10, 12):
            if per_level[l][r[f"l{l}"]] >= 5:
                best = max(best, l)
        want[best] += 1
    assert hist == dict(want)
    # the 9-point cluster shares even the level-12 cell
    assert hist.get(12, 0) >= 9


# -------------------------------------------------------- spatial entropy
def test_spatial_entropy_degenerate_and_uniform(spark):
    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.spatialstats import spatial_entropy

    rows = [("one", 40.0, -74.0)] * 6
    rows += [("two", 40.0, -74.0)] * 3 + [("two", -33.9, 151.2)] * 3
    df = spark.createDataFrame(rows, "grp_in string, lat double, lng double")
    df = df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    out = {r["grp"]: r for r in spatial_entropy(df, "grp_in", level=4).collect()}
    assert out["one"]["entropy"] == 0.0
    assert out["one"]["effective_cells"] == 1.0
    assert out["two"]["entropy"] == pytest.approx(math.log(2.0), abs=1e-9)
    assert out["two"]["effective_cells"] == pytest.approx(2.0, abs=1e-9)


# ------------------------------------------------------------- co-travel
def test_cotravel_pairs_engineered(spark):
    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.temporal import cotravel_pairs

    # users 1 and 2 co-travel on days 0, 1, 2 (NYC); user 3 meets user 1
    # only on day 0 (below min_buckets); user 4 is elsewhere entirely.
    def ev(uid, day, lat, lng):
        return (uid, f"2024-01-0{day + 1} 12:00:00", lat, lng)

    rows = []
    for day in range(3):
        rows.append(ev(1, day, 40.7, -74.0))
        rows.append(ev(2, day, 40.71, -74.01))
    rows.append(ev(3, 0, 40.7, -74.0))
    rows.append(ev(4, 0, -33.9, 151.2))
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, lat double, lng double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    df = df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    out = {
        (r["user_a"], r["user_b"]): (r["n_buckets"], r["n_cells"])
        for r in cotravel_pairs(
            df, level=6, bucket_seconds=86400, min_buckets=2
        ).collect()
    }
    assert out == {(1, 2): (3, 1)}


def test_cotravel_dedups_visits(spark):
    """A user pinging 100x in one (cell, bucket) contributes ONE visit:
    pair bucket counts must not inflate."""
    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.temporal import cotravel_pairs

    rows = []
    for rep in range(100):
        rows.append((1, f"2024-01-01 {rep % 24:02d}:00:00", 40.7, -74.0))
    rows.append((2, "2024-01-01 05:00:00", 40.7, -74.0))
    rows.append((1, "2024-01-02 05:00:00", 40.7, -74.0))
    rows.append((2, "2024-01-02 06:00:00", 40.7, -74.0))
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, lat double, lng double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    df = df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    out = cotravel_pairs(
        df, level=6, bucket_seconds=86400, min_buckets=2
    ).collect()
    assert len(out) == 1
    assert out[0]["n_buckets"] == 2


# ------------------------------------------------------------ co-citation
def test_cocitation_counts_and_hub_cut(spark):
    from gos2_spark.pipeline.web import cocitation

    edges = [
        ("s1", "a"), ("s1", "b"), ("s1", "b"),  # duplicate edge dedups
        ("s2", "a"), ("s2", "b"), ("s2", "c"),
        ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"),
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    out = {
        (r["dst_a"], r["dst_b"]): r["n_cociting"]
        for r in cocitation(df, max_out_degree=3).collect()
    }
    # hub (degree 4) is cut; s1 co-cites {a,b}; s2 all three pairs
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


# ------------------------------------------------------------ kneser-ney
def test_kneser_ney_matches_reference_replay(spark):
    from gos2_spark.pipeline.retrieval import kneser_ney_bigrams

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): r
        for r in kneser_ney_bigrams(df, discount=0.75).collect()
    }

    from collections import Counter

    bigrams = Counter()
    for _, text in docs:
        toks = [t for t in text.lower().split() if t]
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
    c1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (a, b), c in bigrams.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    btypes = len(bigrams)
    d = 0.75
    for (a, b), c in bigrams.items():
        want = max(c - d, 0.0) / c1[a] + d * n1f[a] / c1[a] * n1b[b] / btypes
        row = got[(a, b)]
        assert row["c12"] == c
        assert row["c1"] == c1[a]
        assert row["n1f"] == n1f[a]
        assert row["n1b"] == n1b[b]
        assert row["p_kn"] == pytest.approx(want, rel=1e-9)
    assert set(got) == set(bigrams)
    # probabilities given each context sum to <= 1 (KN is a proper
    # distribution over the FULL vocab; observed bigrams undershoot)
    bysrc = Counter()
    for (a, b), r in got.items():
        bysrc[a] += r["p_kn"]
    assert all(v <= 1.0 + 1e-9 for v in bysrc.values())


# ---------------------------------------------------------------- benford
def test_benford_digit_stats(spark):
    from gos2_spark.spark.aggregates import benford_digit_stats

    vals = [1.0, 12.0, 19.9, 2.5, 250.0, 0.0034, 0.9, -5.0, 0.0, 900.1]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["digit"]: r for r in benford_digit_stats(df, "v").collect()}
    # -5 and 0 excluded -> 8 values; digits: 1,1,1,2,2,3,9,9
    assert sum(r["n"] for r in out.values()) == 8
    assert out[1]["n"] == 3
    assert out[2]["n"] == 2
    assert out[3]["n"] == 1
    assert out[9]["n"] == 2
    assert out[1]["expected_p"] == pytest.approx(math.log10(2.0), abs=1e-12)
    chi = out[1]["chi2_term"]
    obs = 3 / 8
    exp = math.log10(2.0)
    assert chi == pytest.approx(8 * (obs - exp) ** 2 / exp, abs=1e-6)


# ---------------------------------------------------------------- skyline
def _brute_skyline(pairs):
    out = []
    for p in pairs:
        dominated = any(
            q[0] >= p[0] and q[1] <= p[1] and (q[0] > p[0] or q[1] < p[1])
            for q in pairs
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_brute_force(spark):
    from gos2_spark.spark.skyline import skyline_2d

    rng = random.Random(13)
    rows = [(rng.randrange(0, 50), rng.randrange(0, 50)) for _ in range(400)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(7)
    got = sorted(
        (r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()
    )
    assert got == _brute_skyline(sorted(set(rows)))


def test_skyline_tie_counts_and_edge_cases(spark):
    from gos2_spark.spark.skyline import skyline_2d

    rows = [(10, 1), (10, 1), (10, 2), (9, 1), (11, 5), (11, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["n_tied"] for r in skyline_2d(df, "x", "y").collect()}
    # (10,1) beats (10,2) and (9,1); (11,5) survives (higher x)
    assert got == {(10, 1): 2, (11, 5): 2}
    one = spark.createDataFrame([(1, 1)], "x long, y long")
    assert skyline_2d(one, "x", "y").count() == 1


# -------------------------------------------------------------------- kde
def test_kde_points_matches_brute_force(spark):
    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.spatialstats import kde_points

    rng = random.Random(5)
    rows = [
        (i, rng.uniform(-60, 60), rng.uniform(-170, 170)) for i in range(150)
    ]
    # add a tight cluster so some points have many neighbors
    rows += [(200 + i, 10.0 + i * 0.01, 20.0 + i * 0.01) for i in range(30)]
    df = spark.createDataFrame(rows, "key long, lat double, lng double")
    df = df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    h, cutoff = 0.05, 0.15
    out = {r["key"]: r for r in kde_points(df, h, cutoff, point_key="key").collect()}

    lat = np.radians([r[1] for r in rows])
    lng = np.radians([r[2] for r in rows])
    p = np.stack(
        [np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng), np.sin(lat)],
        axis=1,
    )
    dots = np.clip(p @ p.T, -1, 1)
    cross = np.linalg.norm(np.cross(p[:, None, :], p[None, :, :]), axis=2)
    ang = np.arctan2(cross, dots)
    np.fill_diagonal(ang, np.inf)
    eff_radius = math.radians(cutoff * 180.0 / math.pi)
    keys = [r[0] for r in rows]
    for i, k in enumerate(keys):
        mask = ang[i] <= eff_radius
        want_n = int(mask.sum())
        want_d = float(np.exp(-(ang[i][mask] ** 2) / (2 * h * h)).sum())
        assert out[k]["n_neighbors"] == want_n, k
        assert out[k]["density"] == pytest.approx(want_d, abs=1e-6), k
    assert max(r["n_neighbors"] for r in out.values()) >= 29  # the cluster


# ------------------------------------------------------ rolling distinct
def test_rolling_distinct_users_replay(spark):
    import __spark_entry__ as entry

    out = entry.queries()["rolling_distinct_users"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").collect()
    from collections import defaultdict

    by_day = defaultdict(set)
    epoch = __import__("datetime").datetime(1970, 1, 1)
    for r in ev:
        day = int((r["ts"] - epoch).total_seconds() // 86400)
        by_day[day].add(r["user_id"])
    days = sorted(by_day)
    seen: set = set()
    for row in out:
        assert row["day_idx"] in by_day
        seen_before = len(seen)
        seen |= by_day[row["day_idx"]]
        assert row["n_new_users"] == len(seen) - seen_before
        assert row["cum_distinct_users"] == len(seen)
    assert [r["day_idx"] for r in out] == days


# ---------------------------------------------------------- path trigrams
def test_event_path_trigrams_replay(spark):
    import __spark_entry__ as entry

    out = entry.queries()["event_path_trigrams"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").collect()
    from collections import Counter, defaultdict

    seqs = defaultdict(list)
    epoch = __import__("datetime").datetime(1970, 1, 1)
    for r in ev:
        us = int((r["ts"] - epoch).total_seconds() * 1_000_000)
        seqs[r["user_id"]].append((us, r["event_id"], r["event_type"]))
    tri = Counter()
    users = defaultdict(set)
    for uid, evs in seqs.items():
        evs.sort()
        types = [t for _, _, t in evs]
        for a, b, c in zip(types, types[1:], types[2:]):
            tri[(a, b, c)] += 1
            users[(a, b, c)].add(uid)
    want = sorted(
        ((n, k) for k, n in tri.items()),
        key=lambda x: (-x[0], x[1]),
    )[:50]
    got = [((r["n"]), (r["t1"], r["t2"], r["t3"]), r["n_users"]) for r in out]
    for (wn, wk), (gn, gk, gu) in zip(want, got):
        assert (wn, wk) == (gn, gk)
        assert gu == len(users[wk])


# -------------------------------------------------------- gravity model
def test_gravity_residuals_fit_invariant(spark):
    """k is fit so that sum(expected) == sum(flow): residuals sum to ~0,
    and per-pair masses are consistent with the flow table."""
    import __spark_entry__ as entry

    rows = entry.queries()["gravity_residuals"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 10
    total_flow = sum(r["n_trips"] for r in rows)
    total_expected = sum(r["expected"] for r in rows)
    assert total_expected == pytest.approx(total_flow, rel=1e-4)
    assert sum(r["residual"] for r in rows) == pytest.approx(0.0, abs=1e-2)
    from collections import defaultdict

    m_o = defaultdict(int)
    for r in rows:
        m_o[r["o_cell4"]] += r["n_trips"]
    for r in rows:
        assert r["m_o"] == m_o[r["o_cell4"]]


# ---------------------------------------------------- cell density change
def test_cell_density_change_counts(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["cell_density_change"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    ev_n = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert sum(r["n1"] + r["n2"] for r in rows) == ev_n
    for r in rows:
        want = (r["n2"] - r["n1"]) / math.sqrt(r["n1"] + r["n2"])
        assert r["z_change"] == pytest.approx(want, abs=1e-9)
