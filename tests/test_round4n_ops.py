"""Fourteenth round-4 operator batch: ST-DBSCAN and per-cell term
affinity (geo-text PMI)."""

import math
import random
from collections import defaultdict

from pyspark.sql import functions as F

import __spark_entry__ as entry


def _points_ts(spark, rows):
    """rows: (key, lat, lng, epoch_us)."""
    from gos2_spark.spark.functions import s2_cellid

    df = spark.createDataFrame(
        rows, "key long, lat double, lng double, us long"
    )
    return df.select(
        "key", "lat", "lng",
        F.timestamp_micros(F.col("us")).alias("ts"),
    ).withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))


def test_st_dbscan_splits_time_separated_bursts(spark):
    """Two dense bursts at the SAME location a month apart: plain DBSCAN
    sees one cluster, ST-DBSCAN two — the defining behavior."""
    from gos2_spark.spark.clustering import dbscan, st_dbscan

    day = 86_400_000_000
    rows = []
    for i in range(6):  # burst 1: day 0..0.5
        rows.append((i, 10.0 + i * 1e-3, 10.0, i * day // 12))
    for i in range(6):  # burst 2: day 30
        rows.append((10 + i, 10.0 + i * 1e-3, 10.0, 30 * day + i * day // 12))
    pts = _points_ts(spark, rows)
    plain = dbscan(pts, eps_deg=1.0, min_pts=3, point_key="key").collect()
    st = st_dbscan(
        pts, eps_deg=1.0, eps_time_sec=3 * 86400, min_pts=3, point_key="key"
    ).collect()
    assert len({r["cluster"] for r in plain if r["cluster"] is not None}) == 1
    st_clusters = {r["cluster"] for r in st if r["cluster"] is not None}
    assert len(st_clusters) == 2
    # membership respects the bursts
    lab = {r["key"]: r["cluster"] for r in st}
    assert len({lab[i] for i in range(6)}) == 1
    assert len({lab[10 + i] for i in range(6)}) == 1
    assert lab[0] != lab[10]


def test_st_dbscan_matches_python_union_find(spark):
    from gos2_spark.spark.clustering import st_dbscan

    rng = random.Random(23)
    day = 86_400_000_000
    rows = [
        (
            i,
            rng.uniform(0.0, 12.0),
            rng.uniform(0.0, 12.0),
            rng.randrange(0, 20 * day),
        )
        for i in range(60)
    ]
    eps_deg, eps_t, min_pts = 3.0, 4 * 86400, 3
    got = {
        r["key"]: (r["role"], r["cluster"])
        for r in st_dbscan(
            _points_ts(spark, rows),
            eps_deg=eps_deg,
            eps_time_sec=eps_t,
            min_pts=min_pts,
            point_key="key",
        ).collect()
    }

    def ang(a, b):
        (la, ga), (lb, gb) = a, b
        r1, l1, r2, l2 = map(math.radians, (la, ga, lb, gb))
        va = (math.cos(l1) * math.cos(r1), math.sin(l1) * math.cos(r1), math.sin(r1))
        vb = (math.cos(l2) * math.cos(r2), math.sin(l2) * math.cos(r2), math.sin(r2))
        cx = va[1] * vb[2] - va[2] * vb[1]
        cy = va[2] * vb[0] - va[0] * vb[2]
        cz = va[0] * vb[1] - va[1] * vb[0]
        return math.atan2(
            math.sqrt(cx * cx + cy * cy + cz * cz),
            va[0] * vb[0] + va[1] * vb[1] + va[2] * vb[2],
        )

    nbrs = defaultdict(set)
    for i, (ki, lai, lgi, ti) in enumerate(rows):
        for kj, laj, lgj, tj in rows[i + 1:]:
            if abs(ti - tj) <= eps_t * 1_000_000 and ang(
                (lai, lgi), (laj, lgj)
            ) <= math.radians(eps_deg):
                nbrs[ki].add(kj)
                nbrs[kj].add(ki)
    core = {k for k, _, _, _ in rows if len(nbrs[k]) >= min_pts - 1}
    parent = {k: k for k in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in core:
        for b in nbrs[a]:
            if b in core:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = defaultdict(set)
    for a in core:
        comp[find(a)].add(a)
    lab = {}
    for root, members in comp.items():
        m = min(members)
        for a in members:
            lab[a] = m
    for k, _, _, _ in rows:
        if k in core:
            assert got[k] == ("core", lab[k]), k
        else:
            cn = [lab[b] for b in nbrs[k] if b in core]
            if cn:
                assert got[k] == ("border", min(cn)), k
            else:
                assert got[k] == ("noise", None), k


def test_cell_term_affinity_pmi_identity_and_filter(spark):
    """Every output row satisfies the PMI identity from its own counts,
    the n_tc >= 5 support floor holds, and marginals are consistent
    (n_tc <= min(n_t, n_c) <= N)."""
    rows = entry.queries()["cell_term_affinity"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    # N is recoverable: sum of n_tc over all (cell, token) pairs <= N and
    # for any row N = n_tc * exp(-pmi)... use the identity directly
    for r in rows:
        assert r["n_tc"] >= 5
        assert r["n_tc"] <= r["n_t"] and r["n_tc"] <= r["n_c"]
        n_all = (
            math.exp(r["pmi"]) * r["n_t"] * r["n_c"] / r["n_tc"]
        )
        # pmi was rounded to 9 digits; N must land on an integer
        assert abs(n_all - round(n_all)) < 1e-3, r
    # distinctive terms exist: some rows over-index (pmi > 0)
    assert any(r["pmi"] > 0 for r in rows)
