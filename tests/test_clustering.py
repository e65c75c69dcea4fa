"""DBSCAN composition vs a brute-force reference with the same
deterministic rules (min-label clusters, min-core-neighbor borders)."""

import math

import numpy as np
import pytest


def _unit(lat, lng):
    rlat, rlng = np.radians(lat), np.radians(lng)
    return np.column_stack(
        [np.cos(rlng) * np.cos(rlat), np.sin(rlng) * np.cos(rlat), np.sin(rlat)]
    )


def _angle_matrix(v):
    cross = np.linalg.norm(np.cross(v[:, None, :], v[None, :, :]), axis=2)
    return np.arctan2(cross, v @ v.T)


def _ref_dbscan(keys, lat, lng, eps_deg, min_pts):
    """Brute-force replay: eps-graph, degree cores, min-label BFS over
    core-core edges, min-core-neighbor border adoption."""
    v = _unit(lat, lng)
    ang = _angle_matrix(v)
    n = len(keys)
    nbr = (ang <= math.radians(eps_deg)) & ~np.eye(n, dtype=bool)
    deg = nbr.sum(axis=1)
    is_core = deg >= min_pts - 1
    # components over core-core edges
    label = {}
    for i in np.argsort(keys):
        if not is_core[i] or keys[i] in label:
            continue
        stack, comp = [i], []
        seen = {i}
        while stack:
            j = stack.pop()
            comp.append(j)
            for k in np.nonzero(nbr[j] & is_core)[0]:
                if k not in seen:
                    seen.add(k)
                    stack.append(k)
        lab = min(keys[j] for j in comp)
        for j in comp:
            label[keys[j]] = lab
    out = {}
    for i in range(n):
        if is_core[i]:
            out[keys[i]] = ("core", label[keys[i]])
        else:
            core_nbr_labels = [label[keys[j]] for j in np.nonzero(nbr[i] & is_core)[0]]
            if core_nbr_labels:
                out[keys[i]] = ("border", min(core_nbr_labels))
            else:
                out[keys[i]] = ("noise", None)
    return out


def _to_df(spark, keys, lat, lng):
    from pyspark.sql import functions as F

    from gos2_spark.spark.functions import s2_cellid

    rows = [(int(k), float(la), float(ln)) for k, la, ln in zip(keys, lat, lng)]
    df = spark.createDataFrame(rows, "key long, lat double, lng double")
    return df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))


def test_dbscan_matches_bruteforce(spark):
    from gos2_spark.spark.clustering import dbscan

    rng = np.random.default_rng(5)
    # three planted tight clusters + scattered noise
    lat, lng, keys = [], [], []
    k = 0
    for clat, clng, m in [(40.0, -74.0, 12), (-33.0, 151.0, 8), (51.0, 0.0, 6)]:
        for _ in range(m):
            lat.append(clat + rng.uniform(-0.4, 0.4))
            lng.append(clng + rng.uniform(-0.4, 0.4))
            keys.append(k)
            k += 1
    for _ in range(15):
        lat.append(rng.uniform(-75, 75))
        lng.append(rng.uniform(-170, 170))
        keys.append(k)
        k += 1
    keys, lat, lng = np.array(keys), np.array(lat), np.array(lng)
    eps, min_pts = 1.0, 4
    ref = _ref_dbscan(keys, lat, lng, eps, min_pts)
    got = {
        r["key"]: (r["role"], r["cluster"])
        for r in dbscan(_to_df(spark, keys, lat, lng), eps, min_pts).collect()
    }
    assert got == ref
    roles = [v[0] for v in got.values()]
    assert roles.count("core") >= 20 and roles.count("noise") >= 10


def test_dbscan_min_pts_one_all_core_singletons(spark):
    from gos2_spark.spark.clustering import dbscan

    keys = np.array([3, 7, 11])
    lat = np.array([0.0, 45.0, -45.0])
    lng = np.array([0.0, 90.0, -90.0])
    got = {
        r["key"]: (r["role"], r["cluster"])
        for r in dbscan(_to_df(spark, keys, lat, lng), 1.0, 1).collect()
    }
    assert got == {3: ("core", 3), 7: ("core", 7), 11: ("core", 11)}


def test_dbscan_all_noise(spark):
    from gos2_spark.spark.clustering import dbscan

    keys = np.array([1, 2, 3, 4])
    lat = np.array([0.0, 30.0, -30.0, 60.0])
    lng = np.array([0.0, 100.0, -100.0, 170.0])
    got = dbscan(_to_df(spark, keys, lat, lng), 1.0, 3).collect()
    assert {r["role"] for r in got} == {"noise"}
    assert all(r["cluster"] is None for r in got)
