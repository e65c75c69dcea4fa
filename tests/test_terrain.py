"""Terrain statistics driver query (TRI/TPI/roughness on the S2 grid):
python replay of the hash-elevation surface through the numpy kernels."""

import numpy as np

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _spark_xxhash64(spark, strings):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h")).collect()
    return {r["s"]: r["h"] for r in rows}


def test_terrain_matches_kernel_replay(spark):
    from gos2_spark.kernels import hilbert as H
    from gos2_spark.kernels import projection as PJ

    rows = entry.queries()["terrain_stats"](spark, SF_DIR).collect()
    assert len(rows) > 0
    toks = [r["token"] for r in rows]

    # all tokens + their 4 neighbors, hashed via Spark's own xxhash64
    ids = H.from_token(np.array(toks, dtype=object))
    nbrs = PJ.edge_neighbors(ids)  # shape (4n,) or (n,4)
    nbrs = np.asarray(nbrs).reshape(len(toks), 4)
    all_toks = set(toks)
    nb_tok = {}
    for t, row in zip(toks, nbrs):
        nb_tok[t] = list(H.to_token(row.astype(np.uint64)))
        all_toks.update(nb_tok[t])
    hmap = _spark_xxhash64(spark, sorted(all_toks))
    elev = {t: hmap[t] % 4000 for t in all_toks}

    for r in rows:
        t = r["token"]
        e = elev[t]
        nes = [elev[x] for x in nb_tok[t]]
        assert r["elev"] == e
        assert abs(r["tri"] - sum(abs(x - e) for x in nes) / 4.0) < 1e-9
        assert abs(r["tpi"] - (e - sum(nes) / 4.0)) < 1e-9
        assert r["roughness"] == max(nes + [e]) - min(nes + [e])


def test_terrain_identities(spark):
    rows = entry.queries()["terrain_stats"](spark, SF_DIR).collect()
    for r in rows:
        # |TPI| <= TRI (triangle inequality on the 4 diffs)
        assert abs(r["tpi"]) <= r["tri"] + 1e-9
        # roughness bounds every individual diff, so TRI <= roughness
        assert r["tri"] <= r["roughness"] + 1e-9
        assert 0 <= r["elev"] < 4000
