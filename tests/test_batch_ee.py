"""Log-rank test, rich-club coefficient, Dunning G2 — python references."""

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_logrank_identities(spark):
    r = entry.queries()["log_rank_test"](spark, SF_DIR).collect()[0]
    # O and E are both positive, chi2 consistent with (O-E)^2/V
    assert r["observed_arm1"] >= 0 and r["expected_arm1"] > 0
    if r["variance"] and r["variance"] > 0:
        want = (r["observed_arm1"] - r["expected_arm1"]) ** 2 / r["variance"]
        assert abs(r["logrank_chi2"] - want) < 1e-6


def test_logrank_python_replay(spark):
    from pyspark.sql import functions as F

    # independent replay: rebuild (arm, t, d) with Spark's own xxhash64
    # (the salt model), then compute the log-rank sums in python
    ev = duckdb.sql(
        f"""SELECT user_id, event_id,
                   epoch_us(ts - TIMESTAMP '1970-01-01 00:00:00') AS us,
                   event_type
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    users = sorted({u for u, _, _, t in ev if t == "click"})
    hdf = spark.createDataFrame([(u,) for u in users], "u long").select(
        "u",
        F.pmod(F.xxhash64(F.concat(F.col("u").cast("string"), F.lit("#lr"))), F.lit(2)).alias("arm"),
    )
    arm = {r["u"]: r["arm"] for r in hdf.collect()}
    horizon = max(us for _, _, us, _ in ev)
    per = defaultdict(list)
    for u, eid, us, t in ev:
        if t == "click":
            per[u].append((us, eid))
    subjects = []
    for u, rows in per.items():
        rows.sort()
        if len(rows) >= 2:
            t_ = (rows[1][0] - rows[0][0]) // 86_400_000_000 + 1
            subjects.append((arm[u], t_, 1))
        else:
            t_ = (horizon - rows[0][0]) // 86_400_000_000 + 1
            subjects.append((arm[u], t_, 0))
    times = sorted({t for _, t, d in subjects if d})
    o1 = e1 = v = 0.0
    for t_ in times:
        n1 = sum(1 for a, tt, _ in subjects if a == 1 and tt >= t_)
        nt = sum(1 for _, tt, _ in subjects if tt >= t_)
        d1 = sum(1 for a, tt, d in subjects if a == 1 and tt == t_ and d)
        dt = sum(1 for _, tt, d in subjects if tt == t_ and d)
        o1 += d1
        e1 += dt * n1 / nt
        if nt > 1:
            v += dt * (n1 / nt) * (1 - n1 / nt) * (nt - dt) / (nt - 1)
    r = entry.queries()["log_rank_test"](spark, SF_DIR).collect()[0]
    assert r["observed_arm1"] == int(o1)
    assert abs(r["expected_arm1"] - e1) < 1e-7
    assert abs(r["variance"] - v) < 1e-7


def test_rich_club_matches_python(spark):
    ks = [
        r[0]
        for r in duckdb.sql(
            f"SELECT c_custkey FROM read_parquet('{SF_DIR}/customer.parquet')"
        ).fetchall()
    ]
    und = set()
    for c in ks:
        for mul, add in ((7, 3), (11, 5)):
            a, b = c % 64, (c * mul + add) % 64
            if a != b:
                und.add((min(a, b), max(a, b)))
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    got = {r["k"]: r for r in entry.queries()["rich_club_coefficient"](spark, SF_DIR).collect()}
    for k in range(max(deg.values())):
        nodes = [n for n, d in deg.items() if d > k]
        edges = sum(1 for a, b in und if deg[a] > k and deg[b] > k)
        r = got[k]
        assert r["n_nodes"] == len(nodes) and r["n_edges"] == edges
        if len(nodes) >= 2:
            phi = 2 * edges / (len(nodes) * (len(nodes) - 1))
            assert abs(r["phi"] - phi) < 1e-9
        else:
            assert r["phi"] is None
    # phi is monotone-ish toward density 1 only for true rich clubs; at
    # minimum it is within [0, 1]
    for r in got.values():
        if r["phi"] is not None:
            assert -1e-9 <= r["phi"] <= 1 + 1e-9


def test_dunning_matches_python(spark):
    import re

    docs = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    bg = Counter()
    for (text,) in docs:
        toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
        if len(toks) >= 2:
            bg.update(zip(toks, toks[1:]))
    c1 = Counter()
    c2 = Counter()
    for (a, b), c in bg.items():
        c1[a] += c
        c2[b] += c
    nn = sum(bg.values())

    def g2(a, b):
        o = [
            bg[(a, b)],
            c1[a] - bg[(a, b)],
            c2[b] - bg[(a, b)],
            nn - c1[a] - c2[b] + bg[(a, b)],
        ]
        e = [
            c1[a] * c2[b] / nn,
            c1[a] * (nn - c2[b]) / nn,
            (nn - c1[a]) * c2[b] / nn,
            (nn - c1[a]) * (nn - c2[b]) / nn,
        ]
        return 2 * sum(oo * math.log(oo / ee) for oo, ee in zip(o, e) if oo > 0)

    ranked = sorted(
        ((-g2(a, b), a, b) for (a, b), c in bg.items() if c >= 5),
    )[:20]
    got = entry.queries()["dunning_g2_bigrams"](spark, SF_DIR).collect()
    assert len(got) == min(20, len(ranked))
    for (negg, a, b), r in zip(ranked, got):
        assert (r["w1"], r["w2"]) == (a, b)
        assert abs(r["g2"] + negg) < 1e-6
        assert r["g2"] >= 0
