"""Seventh round-4 operator batch vs independent pure-python replays:
importance resampling, n-gram novelty, quadrat VMR, k-truss peel,
graph mixing stats (reciprocity + assortativity)."""

import math
import random
from itertools import combinations

from pyspark.sql import functions as F


def test_importance_resample_deterministic_and_correct(spark):
    from gos2_spark.pipeline.pack import importance_resample

    rows = [(i, 100 + (i * 37) % 500) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    w = F.col("n_chars").cast("double") / F.lit(300.0)
    kept1 = {r["doc_id"] for r in importance_resample(df, w).collect()}
    # reshuffled input -> identical kept set (membership is key-pure)
    kept2 = {
        r["doc_id"]
        for r in importance_resample(df.repartition(7), w).collect()
    }
    assert kept1 == kept2
    # replay the gate from Spark's own hashes
    hs = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", F.xxhash64(F.col("doc_id").cast("string")).alias("h")
        ).collect()
    }
    ref = set()
    for i, nc in rows:
        wv = max(0.0, min(1.0, nc / 300.0))
        bucket = hs[i] % 1_000_000
        if bucket < 0:
            bucket += 1_000_000
        if bucket < int(wv * 1_000_000.0):
            ref.add(i)
    assert kept1 == ref
    # weight 1.0 keeps everything; weight 0.0 keeps nothing
    assert importance_resample(df, F.lit(1.0)).count() == len(rows)
    assert importance_resample(df, F.lit(0.0)).count() == 0


def test_ngram_novelty_matches_reference(spark):
    from gos2_spark.pipeline.text import ngram_novelty

    docs = [
        (1, "a b c d e f"),          # all grams first
        (2, "a b c d e x"),          # shares the 'a b c' trigram
        (3, "a b c d e f g"),        # repeats doc 1's grams + one new
        (4, "short text"),            # too short for n=3... has 0 trigrams? no: 2 tokens -> drops
        (5, "z z z z z"),             # one distinct gram, novel
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n = 3
    got = {
        r["key"]: (r["n_grams"], r["n_novel"], r["novelty_rate"])
        for r in ngram_novelty(df, n=n).collect()
    }
    # reference
    toks = {d: t.split() for d, t in docs}
    grams = {
        d: {" ".join(v[i:i + n]) for i in range(len(v) - n + 1)}
        for d, v in toks.items() if len(v) >= n
    }
    first = {}
    for d in sorted(grams):
        for g in grams[d]:
            first.setdefault(g, d)
    ref = {}
    for d, gs in grams.items():
        novel = sum(1 for g in gs if first[g] == d)
        ref[d] = (len(gs), novel, round(novel / len(gs), 9))
    assert got == ref
    assert 4 not in got  # 2 tokens < n drops entirely
    assert got[5] == (1, 1, 1.0)


def test_quadrat_vmr_reference_and_csr_direction(spark):
    from gos2_spark.spark.spatialstats import quadrat_vmr
    from gos2_spark.spark.hexgrid import hex_axial

    rng = random.Random(71)
    # clustered: all points in a tight blob -> VMR >> 1
    blob = [(rng.uniform(9.9, 10.1), rng.uniform(19.9, 20.1)) for _ in range(300)]
    # add one far point so the bounding box holds many empty quadrats
    blob.append((30.0, 60.0))
    df = spark.createDataFrame(blob, "lat double, lng double")
    row = quadrat_vmr(df, size=0.5).collect()[0]
    # replay from the engine's own hex assignment (the hex op itself is
    # oracle-checked elsewhere; here we verify the VMR algebra)
    cells = (
        df.select(*[c.alias(n) for c, n in
                    zip(hex_axial(F.col("lat"), F.col("lng"), 0.5), ("hq", "hr"))])
        .groupBy("hq", "hr").count().collect()
    )
    xs = [r["count"] for r in cells]
    qs = [r["hq"] for r in cells]
    rs = [r["hr"] for r in cells]
    q_cells = (max(qs) - min(qs) + 1) * (max(rs) - min(rs) + 1)
    n = sum(xs)
    sum_x2 = sum(x * x for x in xs)
    vmr = (q_cells * sum_x2 - n * n) / (q_cells * n)
    assert row["q_cells"] == q_cells
    assert row["n_points"] == n
    assert row["sum_x2"] == sum_x2
    assert math.isclose(row["vmr"], round(vmr, 9), rel_tol=1e-9)
    assert row["vmr"] > 5.0  # strongly clustered


def _ref_ktruss(edges, k, rounds):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}

    def support(es):
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {
            (a, b): len(adj.get(a, set()) & adj.get(b, set()))
            for a, b in es
        }

    for _ in range(rounds):
        sup = support(und)
        und = {e for e in und if sup[e] >= k - 2}
    sup = support(und)
    return {e: sup[e] for e in und}


def test_ktruss_matches_reference_peel(spark):
    from gos2_spark.pipeline.graph import ktruss_edges

    rng = random.Random(73)
    nodes = list(range(18))
    edges = {(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)}
    # plant a clique so a dense truss exists
    edges |= set(combinations([1, 2, 3, 4, 5], 2))
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    k, rounds = 4, 3
    got = {
        (r["a"], r["b"]): r["support"]
        for r in ktruss_edges(df, k=k, rounds=rounds).collect()
    }
    assert got == _ref_ktruss(edges, k, rounds)
    # the planted 5-clique survives k=4 (every edge in >= 3 triangles)
    for e in combinations([1, 2, 3, 4, 5], 2):
        assert e in got and got[e] >= 3


def test_graph_mixing_stats_reference(spark):
    from gos2_spark.pipeline.graph import graph_mixing_stats

    rng = random.Random(79)
    edges = {(rng.randint(0, 12), rng.randint(0, 12)) for _ in range(60)}
    edges |= {(1, 2), (2, 1), (3, 4), (4, 3)}  # guaranteed reciprocal pairs
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    row = graph_mixing_stats(df).collect()[0]
    e = {(s, d) for s, d in edges if s != d}
    m = len(e)
    n_recip = sum(1 for s, d in e if (d, s) in e)
    from collections import Counter

    od = Counter(s for s, _ in e)
    idg = Counter(d for _, d in e)
    du = [od[s] for s, d in e]
    dv = [idg[d] for s, d in e]
    sdu, sdv = sum(du), sum(dv)
    sdudv = sum(a * b for a, b in zip(du, dv))
    sdu2 = sum(a * a for a in du)
    sdv2 = sum(b * b for b in dv)
    cov = m * sdudv - sdu * sdv
    vu = m * sdu2 - sdu * sdu
    vv = m * sdv2 - sdv * sdv
    r = cov / math.sqrt(vu * vv) if vu > 0 and vv > 0 else 0.0
    assert (row["m"], row["n_recip"]) == (m, n_recip)
    assert (row["sum_du"], row["sum_dv"]) == (sdu, sdv)
    assert (row["sum_dudv"], row["sum_du2"], row["sum_dv2"]) == (
        sdudv, sdu2, sdv2,
    )
    assert math.isclose(row["reciprocity"], round(n_recip / m, 9), rel_tol=1e-12)
    assert math.isclose(row["assortativity"], round(r, 9), abs_tol=2e-9)
