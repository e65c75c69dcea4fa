"""Twelfth round-4 operator batch: exact shingle containment join and
TextRank keyword scoring."""

import random
import re

from pyspark.sql import functions as F


def _shingles(text, k=5):
    toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
    return {
        " ".join(toks[i: i + k]) for i in range(len(toks) - k + 1)
    }


def test_containment_matches_brute_replay_and_is_directed(spark):
    from gos2_spark.pipeline.dedup import containment_join

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    docs = [
        (0, base),                                  # contained in 1
        (1, base + " sierra tango uniform victor whiskey xray yankee"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "completely different words entirely unrelated tokens here "
            "nothing shared with others at all whatsoever believe me"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["key_a"], r["key_b"]): r
        for r in containment_join(df, threshold=0.8, shingle_k=5).collect()
    }
    sh = {d: _shingles(t) for d, t in docs}
    want = {}
    for a in sh:
        for b in sh:
            if a == b or not sh[a]:
                continue
            inter = len(sh[a] & sh[b])
            if inter >= 0.8 * len(sh[a]):
                want[(a, b)] = (inter, len(sh[a]))
    assert set(got) == set(want)
    for k_, (inter, sz) in want.items():
        assert got[k_]["inter"] == inter
        assert got[k_]["sz_a"] == sz
        assert abs(got[k_]["containment"] - inter / sz) < 1e-9
    # asymmetry: 0 is inside 1, but 1 is NOT 80% inside 0
    assert (0, 1) in got and (1, 0) not in got


def test_containment_prefix_filter_no_false_negatives(spark):
    """Random overlapping docs: the prefix-filtered engine answer equals
    the brute python answer exactly (the PPJoin-adaptation guarantee)."""
    from gos2_spark.pipeline.dedup import containment_join

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for d in range(25):
        n = rng.randint(6, 20)
        docs.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t = 0.6
    got = {
        (r["key_a"], r["key_b"]): r["inter"]
        for r in containment_join(df, threshold=t, shingle_k=3).collect()
    }
    sh = {d: _shingles(x, k=3) for d, x in docs}
    want = {
        (a, b): len(sh[a] & sh[b])
        for a in sh
        for b in sh
        if a != b and sh[a] and len(sh[a] & sh[b]) >= t * len(sh[a])
    }
    assert got == want


def _pagerank_ref(edges, iters=3, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    out = {}
    for a, b in edges:
        out.setdefault(a, set()).add(b)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        flowed = 0.0
        for a, succ in out.items():
            w = rank[a] / len(succ)
            for b in succ:
                contrib[b] += w
            flowed += rank[a]
        rank = {
            v: (1 - d) / n + (d / n) * (1.0 - flowed) + d * contrib[v]
            for v in nodes
        }
    return rank


def test_textrank_hub_word_wins_and_mass_conserved(spark):
    """A word adjacent to every other ranks first; total rank mass stays
    ~1 (dangling-free symmetric graph); ranks match a python power-
    iteration replay on the same bigram graph."""
    from gos2_spark.pipeline.graph import pagerank

    texts = [
        "hub alpha hub bravo hub charlie hub delta",
        "echo hub foxtrot hub golf",
        "alpha bravo",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    arr = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z]+"),
        lambda t: F.length(t) > 0,
    )
    toks = df.select(arr.alias("l")).where(F.size("l") >= 2)
    bi = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("l", 1, F.size("l") - 1).alias("w1"),
                F.slice("l", 2, F.size("l") - 1).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    edges = bi.where(F.col("w1") != F.col("w2")).unionByName(
        bi.select(F.col("w2").alias("w1"), F.col("w1").alias("w2")).where(
            F.col("w1") != F.col("w2")
        )
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, iterations=3, damping=0.85, src_col="w1", dst_col="w2"
        ).collect()
    }
    e = set()
    for t in texts:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            if a != b:
                e.add((a, b))
                e.add((b, a))
    want = _pagerank_ref(sorted(e))
    assert set(got) == set(want)
    for w, r in want.items():
        assert abs(got[w] - r) < 1e-9, w
    assert max(got, key=got.get) == "hub"
    assert abs(sum(got.values()) - 1.0) < 1e-6
