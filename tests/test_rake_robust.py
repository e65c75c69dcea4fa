"""RAKE known-answer test (Rose et al. 2010 abstract) + Theil-Sen vs a
brute-force numpy reference."""

import numpy as np


def test_rake_classic_example(spark):
    """The canonical RAKE paper sample: 'linear constraints' and
    'linear diophantine equations' score among the top phrases."""
    from gos2_spark.pipeline.text import rake_keywords

    text = (
        "Compatibility of systems of linear constraints over the set of "
        "natural numbers. Criteria of compatibility of a system of linear "
        "Diophantine equations, strict inequations, and nonstrict "
        "inequations are considered. Upper bounds for components of a "
        "minimal set of solutions and algorithms of construction of "
        "minimal generating sets of solutions for all types of systems "
        "are given."
    )
    stop = [
        "of", "the", "a", "and", "for", "all", "are", "over", "set",
        "types", "given", "considered",
    ]
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = rake_keywords(docs, top_k=4, stopwords=stop).collect()
    phrases = [r.phrase for r in out]
    assert "minimal generating sets" in phrases or any(
        "linear diophantine equations" in p for p in phrases
    )
    # scores are monotone with rank
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    # every phrase is stopword-free
    for p in phrases:
        assert not any(w in stop for w in p.split())


def test_rake_degree_over_frequency(spark):
    """A word appearing in long phrases outranks a frequent lone word."""
    from gos2_spark.pipeline.text import rake_keywords

    text = "red apple pie and tea and tea and tea"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = rake_keywords(docs, top_k=2, stopwords=["and"]).collect()
    assert out[0].phrase == "red apple pie"  # deg 3+3+3 / freq 1 each = 9
    assert out[1].phrase == "tea" and out[1].n_occur == 3


def test_theil_sen_matches_numpy(spark):
    """Engine fold vs brute-force numpy median of pairwise slopes."""
    from pyspark.sql import functions as F
    import __spark_entry__ as e

    rng = np.random.default_rng(3)
    rows = []
    for uid in range(4):
        n = 25
        hours = np.sort(rng.choice(np.arange(100), size=n, replace=False))
        vals = 0.7 * hours + rng.normal(0, 5, n)
        vals[::7] += 100  # outliers Theil-Sen should shrug off
        rows += [
            (uid, int(h) * 3600000000, i, float(v))
            for i, (h, v) in enumerate(zip(hours, vals))
        ]
    df = spark.createDataFrame(
        rows, "user_id long, us long, event_id long, value double"
    )
    ev = df.select(
        "user_id",
        F.timestamp_micros("us").alias("ts"),
        "event_id",
        "value",
    )
    ev.createOrReplaceTempView("_ts_events")

    # drive the query body directly over a temp table
    import types

    fake_dir = "_unused"
    orig_load = e._load
    try:
        e._load = lambda spark, sf, name: spark.table("_ts_events")
        out = {r.user_id: r for r in e._q_theil_sen(spark, fake_dir).collect()}
    finally:
        e._load = orig_load

    for uid in range(4):
        sub = [(h, v) for u, husec, i, v in rows if u == uid
               for h in [husec // 3600000000]]
        slopes = []
        for i in range(len(sub)):
            for j in range(i + 1, len(sub)):
                if sub[j][0] != sub[i][0]:
                    slopes.append(
                        (sub[j][1] - sub[i][1]) / (sub[j][0] - sub[i][0])
                    )
        want = float(np.median(np.array(slopes)))
        got = out[uid].theil_sen_slope
        assert abs(got - want) < 1e-6, (uid, got, want)
        # robust: near the true 0.7 despite planted +100 outliers
        assert 0.4 < got < 1.0
