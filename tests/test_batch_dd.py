"""BH-FDR over Gi* and fightin' words — python references (scipy-free
normal SF via the same A&S polynomial, verified against erfc)."""

import math
from collections import Counter

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _sf(a):
    t = 1.0 / (1.0 + 0.2316419 * a)
    poly = t * (
        0.319381530
        + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
    )
    return math.exp(-(a * a) / 2.0) / 2.5066282746310002 * poly


def test_normal_sf_polynomial_accuracy():
    # A&S 26.2.17 claims |eps| < 7.5e-8 vs the true normal SF
    for a in (0.0, 0.5, 1.0, 1.645, 1.96, 2.5761, 3.5, 5.0):
        true = 0.5 * math.erfc(a / math.sqrt(2.0))
        assert abs(_sf(a) - true) < 7.5e-8


def test_fdr_step_up_semantics(spark):
    # sf0.01: the Gi* field needs enough occupied cells for nonzero
    # variance (sf0.001 degenerates to a single-count grid)
    sf = "/root/testdata/sf0.01"
    gi = {
        r["token"]: r["gi_star"]
        for r in entry.queries()["gistar_hotspots"](spark, sf).collect()
    }
    ps = sorted(
        (min(1.0, 2.0 * _sf(abs(z))), tok) for tok, z in gi.items()
    )
    m = len(ps)
    kmax = 0
    for i, (p, _) in enumerate(ps, start=1):
        if p <= i * 0.05 / m:
            kmax = i
    got = entry.queries()["fdr_hotspots"](spark, sf).collect()
    assert len(got) == kmax
    want = {tok for _, tok in ps[:kmax]}
    assert {r["token"] for r in got} == want
    # every significant p is below the largest passing threshold's p
    if kmax:
        assert max(r["p_value"] for r in got) <= ps[kmax - 1][0] + 1e-9


def test_fightin_words_matches_python(spark):
    import re

    docs = duckdb.sql(
        f"SELECT lang, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    per = {}
    for lang, text in docs:
        per.setdefault(lang, Counter()).update(
            t for t in re.split(r"[^a-z]+", text.lower()) if t
        )
    corpus = Counter()
    for c in per.values():
        corpus.update(c)
    n_tot = sum(corpus.values())
    got = {}
    for r in entry.queries()["fightin_words"](spark, SF_DIR).collect():
        got.setdefault(r["lang"], []).append((r["rank"], r["tok"], r["log_odds_z"]))
    for lang, cnt in per.items():
        n_l = sum(cnt.values())
        scored = []
        for tok, cc in corpus.items():
            c = cnt.get(tok, 0)
            alpha = 1000.0 * cc / n_tot
            y1 = c + alpha
            d1 = n_l + 1000.0 - y1
            c_rest = cc - c
            y2 = c_rest + alpha
            d2 = (n_tot - n_l) + 1000.0 - y2
            z = (math.log(y1 / d1) - math.log(y2 / d2)) / math.sqrt(
                1.0 / y1 + 1.0 / y2
            )
            if c > 0:  # engine only scores (lang, tok) pairs that occur
                scored.append((-z, tok))
        scored.sort()
        top = [(i + 1, tok, -negz) for i, (negz, tok) in enumerate(scored[:10])]
        for (rank, tok, z), (grank, gtok, gz) in zip(top, sorted(got[lang])):
            assert (rank, tok) == (grank, gtok)
            assert abs(z - gz) < 1e-7
        # the #1 term should be genuinely distinctive
        assert top[0][2] > 0
