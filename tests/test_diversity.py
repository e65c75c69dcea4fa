"""Lexical richness, Jensen-Shannon divergence, HHI driver queries —
python references and identities."""

import math
from collections import Counter

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _tokens(text):
    import re

    return [t for t in re.split(r"[^a-z]+", text.lower()) if t]


def test_lexical_richness_matches_python(spark):
    import duckdb

    docs = duckdb.sql(
        f"SELECT lang, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    per_lang = {}
    for lang, text in docs:
        per_lang.setdefault(lang, Counter()).update(_tokens(text))
    got = {
        r["lang"]: r
        for r in entry.queries()["lexical_richness"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per_lang)
    for lang, cnt in per_lang.items():
        n = sum(cnt.values())
        v = len(cnt)
        v1 = sum(1 for c in cnt.values() if c == 1)
        rep = sum(c * (c - 1) for c in cnt.values())
        r = got[lang]
        assert (r["n_tokens"], r["vocab"]) == (n, v)
        assert abs(r["ttr"] - v / n) < 1e-9
        assert abs(r["hapax_share"] - v1 / v) < 1e-9
        assert abs(r["simpson_d"] - rep / (n * (n - 1))) < 1e-9


def test_jsd_bounds_and_symmetric_zero(spark):
    rows = entry.queries()["js_divergence_langs"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        # JSD in nats is bounded by ln 2 and nonnegative
        assert -1e-9 <= r["jsd"] <= math.log(2) + 1e-9
        assert r["la"] < r["lb"]


def test_jsd_matches_python_reference(spark):
    import duckdb

    docs = duckdb.sql(
        f"SELECT lang, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    per = {}
    for lang, text in docs:
        per.setdefault(lang, Counter()).update(_tokens(text))
    langs = sorted(per)
    got = {
        (r["la"], r["lb"]): r["jsd"]
        for r in entry.queries()["js_divergence_langs"](spark, SF_DIR).collect()
    }
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            ca, cb = per[la], per[lb]
            na, nb = sum(ca.values()), sum(cb.values())
            js = 0.0
            for t in set(ca) | set(cb):
                pa, pb = ca.get(t, 0) / na, cb.get(t, 0) / nb
                m = (pa + pb) / 2
                if pa > 0:
                    js += 0.5 * pa * math.log(pa / m)
                if pb > 0:
                    js += 0.5 * pb * math.log(pb / m)
            assert abs(got[(la, lb)] - js) < 1e-7


def test_hhi_bounds_and_totals(spark):
    rows = entry.queries()["hhi_cells"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_types"] >= 1
        lo = 1.0 / r["n_types"]
        assert lo - 1e-9 <= r["hhi"] <= 1.0 + 1e-9
        if r["n_types"] == 1:
            assert abs(r["hhi"] - 1.0) < 1e-9
