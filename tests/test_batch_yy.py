"""MinHash audit pair + readability — independent Python references
(from-scratch shingle/Jaccard; datasketch-free MinHash property checks)."""

import math
import re
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _shingle_sets():
    docs = duckdb.sql(
        f"""SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE doc_id < 500"""
    ).fetchall()
    out = {}
    for did, text in docs:
        toks = text.strip().split()
        if len(toks) >= 5:
            sh = {" ".join(toks[i:i + 5]) for i in range(len(toks) - 4)}
        else:
            sh = {text}
        out[did] = sh
    return out


def test_minhash_fidelity_matches_exact_jaccard(spark):
    sets = _shingle_sets()
    rows = entry.queries()["minhash_fidelity"](spark, SF_DIR).collect()
    assert rows
    errs = []
    for r in rows:
        a, b = sets[r["key_a"]], sets[r["key_b"]]
        inter = len(a & b)
        exact = inter / len(a | b) if inter else 0.0
        assert abs(r["exact_j"] - exact) < 1e-9
        assert 0 <= r["est_j"] <= 1
        assert abs(r["abs_err"] - abs(r["est_j"] - exact)) < 1e-8
        errs.append(r["abs_err"])
    # 64-perm MinHash over LSH candidates: mean abs error well under 0.25
    assert sum(errs) / len(errs) < 0.25


def test_lsh_recall_audit_matches_brute(spark):
    sets = _shingle_sets()
    keys = sorted(sets)
    truth = set()
    for i, ka in enumerate(keys):
        for kb in keys[i + 1:]:
            inter = len(sets[ka] & sets[kb])
            if inter and inter / len(sets[ka] | sets[kb]) >= 0.5:
                truth.add((ka, kb))
    cands = {
        (r["key_a"], r["key_b"])
        for r in entry.queries()["minhash_fidelity"](spark, SF_DIR).collect()
    }
    r = entry.queries()["lsh_recall_audit"](spark, SF_DIR).collect()[0]
    assert r["n_true_pairs"] == len(truth)
    assert r["n_candidates"] == len(cands)
    assert r["n_hits"] == len(truth & cands)
    if truth:
        assert abs(r["recall"] - len(truth & cands) / len(truth)) < 1e-9
    # banded LSH at 16 bands x 4 rows catches >= 80% of J >= 0.5 pairs
    assert r["recall"] >= 0.8


def test_readability_matches_python(spark):
    docs = duckdb.sql(
        f"SELECT lang, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for lang, text in docs:
        s = sum(1 for x in re.split(r"[.!?]+", text) if x.strip())
        w = len(re.split(r"\s+", text.strip()))
        y = len(re.findall(r"[aeiouy]+", text.lower()))
        a = agg[lang]
        a[0] += 1
        a[1] += s
        a[2] += w
        a[3] += y
    got = {r["lang"]: r for r in entry.queries()["readability_scores"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for lang, (nd, ts, tw, ty) in agg.items():
        r = got[lang]
        assert (r["n_docs"], r["n_sentences"], r["n_words"], r["n_syllables"]) == (
            nd, ts, tw, ty,
        )
        wps, spw = tw / ts, ty / tw
        assert abs(r["flesch_ease"] - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-7
        assert abs(r["fk_grade"] - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-7
