"""LLM-pipeline curation batch — embedding label outliers, unigram
perplexity gate, token fertility — against Python references."""

import math
import re
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_embedding_outliers_match_python(spark):
    rows = duckdb.sql(
        f"""SELECT vec_id, label, embedding
            FROM read_parquet('{SF_DIR}/embeddings.parquet')"""
    ).fetchall()
    per = defaultdict(list)
    for vid, lab, emb in rows:
        per[lab].append((vid, [float(x) for x in emb]))
    got = defaultdict(list)
    for r in entry.queries()["embedding_label_outliers"](spark, SF_DIR).collect():
        got[r["label"]].append((r["rank"], r["vec_id"], r["cosine"]))
    assert set(got) == set(per)
    for lab, vecs in per.items():
        n = len(vecs)
        cent = [
            sum(v[i] for _, v in vecs) / n for i in range(64)
        ]
        nc = math.sqrt(sum(c * c for c in cent))
        scored = []
        for vid, v in vecs:
            dot = sum(a * b for a, b in zip(v, cent))
            nv = math.sqrt(sum(a * a for a in v))
            scored.append((dot / (nv * nc), vid))
        scored.sort()
        want = scored[:3]
        assert [g[1] for g in sorted(got[lab])] == [w[1] for w in want]
        for (rank, vid, cosine), (wcos, wvid) in zip(sorted(got[lab]), want):
            assert abs(cosine - wcos) < 1e-7
            assert -1 - 1e-9 <= cosine <= 1 + 1e-9


def test_perplexity_gate_matches_python(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    corpus = Counter()
    per_doc = {}
    for did, src, text in docs:
        toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
        per_doc[did] = (src, Counter(toks))
        corpus.update(toks)
    t_total = sum(corpus.values())
    v = len(corpus)
    by_src = defaultdict(list)
    for did, (src, cnt) in sorted(per_doc.items()):
        if not cnt:
            continue
        nd = sum(cnt.values())
        ll = sum(
            n * math.log((corpus[w] + 1) / (t_total + v))
            for w, n in cnt.items()
        )
        by_src[src].append(math.exp(-ll / nd))
    got = {r["source"]: r for r in entry.queries()["perplexity_gate"](spark, SF_DIR).collect()}
    assert set(got) == set(by_src)
    for src, pps in by_src.items():
        r = got[src]
        assert r["n_docs"] == len(pps)
        assert r["n_flagged"] == sum(1 for p in pps if p > 800.0)
        assert abs(r["mean_pp"] - sum(pps) / len(pps)) < 1e-5
        assert r["mean_pp"] > 1.0


def test_token_fertility_matches_python(spark):
    docs = duckdb.sql(
        f"SELECT lang, n_chars, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    for lang, n_chars, text in docs:
        a = agg[lang]
        a[0] += 1
        a[1] += n_chars
        a[2] += len(pat.findall(text))
        a[3] += len(re.split(r"\s+", text.strip()))
    got = {r["lang"]: r for r in entry.queries()["token_fertility"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for lang, (nd, nc, nb, nw) in agg.items():
        r = got[lang]
        assert (r["n_docs"], r["total_chars"], r["total_bpe"], r["total_ws"]) == (
            nd, nc, nb, nw,
        )
        assert abs(r["chars_per_bpe"] - nc / nb) < 1e-9
        assert abs(r["chars_per_ws"] - nc / nw) < 1e-9
        # BPE-ish splits at least as finely as whitespace
        assert r["chars_per_bpe"] <= r["chars_per_ws"]
