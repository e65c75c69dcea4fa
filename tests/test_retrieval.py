"""pipeline/retrieval.py: inverted index + BM25 against hand-computed and
pure-python references (same integer-grid scoring, so equality is exact)."""

import math

import pytest
from pyspark.sql import Row


DOCS = [
    Row(doc_id=0, text="spark spark window agg join"),
    Row(doc_id=1, text="window window window table"),
    Row(doc_id=2, text="join table scan scan spark"),
    Row(doc_id=3, text="agg"),
    Row(doc_id=4, text="filter filter filter filter spark window"),
]


def _tokens(text):
    return [t for t in text.lower().split() if t]


class TestInvertedIndex:
    def test_postings_hand_computed(self, spark):
        from gos2_spark.pipeline.retrieval import inverted_index

        idx = {
            r["token"]: r
            for r in inverted_index(spark.createDataFrame(DOCS)).collect()
        }
        # 'spark': doc0 tf=2, doc2 tf=1, doc4 tf=1 -> head sorted tf desc, key asc
        assert idx["spark"]["df"] == 3
        assert idx["spark"]["cf"] == 4
        assert idx["spark"]["postings_head"] == "0:2,2:1,4:1"
        # 'window': doc1 tf=3 first, then doc0/doc4 tf=1 by key
        assert idx["window"]["postings_head"] == "1:3,0:1,4:1"
        assert idx["agg"]["df"] == 2 and idx["agg"]["cf"] == 2
        assert idx["filter"]["postings_head"] == "4:4"

    def test_head_k_bounds_output(self, spark):
        from gos2_spark.pipeline.retrieval import inverted_index

        docs = spark.createDataFrame(
            [Row(doc_id=i, text="common") for i in range(20)]
        )
        row = inverted_index(docs, head_k=3).collect()[0]
        assert row["df"] == 20
        assert row["postings_head"] == "0:1,1:1,2:1"


def _bm25_reference(docs, queries, k1=1.2, b=0.75, k=10):
    """Pure-python replay with the engine's grid trick and op order."""
    dl = {d.doc_id: len(_tokens(d.text)) for d in docs}
    n = len(docs)
    avgdl = float(sum(dl.values())) / float(n)
    tf = {}
    for d in docs:
        for t in _tokens(d.text):
            tf[(d.doc_id, t)] = tf.get((d.doc_id, t), 0) + 1
    out = {}
    for qid, text in queries:
        terms = sorted(set(_tokens(text)))
        scores = {}
        for t in terms:
            df = sum(1 for (doc, tt) in tf if tt == t)
            if df == 0:
                continue
            idf = math.log(1.0 + (float(n) - float(df) + 0.5) / (float(df) + 0.5))
            for d in docs:
                f = tf.get((d.doc_id, t))
                if not f:
                    continue
                tfn = (float(f) * (k1 + 1.0)) / (
                    float(f) + k1 * (1.0 - b + b * float(dl[d.doc_id]) / avgdl)
                )
                c = int(round(idf * tfn * 1e9))
                scores[d.doc_id] = scores.get(d.doc_id, 0) + c
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(i + 1, doc, s) for i, (doc, s) in enumerate(ranked)]
    return out


class TestBm25:
    def test_matches_pure_python_reference(self, spark):
        from gos2_spark.pipeline.retrieval import bm25_topk

        queries = [(1, "spark window"), (2, "filter agg unknownterm")]
        got = {}
        for r in bm25_topk(
            spark.createDataFrame(DOCS), queries, k=10
        ).collect():
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["key"], r["score_e9"])
            )
        want = _bm25_reference(DOCS, queries)
        for qid in want:
            assert sorted(got[qid]) == want[qid], qid

    def test_rank_deterministic_under_ties(self, spark):
        """Identical docs tie exactly on the integer grid; rank must break
        by doc key, invariant across partitionings."""
        from gos2_spark.pipeline.retrieval import bm25_topk

        docs = spark.createDataFrame(
            [Row(doc_id=i, text="alpha beta") for i in range(6)]
        )
        for parts in (1, 7):
            rows = bm25_topk(
                docs.repartition(parts), [(1, "alpha")], k=4
            ).collect()
            assert [(r["rank"], r["key"]) for r in sorted(rows)] == [
                (1, 0), (2, 1), (3, 2), (4, 3),
            ]

    def test_no_matching_terms_gives_empty(self, spark):
        from gos2_spark.pipeline.retrieval import bm25_topk

        assert (
            bm25_topk(
                spark.createDataFrame(DOCS), [(1, "zzz qqq")], k=5
            ).count()
            == 0
        )
