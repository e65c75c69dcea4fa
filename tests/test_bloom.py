"""Distributed Bloom filter (pipeline/bloom.py): crawl-delta gating.

The filter is exact integer algebra on xxhash64, so every bit is
reproducible outside Spark: the reference model here rebuilds the word
table with tools/xxh64_model.py and asserts per-key probe parity,
including the no-false-negative guarantee.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from xxh64_model import xxh64_signed  # noqa: E402

from gos2_spark.pipeline.bloom import (  # noqa: E402
    WORD_BITS,
    bloom_build,
    bloom_probe,
)

M_BITS = 1024
G = 3


def _positions(key: str) -> list[int]:
    """Reference Kirsch-Mitzenmacher positions, pmod semantics."""
    h1 = xxh64_signed(key) % M_BITS
    h2 = xxh64_signed(key + "#2") % M_BITS
    return [(h1 + i * h2) % M_BITS for i in range(G)]


def _model_words(keys: list[str]) -> dict[int, int]:
    words: dict[int, int] = {}
    for k in keys:
        for p in _positions(k):
            words[p // WORD_BITS] = words.get(p // WORD_BITS, 0) | (
                1 << (p % WORD_BITS)
            )
    return words


def _model_probe(words: dict[int, int], key: str) -> bool:
    return all(
        words.get(p // WORD_BITS, 0) & (1 << (p % WORD_BITS)) for p in _positions(key)
    )


@pytest.fixture(scope="module")
def keys():
    old = [f"https://example.org/crawl1/{i}" for i in range(40)]
    new = [f"https://example.org/crawl2/{i}" for i in range(40)]
    return old, new


def test_build_matches_model(spark, keys):
    old, _ = keys
    df = spark.createDataFrame([(k,) for k in old], "url string")
    got = {
        r["word_idx"]: r["word"]
        for r in bloom_build(df, "url", M_BITS, G).collect()
    }
    assert got == _model_words(old)


def test_probe_parity_and_no_false_negatives(spark, keys):
    old, new = keys
    bloom = bloom_build(
        spark.createDataFrame([(k,) for k in old], "url string"), "url", M_BITS, G
    )
    probe_in = spark.createDataFrame(
        [(k, True) for k in old] + [(k, False) for k in new],
        "url string, is_old boolean",
    )
    got = {
        r["url"]: (r["is_old"], r["maybe_seen"])
        for r in bloom_probe(
            probe_in, bloom, "url", M_BITS, G, carry_cols=("is_old",)
        ).collect()
    }
    assert len(got) == len(old) + len(new)
    words = _model_words(old)
    for url, (is_old, maybe_seen) in got.items():
        assert maybe_seen == _model_probe(words, url), url
        if is_old:
            # Bloom guarantee: a key the filter was built from ALWAYS probes
            # positive — false negatives are impossible.
            assert maybe_seen, url


def test_sign_bit_never_set(spark, keys):
    """63-bit words keep the sign bit clear so the same masks work in any
    signed-int64 engine (DuckDB raises on BIGINT << 63)."""
    old, _ = keys
    df = spark.createDataFrame([(k,) for k in old], "url string")
    rows = bloom_build(df, "url", M_BITS, G).collect()
    assert rows and all(r["word"] >= 0 for r in rows)


def test_probe_no_python_stage(spark, keys):
    """Build + probe are pure Catalyst: no Python/pandas UDF anywhere in
    the plan (the gate must run at scan throughput at 10^12 keys)."""
    old, new = keys
    bloom = bloom_build(
        spark.createDataFrame([(k,) for k in old], "url string"), "url", M_BITS, G
    )
    probed = bloom_probe(
        spark.createDataFrame([(k,) for k in new], "url string"),
        bloom,
        "url",
        M_BITS,
        G,
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_probe_flat_equals_probe(spark, keys):
    """bloom_probe_flat (stateless g-broadcast-join path) must equal the
    explode+groupBy probe on every key."""
    from gos2_spark.pipeline.bloom import bloom_probe_flat

    old, new = keys
    bloom = bloom_build(
        spark.createDataFrame([(k,) for k in old], "url string"), "url", M_BITS, G
    )
    probe_in = spark.createDataFrame(
        [(k,) for k in old + new], "url string"
    )
    agg = {
        r["url"]: r["maybe_seen"]
        for r in bloom_probe(probe_in, bloom, "url", M_BITS, G).collect()
    }
    flat = {
        r["url"]: r["maybe_seen"]
        for r in bloom_probe_flat(probe_in, bloom, "url", M_BITS, G).collect()
    }
    assert flat == agg and len(flat) == len(old) + len(new)


def test_streaming_flat_probe_multi_batch(spark, keys, tmp_path):
    """The flat probe on a 4-micro-batch stream equals the batch probe:
    stream-static joins are stateless, so per-row results cannot depend
    on batching."""
    from gos2_spark.pipeline.bloom import bloom_probe_flat

    old, new = keys
    bloom = bloom_build(
        spark.createDataFrame([(k,) for k in old], "url string"), "url", M_BITS, G
    )
    src = str(tmp_path / "probe_src")
    spark.createDataFrame(
        [(k,) for k in old + new], "url string"
    ).repartition(4).write.parquet(src)
    sch = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        bloom_probe_flat(stream, bloom, "url", M_BITS, G)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("bloom_gate_mb")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None
    got = {
        r["url"]: r["maybe_seen"]
        for r in spark.table("bloom_gate_mb").collect()
    }
    batch = {
        r["url"]: r["maybe_seen"]
        for r in bloom_probe_flat(
            spark.read.parquet(src), bloom, "url", M_BITS, G
        ).collect()
    }
    assert got == batch and len(got) == len(old) + len(new)


def test_cms_matches_model_and_upper_bound(spark):
    """Count-Min sketch (pipeline/sketch.py): cells and estimates match
    an independent XXH64 reference model; est >= true on every key."""
    from collections import Counter

    from gos2_spark.pipeline.sketch import cms_build, cms_estimate

    depth, width = 3, 64  # tiny width forces real collisions
    words = (["alpha"] * 7 + ["beta"] * 5 + ["gamma"] * 3
             + [f"w{i}" for i in range(40)])
    df = spark.createDataFrame([(w,) for w in words], "token string")
    sketch = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_build(df, "token", depth, width).collect()
    }
    true = Counter(words)
    model = {}
    for w, c in true.items():
        for d in range(depth):
            pos = (d, xxh64_signed(w + f"#cms{d}") % width)
            model[pos] = model.get(pos, 0) + c
    assert sketch == model
    probes = spark.createDataFrame(
        [(w,) for w in true], "token string"
    )
    est = {
        r["token"]: r["est"]
        for r in cms_estimate(probes, cms_build(df, "token", depth, width),
                              "token", depth, width).collect()
    }
    for w, c in true.items():
        want = min(
            model[(d, xxh64_signed(w + f"#cms{d}") % width)]
            for d in range(depth)
        )
        assert est[w] == want, w
        assert est[w] >= c, w


def test_hll_registers_match_model_and_estimate_accuracy(spark):
    """HyperLogLog (pipeline/sketch.py): registers equal an independent
    XXH64 reference; the estimate lands within the expected ~1.04/sqrt(m)
    error band on 5000 distinct keys."""
    from gos2_spark.pipeline.sketch import hll_estimate, hll_registers

    b, n = 10, 5000
    m, nb = 1 << b, 64 - b
    keys = [f"key-{i}" for i in range(n)] * 2  # duplicates must not matter
    df = spark.createDataFrame([(k,) for k in keys], "token string")
    regs = {
        r["bucket"]: r["rank"]
        for r in hll_registers(df, "token", b=b).collect()
    }
    model = {}
    for k in set(keys):
        h = xxh64_signed(k) % (1 << 64)
        bucket = h >> nb
        w = h & ((1 << nb) - 1)
        rank = (nb + 1) if w == 0 else (nb + 1 - w.bit_length())
        model[bucket] = max(model.get(bucket, 0), rank)
    assert regs == model
    est = hll_estimate(
        hll_registers(df, "token", b=b), b=b
    ).collect()[0]["est"]
    assert abs(est - n) / n < 5 * 1.04 / (m ** 0.5)  # 5 sigma


def test_hll_registers_merge_by_max(spark):
    """Mergeability — the property that makes HLL distributed: registers
    of a union equal the bucketwise MAX of per-part registers, so shards
    can sketch independently and combine with one tiny agg."""
    from pyspark.sql import functions as F

    from gos2_spark.pipeline.sketch import hll_registers

    b = 8
    a = [f"a{i}" for i in range(800)] + [f"s{i}" for i in range(200)]
    c = [f"c{i}" for i in range(700)] + [f"s{i}" for i in range(200)]
    dfa = spark.createDataFrame([(k,) for k in a], "token string")
    dfc = spark.createDataFrame([(k,) for k in c], "token string")
    both = spark.createDataFrame([(k,) for k in a + c], "token string")
    merged = {
        r["bucket"]: r["rank"]
        for r in (
            hll_registers(dfa, "token", b=b)
            .union(hll_registers(dfc, "token", b=b))
            .groupBy("bucket")
            .agg(F.max("rank").alias("rank"))
            .collect()
        )
    }
    direct = {
        r["bucket"]: r["rank"]
        for r in hll_registers(both, "token", b=b).collect()
    }
    assert merged == direct
