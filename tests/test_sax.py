"""SAX symbolization (spark/temporal.py::sax_symbols) vs a pure-python
reference and alphabet/shape properties."""

import math
import random

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _sax_reference(values, w=8, bps=(-0.6744897501960817, 0.0, 0.6744897501960817)):
    n = len(values)
    mean = sum(values) / n
    sd = math.sqrt(n * sum(v * v for v in values) - sum(values) ** 2) / n
    frames = {}
    for idx, v in enumerate(values):
        frames.setdefault(idx * w // n, []).append(v)
    out = {}
    for f, vs in frames.items():
        z = (sum(vs) / len(vs) - mean) / sd if sd > 0 else None
        if z is None:
            sym = None
        else:
            sym = "abcd"[sum(1 for b in bps if z >= b)]
        out[f] = (len(vs), z, sym)
    return out


def test_sax_matches_python_reference(spark):
    from gos2_spark.spark.temporal import sax_symbols

    rng = random.Random(31)
    values = [rng.randint(0, 500) for _ in range(53)]  # n not divisible by 8
    rows = [("k", i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, d long, v long")
    got = {r["frame"]: r for r in sax_symbols(df, "k", "d", "v").collect()}
    ref = _sax_reference(values)
    assert set(got) == set(ref)
    for f, (cnt, z, sym) in ref.items():
        assert got[f]["n_obs"] == cnt
        assert abs(got[f]["paa_z"] - z) < 1e-8
        assert got[f]["symbol"] == sym


def test_sax_monotone_ramp_spells_ascending_word(spark):
    from gos2_spark.spark.temporal import sax_symbols

    rows = [("k", i, i * 10) for i in range(64)]
    df = spark.createDataFrame(rows, "k string, d long, v long")
    got = sax_symbols(df, "k", "d", "v").orderBy("frame").collect()
    word = "".join(r["symbol"] for r in got)
    assert word == "aabbccdd"  # 8 equiprobable frames of a linear ramp
    assert all(r["n_obs"] == 8 for r in got)


def test_sax_constant_series_null_symbols(spark):
    from gos2_spark.spark.temporal import sax_symbols

    rows = [("k", i, 7) for i in range(16)]
    df = spark.createDataFrame(rows, "k string, d long, v long")
    got = sax_symbols(df, "k", "d", "v").collect()
    assert all(r["symbol"] is None and r["paa_z"] is None for r in got)


def test_driver_sax_query_shape(spark):
    rows = entry.queries()["sax_daily_words"](spark, SF_DIR).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        assert [r["frame"] for r in rs] == sorted(r["frame"] for r in rs)
        assert len(rs) <= 8
        for r in rs:
            assert r["symbol"] in ("a", "b", "c", "d")
