"""Adaptive density tiling + sequence packing + PII scrub.

Density tiling is verified against a brute-force driver-side re-derivation
(counts per level via the numpy parent kernel, coarsest-cold-level rule)
plus the structural invariants: disjoint tiles, full coverage, exact
counts, threshold respected below max_level, every tile's parent hot.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gos2_spark.kernels import hilbert as H
from gos2_spark.kernels import projection as PJ

_BIAS = np.uint64(1) << np.uint64(63)


def _unbias(v: np.ndarray) -> np.ndarray:
    return v.view(np.uint64) ^ _BIAS


def _points_df(spark, n=900):
    """Deterministic skewed point set: half clustered near one city, half
    spread worldwide — guarantees a mix of tile levels."""
    keys = np.arange(n)
    lat = np.where(
        keys % 2 == 0,
        51.5 + (keys % 37) * 0.01,
        -60.0 + (keys * 7 % 120) + (keys % 97) / 97.0,
    )
    lng = np.where(
        keys % 2 == 0,
        -0.1 + (keys % 41) * 0.01,
        -170.0 + (keys * 13 % 340) + (keys % 89) / 89.0,
    )
    cells = (PJ.cellid_from_latlng(lat, lng) ^ _BIAS).view(np.int64)
    rows = [
        (int(k), float(la), float(lo), int(c))
        for k, la, lo, c in zip(keys, lat, lng, cells)
    ]
    return (
        spark.createDataFrame(rows, "key long, lat double, lng double, cell_id long"),
        cells,
    )


def _brute_tiles(cells_biased: np.ndarray, threshold: int, min_level: int, max_level: int):
    """Driver-side re-derivation: per-point ancestor chain -> per-level
    counts -> emit at the coarsest level whose tile is cold (or max_level)."""
    raw = _unbias(np.asarray(cells_biased, dtype=np.int64))
    counts: dict[int, dict[int, int]] = {}
    parents: dict[int, np.ndarray] = {}
    for lvl in range(min_level, max_level + 1):
        p = H.parent(raw, np.full(raw.shape, lvl, dtype=np.int64))
        parents[lvl] = p
        u, c = np.unique(p, return_counts=True)
        counts[lvl] = dict(zip(u.tolist(), c.tolist()))
    tiles = {}
    for i in range(raw.shape[0]):
        for lvl in range(min_level, max_level + 1):
            cell = int(parents[lvl][i])
            if counts[lvl][cell] <= threshold or lvl == max_level:
                tiles[(cell, lvl)] = counts[lvl][cell]
                break
    def _bias(c: int) -> int:
        return int((np.array([c], dtype=np.uint64) ^ _BIAS).view(np.int64)[0])
    return {(_bias(c), lvl): n for (c, lvl), n in tiles.items()}


@pytest.mark.parametrize("threshold,min_level,max_level", [(30, 1, 5), (10, 2, 4)])
def test_adaptive_density_tiles_matches_brute(spark, threshold, min_level, max_level):
    from gos2_spark.spark.density import adaptive_density_tiles

    df, cells = _points_df(spark)
    got = {
        (r["cell"], r["level"]): r["n"]
        for r in adaptive_density_tiles(
            df, threshold, min_level, max_level
        ).collect()
    }
    want = _brute_tiles(cells, threshold, min_level, max_level)
    assert got == want


def test_adaptive_density_tiles_invariants(spark):
    from gos2_spark.spark.density import adaptive_density_tiles

    threshold, min_level, max_level = 25, 1, 6
    df, cells = _points_df(spark)
    tiles = adaptive_density_tiles(df, threshold, min_level, max_level).collect()
    raw_tiles = {
        int(_unbias(np.array([r["cell"]], dtype=np.int64))[0]): (r["level"], r["n"])
        for r in tiles
    }
    # counts below threshold unless at max level
    for lvl, n in raw_tiles.values():
        assert n <= threshold or lvl == max_level
    # disjoint: no tile is an ancestor of another
    ids = np.array(sorted(raw_tiles), dtype=np.uint64)
    lo, hi = H.range_min(ids), H.range_max(ids)
    assert all(hi[i] < lo[i + 1] for i in range(len(ids) - 1))
    # coverage: every point inside exactly one tile, tallies match n
    pts = np.sort(_unbias(cells))
    # tiles are disjoint and sorted, so membership is a searchsorted bin
    idx = np.searchsorted(lo, pts, side="right") - 1
    assert (idx >= 0).all() and (pts <= hi[idx]).all()
    got_counts = np.bincount(idx, minlength=len(ids))
    want_counts = np.array([raw_tiles[int(c)][1] for c in ids])
    assert (got_counts == want_counts).all()


def test_pack_sequences_window_algebra(spark):
    from gos2_spark.pipeline.pack import pack_sequences, packing_summary

    n, budget, shards = 400, 100, 4
    rows = [(i, "ab"[i % 2], (i * 17) % 60) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, grp string, n_tok long")
    packed = pack_sequences(
        docs, budget, n_shards=shards, group_cols=("grp",)
    ).collect()
    # replay greedily in python per (grp, shard) in doc order
    state: dict[tuple, int] = {}
    by_key = {}
    for r in sorted(packed, key=lambda r: r["doc_id"]):
        k = (r["grp"], r["doc_id"] % shards)
        assert r["shard"] == r["doc_id"] % shards
        cum = state.get(k, 0) + r["n_tok"]
        state[k] = cum
        start = cum - r["n_tok"]
        assert r["start_tok"] == start and r["cum_tok"] == cum
        assert r["pack_first"] == start // budget
        want_last = (cum - 1) // budget if r["n_tok"] > 0 else start // budget
        assert r["pack_last"] == want_last
        assert r["spans_packs"] == (r["pack_first"] != want_last)
        by_key[k] = by_key.get(k, 0) + 1
    summ = packing_summary(
        pack_sequences(docs, budget, n_shards=shards, group_cols=("grp",)),
        budget,
        group_cols=("grp",),
    ).collect()
    for s in summ:
        k = (s["grp"], s["shard"])
        assert s["n_docs"] == by_key[k]
        assert s["total_tok"] == state[k]
        assert s["n_packs"] == -(-state[k] // budget)


def test_pii_scrub_counts_and_lengths(spark):
    from gos2_spark.pipeline.text import pii_scrub

    rows = [
        (0, "write to alice.b+test@mail.example.org today"),
        (1, "server at 10.2.300.4 then call 555-123-4567"),
        (2, "no pii here at all"),
        (3, "two mails a@b.io c.d@e.co and ip 1.2.3.4"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out[0]["n_email"] == 1 and out[0]["n_ipv4"] == 0
    assert out[0]["text_scrubbed"] == "write to [EMAIL] today"
    assert out[1]["n_ipv4"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["text_scrubbed"] == "server at [IP] then call [PHONE]"
    assert out[2]["n_email"] == out[2]["n_ipv4"] == out[2]["n_phone"] == 0
    assert out[2]["chars_redacted"] == 0
    assert out[3]["n_email"] == 2 and out[3]["n_ipv4"] == 1
    for r in out.values():
        removed = len(r["text"]) - len(r["text_scrubbed"])
        repl = r["n_email"] * 7 + r["n_ipv4"] * 4 + r["n_phone"] * 7
        assert r["chars_redacted"] == removed + repl
