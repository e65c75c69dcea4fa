"""Unit tests for the knn_join_df start-level picker (_knn_start_level).

The picker is pure numpy (no Spark): it sees a (possibly sampled) array
of raw uint64 leaf cell ids and returns the ladder's start level — the
FINEST level that is admissible (max block <= cap, the skew guard) and
still dense (size-biased mean occupancy >= max(6, 2k+2), the occupancy
guard). These tests pin both properties plus the degenerate fallback.
"""

import numpy as np

from gos2_spark.kernels.projection import cellid_from_latlng
from gos2_spark.spark.joins import _knn_start_level


def _blocks(cells: np.ndarray, lv: int) -> np.ndarray:
    lsb = np.uint64(1 << (2 * (30 - lv)))
    parents = (cells & ~(lsb - np.uint64(1))) | lsb
    _, counts = np.unique(parents, return_counts=True)
    return counts


def _sb(counts: np.ndarray) -> float:
    cf = counts.astype(np.float64)
    return float((cf * cf).sum() / cf.sum())


def _uniform_cells(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-60.0, 60.0, n)
    lng = rng.uniform(-170.0, 170.0, n)
    return cellid_from_latlng(lat, lng).astype(np.uint64)


def test_sparse_global_set_starts_fine_not_at_cap_level():
    """On a clumpy sparse set (the bench events lattice: integer-degree
    clusters with ~0.01-degree spreads) the old cap-only rule stops at
    the COARSEST admissible level; the occupancy rule must go several
    levels finer (the 3x slower first round measured in round 5)."""
    i = np.arange(0, 100_000, 20, dtype=np.int64)
    lat = -60.0 + (i * 11 % 120) + (i % 83) / 83.0
    lng = -170.0 + (i * 17 % 340) + (i % 79) / 79.0
    cells = cellid_from_latlng(lat, lng).astype(np.uint64)
    k = 2
    cap = max(512, 16 * k)
    lv = _knn_start_level(cells, level_mean=4, k=k)
    # the coarsest admissible level (old rule's choice)
    old = next(
        l for l in range(4, 31) if _blocks(cells, l).max() <= cap
    )
    assert lv > old + 1, (lv, old)
    # chosen level is admissible and still dense
    counts = _blocks(cells, lv)
    assert counts.max() <= cap
    assert _sb(counts) >= max(6, 2 * k + 2)
    # one level finer is lean (the finest-dense property)
    assert _sb(_blocks(cells, lv + 1)) < max(6, 2 * k + 2)


def test_hot_city_respects_skew_cap():
    """A hot-city mixture must still honor the max-block cap: the
    occupancy guard may only move the start level FINER, never let a
    hot block flood a round."""
    rng = np.random.default_rng(11)
    n_hot, n_bg = 50_000, 5_000
    lat = np.concatenate([
        40.71 + rng.normal(0, 0.02, n_hot),  # one dense city
        rng.uniform(-60.0, 60.0, n_bg),
    ])
    lng = np.concatenate([
        -74.0 + rng.normal(0, 0.02, n_hot),
        rng.uniform(-170.0, 170.0, n_bg),
    ])
    cells = cellid_from_latlng(lat, lng).astype(np.uint64)
    k = 2
    cap = max(512, 16 * k)
    lv = _knn_start_level(cells, level_mean=4, k=k)
    assert _blocks(cells, lv).max() <= cap


def test_sampled_counts_rescale():
    """With frac < 1 the estimates divide by frac: a half-sample of a
    dense set must pick (about) the same level as the full set."""
    cells = _uniform_cells(40_000, seed=3)
    rng = np.random.default_rng(5)
    half = cells[rng.random(len(cells)) < 0.5]
    lv_full = _knn_start_level(cells, level_mean=4, k=2, frac=1.0)
    lv_half = _knn_start_level(half, level_mean=4, k=2, frac=0.5)
    assert abs(lv_full - lv_half) <= 1, (lv_full, lv_half)


def test_all_duplicates_falls_back_to_leaf():
    """Coincident duplicates share a block at EVERY level — no level is
    admissible, and the picker must return the leaf fallback instead of
    looping or crashing (the final face-blocked round settles them)."""
    cells = np.repeat(
        cellid_from_latlng(np.array([48.85]), np.array([2.35])), 10_000
    ).astype(np.uint64)
    assert _knn_start_level(cells, level_mean=4, k=2) == 30


def test_empty_sample_is_safe():
    assert _knn_start_level(np.array([], dtype=np.uint64), 4, 2) == 30


def test_sampled_pick_matches_full_pick_at_low_fraction():
    """Bernoulli sampling at frac <= 0.1 must not bias the start level:
    the naive size-biased estimator sum(c^2)/sum(c)/frac inflates by
    ~(1-frac)/frac once sampled blocks are singletons (floor 1/frac), so
    a 1M-point uniform set picked leaf level 30 through the sampling
    path while the full array picked a moderate level — the exact stall
    the occupancy guard exists to prevent. The unbiased estimator
    sum(c(c-1))/(frac*sum(c)) + 1 must reproduce the full pick."""
    n = 1_000_000
    cells = _uniform_cells(n)
    k = 2
    full = _knn_start_level(cells, level_mean=4, k=k)
    rng = np.random.default_rng(13)
    frac = 500_000.0 / (n * 10)  # 0.05 — well into the biased regime
    sample = cells[rng.random(n) < frac]
    sampled = _knn_start_level(sample, level_mean=4, k=k, frac=frac)
    assert abs(sampled - full) <= 1, (sampled, full)
    assert sampled < 15, sampled  # never anywhere near the leaf fallback
