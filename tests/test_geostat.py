"""Geostatistics operators (gos2_spark/spark/geostat.py) against
independent numpy linear algebra: Cramer's-rule solve3 vs
numpy.linalg.solve, EB smoothing vs a direct formula replay, 3-NN simple
kriging vs brute-force numpy solve, spatial-lag OLS vs lstsq."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gos2_spark.spark.geostat import (
    eb_rate_smoothing,
    lag_ols,
    simple_kriging_3nn,
    solve3,
)


def test_solve3_matches_numpy(spark):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(20):
        a = rng.uniform(-2, 2, (3, 3))
        a += 3.0 * np.eye(3)  # keep well-conditioned
        b = rng.uniform(-2, 2, 3)
        rows.append((i, *a.ravel().tolist(), *b.tolist()))
    cols = ["i"] + [f"a{r}{c}" for r in range(3) for c in range(3)] + [
        "b1", "b2", "b3"]
    df = spark.createDataFrame(rows, cols)
    x1, x2, x3, det = solve3(
        tuple(tuple(F.col(f"a{r}{c}") for c in range(3)) for r in range(3)),
        (F.col("b1"), F.col("b2"), F.col("b3")),
    )
    out = {
        r["i"]: (r["x1"], r["x2"], r["x3"])
        for r in df.select(
            "i", x1.alias("x1"), x2.alias("x2"), x3.alias("x3")
        ).collect()
    }
    for i, (_, *vals) in enumerate(rows):
        a = np.array(vals[:9]).reshape(3, 3)
        b = np.array(vals[9:])
        expect = np.linalg.solve(a, b)
        got = np.array(out[i])
        assert np.allclose(got, expect, rtol=1e-9, atol=1e-12)


def test_eb_rate_smoothing_formula(spark):
    # (area, cases, pop): one dense area, several sparse ones
    data = [("a", 50, 1000), ("b", 1, 5), ("c", 0, 8), ("d", 3, 40),
            ("e", 2, 12), ("f", 7, 90)]
    df = spark.createDataFrame(data, ["cell", "cases", "pop"])
    got = {r["area"]: r for r in eb_rate_smoothing(df, area_col="cell").collect()}

    c = np.array([d[1] for d in data], dtype=float)
    p = np.array([d[2] for d in data], dtype=float)
    m = c.sum() / p.sum()
    pbar = p.mean()
    s2 = ((c * c / p).sum() - m * m * p.sum()) / p.sum()
    big_a = max(s2 - m / pbar, 0.0)
    w = big_a / (big_a + m / p)
    eb = w * (c / p) + (1 - w) * m
    for i, (area, ci, pi) in enumerate(data):
        r = got[area]
        assert r["cases"] == ci and r["pop"] == pi
        assert math.isclose(r["raw_rate"], ci / pi, rel_tol=0, abs_tol=1e-8)
        assert math.isclose(r["shrink_weight"], w[i], abs_tol=1e-8)
        assert math.isclose(r["eb_rate"], eb[i], abs_tol=1e-8)
    # shrinkage direction: sparse areas move toward m more than dense ones
    assert got["b"]["shrink_weight"] < got["a"]["shrink_weight"]


def test_eb_rate_smoothing_zero_pop_does_not_poison(spark):
    # one pop=0 area must not make s2 (and so every eb_rate) NaN; its own
    # rate columns surface as NULL while the p>0 areas get the same
    # estimates they would get without it
    data = [("a", 50, 1000), ("b", 1, 5), ("z", 2, 0)]
    df = spark.createDataFrame(data, ["cell", "cases", "pop"])
    got = {r["area"]: r for r in eb_rate_smoothing(df, area_col="cell").collect()}
    assert got["z"]["raw_rate"] is None
    assert got["z"]["shrink_weight"] is None
    assert got["z"]["eb_rate"] is None
    base = {
        r["area"]: r
        for r in eb_rate_smoothing(
            spark.createDataFrame(data[:2], ["cell", "cases", "pop"]),
            area_col="cell",
        ).collect()
    }
    for area in ("a", "b"):
        assert got[area]["eb_rate"] is not None
        assert not math.isnan(got[area]["eb_rate"])
        assert math.isclose(
            got[area]["eb_rate"], base[area]["eb_rate"], abs_tol=1e-12
        )


def _unit(lat, lng):
    la, lo = math.radians(lat), math.radians(lng)
    return np.array(
        [math.cos(lo) * math.cos(la), math.sin(lo) * math.cos(la),
         math.sin(la)])


def _angle(a, b):
    return math.atan2(np.linalg.norm(np.cross(a, b)), float(np.dot(a, b)))


def test_simple_kriging_matches_numpy(spark):
    rng = np.random.RandomState(3)
    pts = [(int(k), float(lat), float(lng), float(z))
           for k, (lat, lng, z) in enumerate(
               zip(rng.uniform(-50, 50, 12), rng.uniform(-150, 150, 12),
                   rng.randint(0, 50, 12)))]
    tgts = [(100, 10.0, 20.0), (101, -30.0, -60.0)]
    p = spark.createDataFrame(pts, ["key", "lat", "lng", "value"])
    t = spark.createDataFrame(tgts, ["target_key", "lat", "lng"])
    out = {r["target_key"]: r
           for r in simple_kriging_3nn(p, t, range_rad=0.2,
                                       nugget=0.05).collect()}
    assert set(out) == {100, 101}

    gmean = sum(z for _, _, _, z in pts) / len(pts)
    for tk, tlat, tlng in tgts:
        tv = _unit(tlat, tlng)
        ds = sorted(
            (( _angle(tv, _unit(lat, lng)), k, lat, lng, z)
             for k, lat, lng, z in pts))[:3]
        kmat = np.eye(3) * 1.05
        for i in range(3):
            for j in range(i + 1, 3):
                cij = math.exp(-_angle(
                    _unit(ds[i][2], ds[i][3]),
                    _unit(ds[j][2], ds[j][3])) / 0.2)
                kmat[i, j] = kmat[j, i] = cij
        kvec = np.array([math.exp(-d / 0.2) for d, *_ in ds])
        w = np.linalg.solve(kmat, kvec)
        zhat = gmean + float(
            w @ (np.array([d[4] for d in ds]) - gmean))
        kvar = 1.05 - float(w @ kvec)
        r = out[tk]
        assert [r["nn1"], r["nn2"], r["nn3"]] == [d[1] for d in ds]
        assert np.allclose([r["w1"], r["w2"], r["w3"]], w, atol=1e-8)
        assert math.isclose(r["zhat"], zhat, abs_tol=1e-7)
        assert math.isclose(r["kriging_var"], kvar, abs_tol=1e-7)


def test_lag_ols_matches_lstsq(spark):
    rng = np.random.RandomState(11)
    x = rng.randint(0, 20, 40).astype(float)
    lag = rng.randint(0, 30, 40).astype(float)
    y = np.round(2.0 + 1.5 * x + 0.5 * lag + rng.randint(-3, 4, 40))
    df = spark.createDataFrame(
        [(float(yy), float(xx), float(ll)) for yy, xx, ll in zip(y, x, lag)],
        ["y", "x", "l"])
    row = lag_ols(df, "y", "x", "l").collect()[0]
    xmat = np.column_stack([np.ones_like(x), x, lag])
    beta, res, *_ = np.linalg.lstsq(xmat, y, rcond=None)
    sse = float(((xmat @ beta - y) ** 2).sum())
    sst = float(((y - y.mean()) ** 2).sum())
    assert row["n_obs"] == 40
    assert math.isclose(row["beta0"], beta[0], abs_tol=1e-6)
    assert math.isclose(row["beta_x"], beta[1], abs_tol=1e-6)
    assert math.isclose(row["beta_lag"], beta[2], abs_tol=1e-6)
    assert math.isclose(row["r2"], 1.0 - sse / sst, abs_tol=1e-8)
