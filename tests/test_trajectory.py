"""trajectory_hausdorff vs a pure-numpy O(n^2) oracle.

The discrete Hausdorff distance composes the engine's haversine
(latlng.go:32-40 op order) into max-of-min set distances; the oracle here
recomputes the full point-pair grid in numpy with the identical formula.
"""

import numpy as np
import pytest


def _haversine(lat1, lng1, lat2, lng2):
    rlat1, rlng1 = np.radians(lat1), np.radians(lng1)
    rlat2, rlng2 = np.radians(lat2), np.radians(lng2)
    dlat = np.sin((rlat2 - rlat1) * 0.5)
    dlng = np.sin((rlng2 - rlng1) * 0.5)
    x = dlat * dlat + dlng * dlng * np.cos(rlat1) * np.cos(rlat2)
    return 2.0 * np.arctan2(np.sqrt(x), np.sqrt(np.maximum(0.0, 1.0 - x)))


def _np_hausdorff(A, B):
    """(h_ab, h_ba, h_sym) for two (n,2) arrays of lat/lng degrees."""
    grid = _haversine(
        A[:, None, 0], A[:, None, 1], B[None, :, 0], B[None, :, 1]
    )
    h_ab = grid.min(axis=1).max()
    h_ba = grid.min(axis=0).max()
    return h_ab, h_ba, max(h_ab, h_ba)


def _synth_points(rng, n):
    return np.column_stack(
        [rng.uniform(-80, 80, n), rng.uniform(-179, 179, n)]
    )


@pytest.fixture(scope="module")
def traj_df(spark):
    rng = np.random.default_rng(42)
    rows, sets = [], {}
    for key in range(5):
        pts = _synth_points(rng, 8 + 5 * key)
        sets[key] = pts
        for i, (lat, lng) in enumerate(pts):
            rows.append((key, i, float(lat), float(lng)))
    df = spark.createDataFrame(rows, "user_id long, pt_id long, lat double, lng double")
    return df, sets


def test_symmetric_hausdorff_matches_numpy(spark, traj_df):
    from gos2_spark.spark.trajectory import trajectory_hausdorff

    df, sets = traj_df
    got = {
        (r["key_a"], r["key_b"]): r
        for r in trajectory_hausdorff(df).collect()
    }
    assert len(got) == 10  # C(5,2) pairs
    for a in range(5):
        for b in range(a + 1, 5):
            h_ab, h_ba, h_sym = _np_hausdorff(sets[a], sets[b])
            r = got[(a, b)]
            assert r["n_a"] == len(sets[a]) and r["n_b"] == len(sets[b])
            assert r["h_ab"] == pytest.approx(h_ab, abs=1e-12)
            assert r["h_ba"] == pytest.approx(h_ba, abs=1e-12)
            assert r["h_sym"] == pytest.approx(h_sym, abs=1e-12)


def test_directed_matches_symmetric_component(spark, traj_df):
    from gos2_spark.spark.trajectory import directed_hausdorff, trajectory_hausdorff

    df, _ = traj_df
    directed = {
        (r["key_a"], r["key_b"]): r["h_ab"]
        for r in directed_hausdorff(df).collect()
    }
    for r in trajectory_hausdorff(df).collect():
        assert directed[(r["key_a"], r["key_b"])] == r["h_ab"]


def test_identical_trajectories_distance_zero(spark):
    from gos2_spark.spark.trajectory import trajectory_hausdorff

    rng = np.random.default_rng(7)
    pts = _synth_points(rng, 12)
    rows = [
        (key, i, float(lat), float(lng))
        for key in (0, 1)
        for i, (lat, lng) in enumerate(pts)
    ]
    df = spark.createDataFrame(rows, "user_id long, pt_id long, lat double, lng double")
    [r] = trajectory_hausdorff(df).collect()
    assert r["h_sym"] == 0.0


def test_subset_direction_is_zero(spark):
    """A contained in B => h(A->B) = 0 while h(B->A) > 0 (the classic
    asymmetry that makes the symmetric max necessary)."""
    from gos2_spark.spark.trajectory import trajectory_hausdorff

    rng = np.random.default_rng(3)
    big = _synth_points(rng, 20)
    rows = [(0, i, float(la), float(ln)) for i, (la, ln) in enumerate(big[:6])]
    rows += [(1, i, float(la), float(ln)) for i, (la, ln) in enumerate(big)]
    df = spark.createDataFrame(rows, "user_id long, pt_id long, lat double, lng double")
    [r] = trajectory_hausdorff(df).collect()
    assert r["h_ab"] == 0.0
    assert r["h_ba"] > 0.0
    assert r["h_sym"] == r["h_ba"]


def _np_profile(pts):
    """numpy replay of trajectory_profile for one ordered (n,2) array."""
    lat, lng = pts[:, 0], pts[:, 1]
    legs = _haversine(lat[:-1], lng[:-1], lat[1:], lng[1:])
    path = float(legs.sum()) if len(legs) else 0.0
    net = float(_haversine(lat[0], lng[0], lat[-1], lng[-1]))
    rlat, rlng = np.radians(lat), np.radians(lng)
    v = np.column_stack(
        [np.cos(rlng) * np.cos(rlat), np.sin(rlng) * np.cos(rlat), np.sin(rlat)]
    )
    m = v.mean(axis=0)
    clat = np.degrees(np.arctan2(m[2], np.hypot(m[0], m[1])))
    clng = np.degrees(np.arctan2(m[1], m[0]))
    spread = float(np.arccos(min(1.0, np.linalg.norm(m))))
    return path, net, (path / net if net > 0 else None), clat, clng, spread


def test_profile_matches_numpy(spark):
    from gos2_spark.spark.trajectory import trajectory_profile

    rng = np.random.default_rng(11)
    rows, sets = [], {}
    for key in range(4):
        pts = _synth_points(rng, 10 + 7 * key)
        sets[key] = pts
        for i, (la, ln) in enumerate(pts):
            rows.append((key, i, i, float(la), float(ln)))
    df = spark.createDataFrame(
        rows, "user_id long, ts long, pt_id long, lat double, lng double"
    )
    got = {r["user_id"]: r for r in trajectory_profile(df).collect()}
    for key, pts in sets.items():
        path, net, sin, clat, clng, spread = _np_profile(pts)
        r = got[key]
        assert r["n_pts"] == len(pts)
        assert r["path_rad"] == pytest.approx(path, abs=1e-10)
        assert r["net_rad"] == pytest.approx(net, abs=1e-12)
        assert r["sinuosity"] == pytest.approx(sin, rel=1e-9)
        assert r["centroid_lat"] == pytest.approx(clat, abs=1e-10)
        assert r["centroid_lng"] == pytest.approx(clng, abs=1e-10)
        assert r["spread_rad"] == pytest.approx(spread, abs=1e-10)


def test_profile_single_point_and_coincident(spark):
    from gos2_spark.spark.trajectory import trajectory_profile

    rows = [
        (0, 0, 0, 40.0, -74.0),                # single point
        (1, 0, 0, 10.0, 20.0), (1, 1, 1, 10.0, 20.0),  # coincident pair
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, pt_id long, lat double, lng double"
    )
    got = {r["user_id"]: r for r in trajectory_profile(df).collect()}
    for key in (0, 1):
        r = got[key]
        assert r["path_rad"] == 0.0
        assert r["net_rad"] == 0.0
        assert r["sinuosity"] is None
        assert r["spread_rad"] == pytest.approx(0.0, abs=1e-7)
    assert got[0]["centroid_lat"] == pytest.approx(40.0, abs=1e-9)
    assert got[1]["centroid_lng"] == pytest.approx(20.0, abs=1e-9)
