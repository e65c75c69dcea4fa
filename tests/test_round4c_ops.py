"""Third round-4 operator batch, each vs an independent numpy /
pure-python replay (the DuckDB oracles replay the same SQL algebra, so
these catch algorithm bugs oracle and engine might share): Local
Moran's I (LISA), standard deviational ellipse, Mann-Kendall trend,
Knox space-time interaction, Adamic-Adar link prediction, sample ACF."""

import math
import random

import numpy as np
from pyspark.sql import functions as F


# --------------------------------------------------------- local moran
def test_local_moran_matches_pure_python(spark):
    """LISA over a synthetic occupied-cell count table; neighbor
    topology from the (separately golden-tested) kernel EdgeNeighbors."""
    from gos2_spark.kernels import projection as P
    from gos2_spark.spark.spatialstats import local_moran

    rng = random.Random(3)
    # occupied level-8 cells from scattered points
    lats = np.array([rng.uniform(-70, 70) for _ in range(400)])
    lngs = np.array([rng.uniform(-175, 175) for _ in range(400)])
    leaf = P.cellid_from_latlng(lats, lngs)
    from gos2_spark.kernels import hilbert as H

    cells = H.to_signed(H.parent(leaf, 8))  # biased: the engine column form
    counts: dict[int, int] = {}
    for c in cells.tolist():
        counts[c] = counts.get(c, 0) + 1
    df = spark.createDataFrame(
        [(c, n) for c, n in counts.items()], "cell long, n long"
    )
    out = {
        r["cell"]: (r["x_count"], r["w_i"], r["nbr_sum"], r["local_i"],
                    r["quadrant"])
        for r in local_moran(df, "cell", "n").collect()
    }
    # pure-python replay
    occ = set(counts)
    xs = np.array(list(counts.values()), dtype=np.float64)
    n = len(xs)
    xb = xs.sum() / n
    m2 = (xs * xs).sum() / n - xb * xb
    for c, x in counts.items():
        raw_nbrs = P.edge_neighbors(H.from_signed(np.array([c])))[0]
        nbrs = [
            int(nb)
            for nb in H.to_signed(raw_nbrs).tolist()
            if int(nb) in occ
        ]
        s_i = sum(counts[nb] for nb in nbrs)
        w_i = len(nbrs)
        z = x - xb
        lag = s_i - w_i * xb
        li = z * lag / m2
        got = out[c]
        assert got[0] == x and got[1] == w_i and got[2] == s_i
        assert math.isclose(got[3], li, rel_tol=1e-9, abs_tol=1e-12), c
        if z > 0 and lag > 0:
            assert got[4] == "HH"
        elif z < 0 and lag < 0:
            assert got[4] == "LL"


# ------------------------------------------------------------- ellipse
def test_std_dev_ellipse_matches_numpy_eig(spark):
    from gos2_spark.spark.spatialstats import std_dev_ellipse

    rng = random.Random(5)
    rows = []
    for i in range(3000):
        g = "a" if i % 3 else "b"
        # integer micro-coords (den 83 / 79) with an anisotropic cloud
        rows.append(
            (g, int(rng.gauss(0, 400)) + 2 * int(rng.gauss(0, 300)),
             int(rng.gauss(100, 900)))
        )
    df = spark.createDataFrame(rows, "g string, ilat long, ilng long")
    out = {
        r["g"]: r
        for r in std_dev_ellipse(
            df, "g", "ilat", "ilng", lat_den=83, lng_den=79
        ).collect()
    }
    for g in ("a", "b"):
        pts = np.array(
            [(b / 79.0, a / 83.0) for gg, a, b in rows if gg == g]
        )  # (x=lng, y=lat)
        mean = pts.mean(axis=0)
        c = pts - mean
        cov = (c.T @ c) / len(pts)  # population covariance
        evals = np.linalg.eigvalsh(cov)
        r = out[g]
        assert math.isclose(r["mean_lng"], mean[0], rel_tol=1e-9)
        assert math.isclose(r["mean_lat"], mean[1], rel_tol=1e-9)
        assert math.isclose(
            r["axis_major"], math.sqrt(2.0 * evals[1]), rel_tol=1e-9
        )
        assert math.isclose(
            r["axis_minor"], math.sqrt(2.0 * max(evals[0], 0.0)),
            rel_tol=1e-9,
        )
        # theta is the principal-axis angle: rotating by -theta must
        # diagonalize the covariance (cross-term ~ 0)
        t = r["theta_rad"]
        rot = np.array(
            [[math.cos(t), math.sin(t)], [-math.sin(t), math.cos(t)]]
        )
        cr = rot @ cov @ rot.T
        assert abs(cr[0, 1]) < 1e-9 * max(1.0, abs(cr[0, 0]))


# -------------------------------------------------------- mann-kendall
def _mk_ref(series):
    n = len(series)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            d = series[j] - series[i]
            s += (d > 0) - (d < 0)
    from collections import Counter

    ties = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(series).values()
    )
    var_s = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var_s)
    elif s < 0:
        z = (s + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    return s, ties, var_s, z


def test_mann_kendall_matches_brute_force(spark):
    from gos2_spark.spark.spatialstats import mann_kendall

    rng = random.Random(9)
    rows = []
    truth = {}
    for k in range(12):
        ln = rng.randint(5, 40)
        vals = [rng.randint(0, 6) + (i // 4 if k % 3 == 0 else 0)
                for i in range(ln)]
        truth[k] = vals
        rows += [(k, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, o long, x long")
    out = {
        r["k"]: r
        for r in mann_kendall(df, "k", "o", "x", min_len=10).collect()
    }
    for k, vals in truth.items():
        if len(vals) < 10:
            assert k not in out
            continue
        s, ties, var_s, z = _mk_ref(vals)
        r = out[k]
        assert r["s_stat"] == s and r["tie_term"] == ties
        assert math.isclose(r["var_s"], var_s, rel_tol=1e-12)
        assert math.isclose(r["mk_z"], z, rel_tol=1e-9, abs_tol=1e-12)
        # a strongly increasing series must be flagged
        if k % 3 == 0 and len(vals) >= 20:
            assert r["trend"] == "increasing"


# ---------------------------------------------------------------- knox
def test_knox_matches_brute_force(spark):
    from gos2_spark.spark.functions import s2_cellid
    from gos2_spark.spark.temporal import knox_spacetime

    rng = random.Random(13)
    n = 300
    rows = []
    for i in range(n):
        # clustered half + uniform half so X is nontrivial
        if i % 2:
            lat, lng = rng.gauss(40, 1.0), rng.gauss(-74, 1.0)
            t = 1_700_000_000 + rng.randint(0, 86400)
        else:
            lat, lng = rng.uniform(-60, 60), rng.uniform(-170, 170)
            t = 1_700_000_000 + rng.randint(0, 40 * 86400)
        rows.append((i, lat, lng, t))
    df = spark.createDataFrame(
        rows, "key long, lat double, lng double, es long"
    ).select(
        "key", "lat", "lng",
        F.expr(
            "timestampadd(SECOND, CAST(es AS INT),"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("ts"),
    )
    df = df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    got = knox_spacetime(
        df, space_radius_deg=3.0, time_window_sec=2 * 86400,
        point_key="key", time_col="ts",
    ).collect()[0]

    def xyz(lat, lng):
        la, ln = math.radians(lat), math.radians(lng)
        return (
            math.cos(ln) * math.cos(la),
            math.sin(ln) * math.cos(la),
            math.sin(la),
        )

    r = math.radians(3.0)
    ns = nt = x = 0
    for i in range(n):
        ai = xyz(rows[i][1], rows[i][2])
        for j in range(i + 1, n):
            bj = xyz(rows[j][1], rows[j][2])
            cx = ai[1] * bj[2] - ai[2] * bj[1]
            cy = ai[2] * bj[0] - ai[0] * bj[2]
            cz = ai[0] * bj[1] - ai[1] * bj[0]
            d = math.atan2(
                math.sqrt(cx * cx + cy * cy + cz * cz),
                ai[0] * bj[0] + ai[1] * bj[1] + ai[2] * bj[2],
            )
            sc = d <= r
            tc = abs(rows[i][3] - rows[j][3]) <= 2 * 86400
            ns += sc
            nt += tc
            x += sc and tc
    assert got["n_points"] == n
    assert got["n_pairs"] == n * (n - 1) // 2
    assert got["ns"] == ns
    assert got["nt"] == nt
    assert got["x_both"] == x


# --------------------------------------------------------- adamic-adar
def test_adamic_adar_matches_pure_python(spark):
    from gos2_spark.pipeline.graph import adamic_adar

    rng = random.Random(17)
    edges = set()
    while len(edges) < 120:
        a, b = rng.randint(0, 39), rng.randint(0, 39)
        if a != b:
            edges.add((a, b))
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    out = {
        (r["u"], r["v"]): (r["common_neighbors"], r["aa_score"])
        for r in adamic_adar(df, "src", "dst").collect()
    }
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    expected = {}
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if not common:
                continue
            score = sum(1.0 / math.log(len(adj[w])) for w in common)
            expected[(u, v)] = (len(common), score)
    assert set(out) == set(expected)
    for k, (cn, sc) in expected.items():
        assert out[k][0] == cn
        assert math.isclose(out[k][1], sc, rel_tol=1e-9), k


# ----------------------------------------------------------------- acf
def test_acf_matches_numpy(spark):
    from gos2_spark.spark.temporal import acf_counts

    rng = random.Random(21)
    rows = []
    truth = {}
    for g in ("x", "y"):
        vals = [rng.randint(0, 20) + (10 if (i % 7 == 0 and g == "x") else 0)
                for i in range(60)]
        truth[g] = vals
        rows += [(g, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    out = {
        (r["g"], r["lag"]): r["acf"]
        for r in acf_counts(df, "g", "o", "v", max_lag=3).collect()
    }
    for g, vals in truth.items():
        x = np.array(vals, dtype=np.float64)
        xb = x.mean()
        den = ((x - xb) ** 2).sum()
        for k in (1, 2, 3):
            num = ((x[k:] - xb) * (x[:-k] - xb)).sum()
            assert math.isclose(
                out[(g, k)], num / den, rel_tol=1e-9, abs_tol=1e-12
            ), (g, k)
