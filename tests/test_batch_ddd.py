"""2SFCA accessibility, degree power-law MLE, Theta forecast —
independent Python references."""

import math
from collections import defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

SITES = [
    ("nyc", 40.7128, -74.0060, 1200),
    ("london", 51.5074, -0.1278, 800),
    ("tokyo", 35.6762, 139.6503, 600),
    ("sydney", -33.8688, 151.2093, 200),
    ("lagos", 6.5244, 3.3792, 100),
    ("saopaulo", -23.5505, -46.6333, 100),
]
D0 = 0.35


def _vec(lat, lng):
    la, lo = math.radians(lat), math.radians(lng)
    return (
        math.cos(lo) * math.cos(la),
        math.sin(lo) * math.cos(la),
        math.sin(la),
    )


def _ang(a, b):
    cx = a[1] * b[2] - a[2] * b[1]
    cy = a[2] * b[0] - a[0] * b[2]
    cz = a[0] * b[1] - a[1] * b[0]
    return math.atan2(
        math.sqrt(cx * cx + cy * cy + cz * cz),
        a[0] * b[0] + a[1] * b[1] + a[2] * b[2],
    )


def test_two_step_fca_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT event_id FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    pts = []
    for (eid,) in rows:
        lat = -60.0 + (eid * 11 % 120) + (eid % 83) / 83.0
        lng = -170.0 + (eid * 17 % 340) + (eid % 79) / 79.0
        pts.append(
            (
                _vec(lat, lng),
                (int(math.floor(lat / 10.0)), int(math.floor(lng / 10.0))),
            )
        )
    svecs = {n: _vec(la, lo) for n, la, lo, _ in SITES}
    demand = {
        n: sum(1 for v, _ in pts if _ang(v, sv) <= D0)
        for n, sv in svecs.items()
    }
    ratio = {
        n: s / demand[n] for n, _, _, s in SITES if demand[n] > 0
    }
    tiles = defaultdict(int)
    for _, t in pts:
        tiles[t] += 1
    got = {(r["tr"], r["tc"]): r for r in entry.queries()["two_step_fca"](spark, SF_DIR).collect()}
    assert set(got) == set(tiles)
    any_access = False
    for (tr, tc), n in tiles.items():
        center = _vec(tr * 10.0 + 5.0, tc * 10.0 + 5.0)
        reach = sorted(
            n_ for n_, sv in svecs.items()
            if n_ in ratio and _ang(center, sv) <= D0
        )
        acc = sum(ratio[n_] for n_ in reach)
        r = got[(tr, tc)]
        assert r["n_events"] == n
        assert r["n_sites"] == len(reach)
        assert abs(r["access"] - acc) < 1e-8
        if reach:
            any_access = True
    assert any_access


def test_degree_powerlaw_matches_python(spark):
    import math as m
    from collections import Counter

    rows = duckdb.sql(
        f"""SELECT user_id, epoch_us(ts) AS us, event_id
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, us, event_id"""
    ).fetchall()
    per = defaultdict(list)
    for uid, us, eid in rows:
        lat = -60.0 + (eid * 11 % 120) + (eid % 83) / 83.0
        lng = -170.0 + (eid * 17 % 340) + (eid % 79) / 79.0
        node = int(
            (m.floor(lat / 10.0) + 6) * 34 + m.floor(lng / 10.0) + 17
        )
        per[uid].append(node)
    directed = set()
    for seq in per.values():
        for a, b in zip(seq, seq[1:]):
            if a != b:
                directed.add((a, b))
    und = {(min(a, b), max(a, b)) for a, b in directed}
    deg = Counter()
    for u, v in und:
        deg[u] += 1
        deg[v] += 1
    tail = [d for d in deg.values() if d >= 2]
    alpha = 1.0 + len(tail) / sum(m.log(d / 2.0) for d in tail)
    r = entry.queries()["degree_powerlaw"](spark, SF_DIR).collect()[0]
    assert r["n_nodes"] == len(deg)
    assert r["n_tail"] == len(tail)
    assert r["max_deg"] == max(deg.values())
    assert abs(r["alpha_mle"] - alpha) < 1e-7
    assert r["alpha_mle"] > 1.0


def test_theta_forecast_matches_python(spark):
    daily = dict(
        duckdb.sql(
            f"""SELECT epoch_us(ts) // 86400000000, count(*)
                FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"""
        ).fetchall()
    )
    d0, dmax = min(daily), max(daily)
    dcut = dmax - 7
    train = [(d - d0, daily.get(d, 0)) for d in range(d0, dcut + 1) if d in daily]
    n = len(train)
    st = sum(t for t, _ in train)
    sy = sum(y for _, y in train)
    sty = sum(t * y for t, y in train)
    stt = sum(t * t for t, _ in train)
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    ses = None
    for t, y in train:
        th = 2.0 * y - (a + b * t)
        ses = th if ses is None else 0.3 * th + 0.7 * ses
    got = {r["h"]: r for r in entry.queries()["theta_forecast"](spark, SF_DIR).collect()}
    assert len(got) == 7
    for d in range(dcut + 1, dmax + 1):
        t = d - d0
        h = t - n + 1
        fc = 0.5 * (a + b * t) + 0.5 * ses
        r = got[h]
        assert r["actual"] == daily[d]
        assert abs(r["forecast"] - fc) < 1e-6
        assert abs(r["abs_err"] - abs(fc - daily[d])) < 1e-6
