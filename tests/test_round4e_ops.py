"""Fifth round-4 operator batch vs independent pure-python replays:
hex k-ring focal smoothing, hex steepest-descent flow directions,
sitemap URL extraction, weekday chi-square uniformity."""

import math
import random
from collections import Counter

from pyspark.sql import functions as F

_DIRS = [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]


def _rand_cells(rng, n=120):
    cells = {}
    while len(cells) < n:
        q, r = rng.randint(-12, 12), rng.randint(-12, 12)
        cells[(q, r)] = rng.randint(1, 9)
    return cells


def test_hex_kring_smooth_matches_brute(spark):
    from gos2_spark.spark.hexgrid import hex_kring_smooth

    rng = random.Random(43)
    cells = _rand_cells(rng)
    df = spark.createDataFrame(
        [(q, r, n) for (q, r), n in cells.items()], "hq long, hr long, n long"
    )
    got = {
        (r["hq"], r["hr"]): (r["ring_cells"], r["ring_sum"], r["smooth"])
        for r in hex_kring_smooth(df).collect()
    }
    assert set(got) == set(cells)
    for (q, r), n in cells.items():
        ring = [(q, r)] + [(q + dq, r + dr) for dq, dr in _DIRS]
        occ = [c for c in ring if c in cells]
        s = sum(cells[c] for c in occ)
        assert got[(q, r)][0] == len(occ)
        assert got[(q, r)][1] == s
        assert math.isclose(got[(q, r)][2], s / len(occ), rel_tol=1e-12)


def test_hex_flow_directions_match_brute_and_terminate(spark):
    from gos2_spark.spark.hexgrid import hex_flow_directions

    rng = random.Random(47)
    cells = _rand_cells(rng)
    elev = {c: ((c[0] * 1103515245 + c[1] * 12345) % 10007 + 10007) % 10007
            for c in cells}
    df = spark.createDataFrame(
        [(q, r, e) for (q, r), e in elev.items()], "hq long, hr long, elev long"
    )
    got = {
        (r["hq"], r["hr"]): (r["flow_dir"], r["is_sink"])
        for r in hex_flow_directions(df).collect()
    }
    for (q, r), e in elev.items():
        cands = [
            (elev[(q + dq, r + dr)], d)
            for d, (dq, dr) in enumerate(_DIRS)
            if (q + dq, r + dr) in elev and elev[(q + dq, r + dr)] < e
        ]
        if cands:
            assert got[(q, r)] == (min(cands)[1], False), (q, r)
        else:
            assert got[(q, r)] == (-1, True), (q, r)
    # strict descent -> every flow path terminates at a sink
    for start in elev:
        cur, steps = start, 0
        while got[cur][0] != -1:
            d = got[cur][0]
            cur = (cur[0] + _DIRS[d][0], cur[1] + _DIRS[d][1])
            steps += 1
            assert steps <= len(elev), "cycle detected"
        assert got[cur][1] is True


def test_sitemap_urls_counts(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["sitemap_urls"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    # 500 docs x 3 locs = 1500 urls over 20 hosts
    assert sum(r["n_urls"] for r in rows) == 1500
    assert len(rows) == 20
    for r in rows:
        assert 1 <= r["latest_day"] <= 28
        assert r["n_distinct_pages"] <= r["n_urls"]


def test_weekday_chisq_closed_form_equals_zero_filled(spark):
    """chi2 = 7*sum(O^2)/n - n must equal the textbook
    sum_{d=0..6} (O_d - n/7)^2 / (n/7) including zero days."""
    import __spark_entry__ as entry

    rows = entry.queries()["weekday_chisq"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 5
    # independent replay from raw parquet via pure python
    import duckdb

    con = duckdb.connect()
    raw = con.execute(
        "SELECT event_type, CAST(floor(CAST(date_diff('microsecond',"
        " TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE) / 86400000000)"
        " AS BIGINT) AS day FROM"
        " '/root/testdata/sf0.01/events.parquet'"
    ).fetchall()
    byd = Counter((t, (d + 4) % 7) for t, d in raw)
    for r in rows:
        os_ = [byd.get((r["event_type"], d), 0) for d in range(7)]
        n = sum(os_)
        e = n / 7.0
        chi2 = sum((o - e) ** 2 / e for o in os_)
        assert math.isclose(r["chi2"], chi2, rel_tol=1e-9), r["event_type"]
        assert r["n"] == n
