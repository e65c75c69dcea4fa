"""Triad census, weighted Jaccard, Gumbel maxima, component sizes —
python references and identities."""

import itertools
import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _custkeys():
    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT c_custkey FROM read_parquet('{SF_DIR}/customer.parquet')"
        ).fetchall()
    ]


def test_triad_census_matches_python(spark):
    ks = _custkeys()
    edges = set()
    for c in ks:
        for mul, add in ((7, 3), (11, 5)):
            s, d = c % 64, (c * mul + add) % 64
            if s != d:
                edges.add((s, d))
    cyc = 0
    ffl = 0
    for a, b in edges:
        for c2 in range(64):
            if c2 == a or c2 == b:
                continue
            if (b, c2) in edges:
                if (c2, a) in edges:
                    cyc += 1
                if (a, c2) in edges:
                    ffl += 1
    r = entry.queries()["triad_census"](spark, SF_DIR).collect()[0]
    assert r["n_cyclic"] == cyc // 3
    assert r["n_transitive"] == ffl


def test_weighted_jaccard_matches_python(spark):
    ks = _custkeys()
    w = Counter()
    for c in ks:
        w[(c % 32, (c * 7 + 3) % 32)] += 1
    out = defaultdict(lambda: [0, 0])
    tot = Counter()
    for (s, d), c in w.items():
        tot[s] += c
    hosts = sorted(tot)
    got = {
        (r["sa"], r["sb"]): r
        for r in entry.queries()["weighted_jaccard_hosts"](spark, SF_DIR).collect()
    }
    for sa, sb in itertools.combinations(hosts, 2):
        smin = sum(
            min(w.get((sa, d), 0), w.get((sb, d), 0)) for d in range(32)
        )
        if smin == 0:
            assert (sa, sb) not in got
            continue
        smax = tot[sa] + tot[sb] - smin
        r = got[(sa, sb)]
        assert r["sum_min"] == smin and r["sum_max"] == smax
        assert abs(r["weighted_jaccard"] - smin / smax) < 1e-9


def test_gumbel_matches_python(spark):
    daily = duckdb.sql(
        f"""SELECT event_type,
                   CAST(floor(CAST(date_diff('microsecond',
                        TIMESTAMP '1970-01-01 00:00:00', ts) AS DOUBLE)
                        / 86400000000) AS BIGINT) AS day, count(*) AS n
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    weeks = defaultdict(dict)
    for t, d, n in daily:
        wk = d - (d % 7)
        weeks[t][wk] = max(weeks[t].get(wk, 0), n)
    got = {
        r["event_type"]: r
        for r in entry.queries()["gumbel_weekly_maxima"](spark, SF_DIR).collect()
    }
    for t, ms in weeks.items():
        vals = list(ms.values())
        n = len(vals)
        mean = sum(vals) / n
        sd = math.sqrt(
            (n * sum(v * v for v in vals) - sum(vals) ** 2) / (n * (n - 1))
        )
        beta = sd * math.sqrt(6.0) / math.pi
        mu = mean - 0.5772156649015329 * beta
        assert got[t]["n_weeks"] == n
        assert abs(got[t]["gumbel_beta"] - beta) < 1e-8
        assert abs(got[t]["gumbel_mu"] - mu) < 1e-8


def test_component_size_dist_consistent_with_components(spark):
    comps = entry.queries()["spatial_components"](spark, SF_DIR).collect()
    sizes = Counter(Counter(r["component"] for r in comps).values())
    got = {
        r["size"]: r["n_components"]
        for r in entry.queries()["component_size_dist"](spark, SF_DIR).collect()
    }
    assert got == dict(sizes)
    assert sum(s * c for s, c in got.items()) == len(comps)
