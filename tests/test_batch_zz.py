"""Competing risks, record linkage, mutual information — independent
Python references (sequential Aalen-Johansen; brute pair scoring)."""

import math
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

BIG = 4611686018427387904


def test_cumulative_incidence_matches_python(spark):
    rows = duckdb.sql(
        f"""SELECT user_id, epoch_us(ts), event_type
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    per = defaultdict(lambda: [None, None, None])  # t0, tp, tsg
    hz = 0
    for uid, us, t in rows:
        p = per[uid]
        p[0] = us if p[0] is None else min(p[0], us)
        if t == "purchase":
            p[1] = us if p[1] is None else min(p[1], us)
        if t == "signup":
            p[2] = us if p[2] is None else min(p[2], us)
        hz = max(hz, us)
    subjects = defaultdict(list)
    for uid, (t0, tp, tsg) in per.items():
        first = min(tp or BIG, tsg or BIG)
        if first == BIG:
            cause, end = 0, hz
        elif (tp or BIG) <= (tsg or BIG):
            cause, end = 1, first
        else:
            cause, end = 2, first
        subjects[uid % 3].append(
            (int(math.floor((end - t0) / 3600000000.0)) + 1, cause)
        )
    got = defaultdict(dict)
    for r in entry.queries()["cumulative_incidence"](spark, SF_DIR).collect():
        got[r["cohort"]][r["t"]] = r
    for cohort, subs in subjects.items():
        times = sorted({t for t, c in subs if c in (1, 2)})
        S, cif1, cif2 = 1.0, 0.0, 0.0
        seen_times = set()
        # walk every distinct time in order (including censor-only times)
        all_times = sorted({t for t, _ in subs})
        for t in all_times:
            d1 = sum(1 for tt, c in subs if tt == t and c == 1)
            d2 = sum(1 for tt, c in subs if tt == t and c == 2)
            n = sum(1 for tt, _ in subs if tt >= t)
            if d1 + d2 > 0:
                cif1 += S * d1 / n
                cif2 += S * d2 / n
                S *= (n - d1 - d2) / n
                r = got[cohort][t]
                cen = sum(1 for tt, c in subs if tt == t and c == 0)
                assert (r["n_risk"], r["d1"], r["d2"], r["n_censored"]) == (
                    n, d1, d2, cen,
                )
                assert abs(r["surv"] - S) < 1e-8
                assert abs(r["cif1"] - cif1) < 1e-8
                assert abs(r["cif2"] - cif2) < 1e-8
                seen_times.add(t)
        assert set(got[cohort]) == seen_times
        # competing-risks identity: S + CIF1 + CIF2 = 1 at every step
        last = got[cohort][max(seen_times)]
        assert abs(last["surv"] + last["cif1"] + last["cif2"] - 1.0) < 1e-8


def test_fellegi_sunter_matches_brute(spark):
    rows = duckdb.sql(
        f"""SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal, c_name
            FROM read_parquet('{SF_DIR}/customer.parquet')
            WHERE c_custkey < 2000"""
    ).fetchall()
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    noisy = []
    for k, nat, seg, bal, name in rows:
        nseg = segs[(k * 7919 % 5)] if k * 48271 % 5 == 0 else seg
        nbal = bal + (50.0 if k * 69069 % 7 == 0 else 0.0)
        noisy.append((k, nat, nseg, nbal, name[-3:]))
    W = {
        "seg": (math.log(0.95 / 0.2), math.log(0.05 / 0.8)),
        "bal": (math.log(0.9 / 0.01), math.log(0.1 / 0.99)),
        "name": (math.log(0.99 / 0.001), math.log(0.01 / 0.999)),
    }
    tab = defaultdict(lambda: [0, None, None])
    by_nat = defaultdict(list)
    for rec in noisy:
        by_nat[rec[1]].append(rec)
    for k, nat, seg, bal, name in rows:
        for nk, _, nseg, nbal, nsuf in by_nat[nat]:
            s = (
                (W["seg"][0] if seg == nseg else W["seg"][1])
                + (W["bal"][0] if abs(bal - nbal) <= 1.0 else W["bal"][1])
                + (W["name"][0] if name[-3:] == nsuf else W["name"][1])
            )
            dec = "link" if s > 5.0 else ("non_link" if s < 0.0 else "possible")
            key = (int(k == nk), dec)
            cell = tab[key]
            cell[0] += 1
            cell[1] = s if cell[1] is None else min(cell[1], s)
            cell[2] = s if cell[2] is None else max(cell[2], s)
    got = {
        (r["is_true"], r["decision"]): r
        for r in entry.queries()["fellegi_sunter"](spark, SF_DIR).collect()
    }
    assert set(got) == set(tab)
    for key, (n, mn, mx) in tab.items():
        r = got[key]
        assert r["n_pairs"] == n
        assert abs(r["min_score"] - mn) < 1e-7
        assert abs(r["max_score"] - mx) < 1e-7
    # every true pair must land in link or possible, never non_link
    assert (1, "non_link") not in tab


def test_mutual_information_matches_python(spark):
    rows = duckdb.sql(
        f"""SELECT c_mktsegment, c_nationkey
            FROM read_parquet('{SF_DIR}/customer.parquet')"""
    ).fetchall()
    joint = Counter(rows)
    nx = Counter()
    ny = Counter()
    for (x, y), n in joint.items():
        nx[x] += n
        ny[y] += n
    n = sum(joint.values())
    mi = sum(
        c / n * math.log(c * n / (nx[x] * ny[y]))
        for (x, y), c in joint.items()
    )
    chi2 = sum(
        (c - nx[x] * ny[y] / n) ** 2 / (nx[x] * ny[y] / n)
        for (x, y), c in joint.items()
    )
    r = entry.queries()["mutual_information"](spark, SF_DIR).collect()[0]
    assert r["n"] == n
    assert r["n_cells"] == len(joint)
    assert abs(r["mi_nats"] - mi) < 1e-8
    assert abs(r["chi2"] - chi2) < 1e-6
    assert r["mi_nats"] >= -1e-12
