"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the equivalent SQL on DuckDB over the same
parquet tables, then compares row count, column names, and values (columns
sorted by name, rows sorted, floats compared to 1e-9 relative).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows_close(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, (int, float)):
            if not math.isclose(x, float(y), rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif isinstance(x, tuple) and isinstance(y, tuple):
            if not _rows_close(x, y):
                return False
        elif x != y:
            return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from gos2_spark.spark.session import get_spark

    spark = get_spark(
        app_name="oracle-check", master="local[8]", shuffle_partitions=16
    )

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [
                tuple(_norm(r[c]) for c in scols) for r in sdf.collect()
            ]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark raised {e!r}")
            continue
        if name not in oracles:
            print(f"weak {name}: rows={len(srows)} (no oracle; rows-only check)")
            if not srows:
                print(f"  WARNING {name}: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetch_df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {e!r}")
            continue
        ocols = sorted(odf.columns)
        if scols != ocols:
            failures.append(name)
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            continue
        orows = [
            tuple(_norm(v) for v in row)
            for row in odf[ocols].itertuples(index=False, name=None)
        ]
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        sx, ox = sorted(srows, key=repr), sorted(orows, key=repr)
        bad = [i for i, (a, b) in enumerate(zip(sx, ox)) if not _rows_close(a, b)]
        if bad:
            failures.append(name)
            i = bad[0]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first at {i}:")
            print(f"  spark : {sx[i]}")
            print(f"  oracle: {ox[i]}")
        else:
            print(f"ok   {name}: rows={len(srows)}")
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
