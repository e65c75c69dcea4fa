"""Prototype: full S2 leaf-cellid encode in pure DuckDB SQL, validated
bit-for-bit against the numpy kernel on the sf0.01 customer points."""

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np

from gos2_spark.kernels import hilbert as H
from gos2_spark.kernels import projection as PJ

LOOKUP = "[" + ",".join(str(int(v)) for v in H.LOOKUP_POS) + "]"
MAX_SIZE = H.MAX_SIZE


def cellid_cte(points_sql: str) -> str:
    """CTE chain: (key, lat, lng) -> (key, lat, lng, cell_id biased)."""
    ij = []
    for w, name in (("u", "i"), ("v", "j")):
        st = (
            f"CASE WHEN {w} >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * {w})"
            f" ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {w}) END"
        )
        ij.append(
            f"CAST(greatest(0, least({MAX_SIZE - 1},"
            f" floor({float(MAX_SIZE)!r} * ({st})))) AS BIGINT) AS {name}"
        )
    rounds = []
    prev = "r8"
    for k in range(7, -1, -1):
        key = f"(bits + ((i >> {k * 4}) & 15) * 64 + ((j >> {k * 4}) & 15) * 4)"
        rounds.append(
            f"r{k} AS (SELECT key, lat, lng, i, j,"
            f" (n | ((CAST(({LOOKUP})[{key} + 1] AS BIGINT) >> 2)"
            f" * {1 << (k * 8)})) AS n,"
            f" (CAST(({LOOKUP})[{key} + 1] AS BIGINT) & 3) AS bits"
            f" FROM {prev})"
        )
        prev = f"r{k}"
    return f"""
    pts AS ({points_sql}),
    xyz AS (
      SELECT key, lat, lng,
             cos(radians(lng)) * cos(radians(lat)) AS x,
             sin(radians(lng)) * cos(radians(lat)) AS y,
             sin(radians(lat)) AS z
      FROM pts
    ),
    fc AS (
      SELECT *, CASE WHEN abs(z) > greatest(abs(x), abs(y)) THEN 2
                     WHEN abs(y) > abs(x) THEN 1 ELSE 0 END AS fid
      FROM xyz
    ),
    fuv0 AS (
      SELECT key, lat, lng, x, y, z,
             CASE WHEN (CASE WHEN fid = 2 THEN z WHEN fid = 1 THEN y ELSE x END) < 0
                  THEN fid + 3 ELSE fid END AS face
      FROM fc
    ),
    fuv AS (
      SELECT key, lat, lng, face,
             CASE face WHEN 0 THEN y / x WHEN 1 THEN -x / y WHEN 2 THEN -x / z
                       WHEN 3 THEN z / x WHEN 4 THEN z / y ELSE -y / z END AS u,
             CASE face WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN -y / z
                       WHEN 3 THEN y / x WHEN 4 THEN -x / y ELSE -x / z END AS v
      FROM fuv0
    ),
    ijt AS (SELECT key, lat, lng, face, {ij[0]}, {ij[1]} FROM fuv),
    r8 AS (
      SELECT key, lat, lng, i, j,
             (CAST(face AS BIGINT) * {1 << (H.POS_BITS - 1)}) AS n,
             (CAST(face AS BIGINT) & 1) AS bits
      FROM ijt
    ),
    {",".join(rounds)},
    cells AS (
      -- biased(leaf) = (2n+1) XOR 2^63 interpreted as signed int64, which
      -- algebraically equals 2*(n - 2^62) + 1 for every valid n < 6*2^60:
      -- no unsigned type and no overflow needed.
      SELECT key, lat, lng,
             (2 * (n - 4611686018427387904) + 1) AS cell_id
      FROM r0
    )
    """


PTS = """
    SELECT c_custkey AS key,
           -60.0 + (c_custkey * 7 % 120) + (c_custkey % 97) / 97.0 AS lat,
           -170.0 + (c_custkey * 13 % 340) + (c_custkey % 89) / 89.0 AS lng
    FROM customer
"""


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('/root/testdata/{sf}/customer.parquet')"
    )
    df = con.execute(
        f"WITH {cellid_cte(PTS)} SELECT key, lat, lng, cell_id FROM cells ORDER BY key"
    ).fetch_df()
    ids_np = PJ.cellid_from_latlng(
        df["lat"].to_numpy(np.float64), df["lng"].to_numpy(np.float64)
    )
    biased = (ids_np.astype(np.uint64) ^ np.uint64(1 << 63)).view(np.int64)
    got = df["cell_id"].to_numpy(np.int64)
    n_bad = int((got != biased).sum())
    print(f"{sf}: {len(df)} points, {n_bad} mismatches")
    if n_bad:
        bad = np.nonzero(got != biased)[0][:5]
        for b in bad:
            print(df.iloc[b].to_dict(), hex(got[b]), hex(biased[b]))
    # token check
    tok_np = H.to_token(ids_np)
    tdf = con.execute(f"""
        WITH {cellid_cte(PTS)}
        SELECT key, rtrim(lower(lpad(to_hex(xor(cell_id, (-9223372036854775807 - 1))), 16, '0')), '0') AS token
        FROM cells ORDER BY key
    """).fetch_df()
    n_tok_bad = int((tdf["token"].to_numpy() != tok_np).sum())
    print(f"tokens: {n_tok_bad} mismatches")
    return 0 if n_bad == 0 and n_tok_bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
