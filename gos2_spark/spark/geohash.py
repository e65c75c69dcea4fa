"""Geohash encoding — the third ubiquitous hierarchical spatial key
(alongside S2 cells and web-mercator quadkeys), provided for interop with
systems keyed on geohashes.

The classic bisection definition is equivalent to fixed-point scaling:
with p = ceil(5 * length / 2) bits per axis,
    L = floor((lng + 180) / 360 * 2^p),  A = floor((lat + 90) / 180 * 2^p)
interleaved MSB-first starting with longitude, then emitted as base-32
digits ("0123456789bcdefghjkmnpqrstuvwxyz"). Everything below is ONE
whole-stage-codegen parsed-SQL expression per column — integer shifts and
a character lookup, no UDF — and the same algebra replays in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _axis_sql(col: str, offset: float, span: float, bits: int) -> str:
    n = 1 << bits
    return (
        f"greatest(0L, least({n - 1}L, "
        f"cast(floor(({col} + {offset!r}) / {span!r} * {n}) as bigint)))"
    )


def geohash_sql(lat_col: str, lng_col: str, length: int = 8) -> str:
    """SQL expression string for the geohash of (lat_col, lng_col)."""
    bits = 5 * length
    p = (bits + 1) // 2  # lng gets the extra bit on odd lengths
    lng_e = _axis_sql(lng_col, 180.0, 360.0, p)
    lat_e = _axis_sql(lat_col, 90.0, 180.0, bits // 2)
    # interleave: lng bit i -> value bit 2i+1(+parity), lat bit i -> 2i,
    # expressed as a sum over the per-axis bits
    if bits % 2 == 0:
        v = (
            f"aggregate(sequence(0, {p - 1}), 0L, (acc, i) -> acc"
            f" + shiftleft(shiftright({lng_e}, i) % 2, 2 * i + 1)"
            f" + shiftleft(shiftright({lat_e}, i) % 2, 2 * i))"
        )
    else:  # odd total bits: lng has one extra (top) bit
        v = (
            f"aggregate(sequence(0, {p - 1}), 0L, (acc, i) -> acc"
            f" + shiftleft(shiftright({lng_e}, i) % 2, 2 * i)"
            f" + (CASE WHEN i < {bits // 2}"
            f" THEN shiftleft(shiftright({lat_e}, i) % 2, 2 * i + 1)"
            f" ELSE 0L END))"
        )
        # odd case: first (top) bit is lng -> lng at even offsets from the
        # bottom; lat interleaves above
    return (
        f"concat_ws('', transform(sequence({length - 1}, 0, -1), "
        f"j -> substr('{BASE32}', cast(shiftright({v}, 5 * j) % 32 as int)"
        f" + 1, 1)))"
    )


def geohash(lat: str, lng: str, length: int = 8) -> Column:
    """Geohash column from lat/lng COLUMN NAMES (parsed SQL — the shift
    amounts are columns, which pyspark's function wrappers reject)."""
    return F.expr(geohash_sql(lat, lng, length))
