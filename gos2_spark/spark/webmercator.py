"""Web-Mercator (slippy map) tile ids and quadkeys — the XYZ scheme map
servers speak, provided alongside the S2 index for interop (same role as
H3/S2: a hierarchical spatial key).

Everything is whole-stage-codegen column algebra (no UDF, no shuffle):
the standard OSM formulas
    x = floor((lng + 180) / 360 * 2^z)
    y = floor((1 - ln(tan(lat) + sec(lat)) / pi) / 2 * 2^z)
clamped to [0, 2^z - 1] (the south-pole row overflows by construction),
and the Bing-style quadkey = z base-4 digits interleaving (y, x) bits,
built with a transform over the bit positions.

Latitudes beyond the Mercator domain (|lat| > ~85.05) clamp to the edge
rows like every tile server does.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_PI = repr(math.pi)


def wm_tile_x(lng: Column, z: int) -> Column:
    n = 1 << z
    x = F.floor((lng + 180.0) / 360.0 * n).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), x))


def wm_tile_y(lat: Column, z: int) -> Column:
    n = 1 << z
    rad = F.radians(lat)
    y = F.floor(
        (1.0 - F.log(F.tan(rad) + 1.0 / F.cos(rad)) / float(_PI)) / 2.0 * n
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), y))


def wm_quadkey(x_col: str, y_col: str, z: int) -> Column:
    """Bing quadkey from tile-id COLUMN NAMES: z chars, digit_i = bit i
    of x + 2 * bit i of y, most significant first — prefix relationships
    mirror tile containment. Parsed-SQL transform (shiftright takes a
    column shift amount only in SQL form)."""
    return F.expr(
        f"concat_ws('', transform(sequence({z}, 1, -1), "
        f"i -> cast(shiftright({x_col}, i - 1) % 2 "
        f"+ 2 * (shiftright({y_col}, i - 1) % 2) as string)))"
    )
