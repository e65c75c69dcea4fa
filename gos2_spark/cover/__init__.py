"""Covering machinery: CellUnion normalization + RegionCoverer + flood fill."""

from .cellunion import CellUnion  # noqa: F401
from .coverer import RegionCoverer, flood_fill, simple_covering  # noqa: F401
