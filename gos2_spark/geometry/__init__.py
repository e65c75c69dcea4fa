"""Driver-side region objects implementing the gos2 Region contract.

These are the small, broadcastable Python objects the coverer and join
builder operate on (one per query region / polygon tile — never per row).
The per-row hot path lives in ``gos2_spark.kernels``.
"""

from .angle import Angle  # noqa: F401
from .interval import R1Interval, S1Interval  # noqa: F401
from .metric import Metric, AVG_AREA, MIN_WIDTH, MAX_DIAG  # noqa: F401
from .cap import Cap  # noqa: F401
from .rect import Rect  # noqa: F401
from .cell import Cell  # noqa: F401
from .loop import Loop  # noqa: F401
from .polygon import Polygon, are_loops_valid  # noqa: F401
