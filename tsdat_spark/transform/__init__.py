"""Resampling / regridding transforms with tsdat transform_v2 semantics
(``/root/reference/tsdat/transform_v2`` is the normative spec — SURVEY §2.6)."""

from .grid import GridSpec, grid_dataframe  # noqa: F401
from .bin_average import bin_average  # noqa: F401
from .nearest import nearest_neighbor  # noqa: F401
from .interpolate import interpolate_linear  # noqa: F401
