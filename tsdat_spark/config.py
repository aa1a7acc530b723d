"""Declared dataset schemas — the relational analog of tsdat's dataset.yaml.

tsdat declares the output dataset shape (coords, data_vars, dtypes, attrs,
_FillValue, QC thresholds) in pydantic-validated yaml
(``tsdat/config/dataset/dataset_config.py:20-116``,
``tsdat/config/variables/variable.py:29-36``). Here the same information is
plain dataclasses: a ``DatasetSpec`` describes the canonical table (series
key columns + one ``ts`` time column + typed value columns), and per-variable
``attrs`` carry the QC thresholds that the checker factories read
(``tsdat/qc/checkers/threshold_checker.py:9-29``: threshold values come from
variable attributes named by ``attribute_name``; list-valued attributes use
``[0]`` for min and ``[-1]`` for max).

Missing data is NULL internally; ``fill_value`` only matters at read/write
boundaries (tsdat encodes missing as ``_FillValue=-9999`` in stored files,
``tsdat/config/variables/variable.py:64-81``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

_DTYPE_MAP = {
    # numpy dtype string (tsdat config) -> spark sql type string
    "float": "double",
    "float64": "double",
    "float32": "float",
    "double": "double",
    "int": "int",
    "int32": "int",
    "int64": "long",
    "long": "long",
    "int8": "tinyint",
    "int16": "smallint",
    "uint8": "smallint",
    "uint16": "int",
    "uint32": "long",
    "str": "string",
    "string": "string",
    "datetime64[ns]": "timestamp",
    "timestamp": "timestamp",
    "bool": "boolean",
    "binary": "binary",
}


def spark_dtype(dtype: str) -> str:
    """Map a tsdat/numpy dtype string to a Spark SQL type string."""
    return _DTYPE_MAP.get(dtype, dtype)


@dataclass
class VariableSpec:
    """One declared variable (tsdat ``Variable``: name, dtype, attrs).

    ``source_names`` lists candidate raw input column names in priority
    order — tsdat's multi-candidate retrieval rename
    (``tsdat/io/retrievers/_rename_variables.py:16-91``): the first
    candidate present in the input supplies the variable.
    """

    name: str
    dtype: str = "double"
    source_names: list[str] = field(default_factory=list)
    fill_value: Any | None = None
    attrs: dict[str, Any] = field(default_factory=dict)
    # static value: variable not retrieved but injected as a constant
    # (tsdat `data:` vars, tsdat/pipeline/base/pipeline.py:93-115)
    static_value: Any | None = None

    @property
    def spark_type(self) -> str:
        return spark_dtype(self.dtype)

    def threshold(self, attribute_name: str, min_: bool) -> float | None:
        """tsdat ThresholdChecker._get_threshold semantics
        (``tsdat/qc/checkers/threshold_checker.py:19-29``)."""
        value = self.attrs.get(attribute_name)
        if value is None:
            return None
        if isinstance(value, (list, tuple)):
            value = value[0] if min_ else value[-1]
        return float(value)


@dataclass
class DatasetSpec:
    """Declared output table: series keys + time column + variables.

    The relational analog of tsdat's DatasetConfig: coords map to
    ``series_keys + ts_col``, data_vars map to ``variables``.
    """

    name: str
    ts_col: str = "ts"
    series_keys: list[str] = field(default_factory=list)
    variables: dict[str, VariableSpec] = field(default_factory=dict)

    def var(self, name: str) -> VariableSpec:
        return self.variables[name]

    @property
    def declared_columns(self) -> list[str]:
        return [*self.series_keys, self.ts_col, *self.variables.keys()]


def transcripts_spec() -> DatasetSpec:
    """The canonical engine input: multi-turn conversation transcripts
    (conv_id, turn_idx, role, text, tool, ts)."""
    return DatasetSpec(
        name="transcripts",
        ts_col="ts",
        series_keys=["conv_id", "turn_idx", "role", "tool"],
        variables={
            "conv_id": VariableSpec("conv_id", "string"),
            "turn_idx": VariableSpec("turn_idx", "int"),
            "role": VariableSpec("role", "string"),
            "text": VariableSpec("text", "string"),
            "tool": VariableSpec("tool", "string"),
        },
    )
