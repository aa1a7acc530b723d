"""Input readers + first-regex-match dispatch.

tsdat's retriever maps regex patterns to reader instances and picks the
FIRST matching pattern per input key
(``tsdat/io/retrievers/default_retriever.py:79-87``,
``input_key_retrieval_rules.py:13-36``). Readers here return lazy Spark
DataFrames instead of eager xarray Datasets:

- :class:`CSVReader` — ``csv_reader.py:10-27``; pandas ``read_csv`` kwargs
  map onto Spark csv options (header/sep/etc.). Schema may be declared
  (preferred at scale: skips the inference pass) or inferred.
- :class:`ParquetReader` / :class:`JSONReader` — native scans.

All readers are thin: type coercion, renames, and converter application
belong to the standardize stage, exactly as in tsdat (readers "should
generally not be used to apply quality checks or transformations",
``tsdat/io/base/data_reader.py:14-20``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CSVReader:
    header: bool = True
    sep: str = ","
    schema: str | None = None  # DDL string; None → infer (one extra pass)
    options: dict = field(default_factory=dict)

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        reader = spark.read.option("header", str(self.header).lower()).option("sep", self.sep)
        if self.schema:
            reader = reader.schema(self.schema)
        else:
            reader = reader.option("inferSchema", "true")
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.csv(path)


@dataclass(frozen=True)
class ParquetReader:
    def read(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)


@dataclass(frozen=True)
class JSONReader:
    schema: str | None = None
    options: dict = field(default_factory=dict)

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        reader = spark.read
        if self.schema:
            reader = reader.schema(self.schema)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.json(path)


#: default pattern -> reader mapping (a retrieval yaml overrides this)
DEFAULT_READERS: list[tuple[str, object]] = [
    (r".*\.csv$", CSVReader()),
    (r".*\.parquet$", ParquetReader()),
    (r".*\.json(l)?$", JSONReader()),
]


def match_reader(input_key: str, readers: list[tuple[str, object]] | None = None):
    """First regex whose ``match`` accepts the key wins (tsdat
    ``_match_inputs`` order semantics); None when nothing matches."""
    for pattern, reader in readers or DEFAULT_READERS:
        if re.match(pattern, input_key):
            return reader
    return None


def read_input(
    spark: SparkSession,
    input_key: str,
    readers: list[tuple[str, object]] | None = None,
) -> DataFrame:
    """Dispatch ``input_key`` to its reader and return the scan DataFrame."""
    reader = match_reader(input_key, readers)
    if reader is None:
        raise ValueError(f"no reader pattern matches input key {input_key!r}")
    return reader.read(spark, input_key)


# ---------------------------------------------------------------------------
# Archive readers: tar / zip of member files (CSV/JSON), fully distributed.
#
# tsdat's TarReader/ZipReader (tar_reader.py:12-60, zip_reader.py) unpack an
# archive on the driver and dispatch members to inner readers by regex. At
# scale the right shape is: a binaryFile scan (one task per archive, archives
# spread across executors) + an Arrow-batched mapInPandas that unpacks each
# blob with the stdlib tarfile/zipfile and parses matching members with
# pandas — bytes never leave the executor. A declared DDL schema is required
# (schema inference over opaque blobs would mean a second distributed pass).
# ---------------------------------------------------------------------------

_SPARK_TO_PANDAS = {
    "bigint": "int64", "int": "int32", "smallint": "int16", "tinyint": "int8",
    "double": "float64", "float": "float32", "string": "object",
    "boolean": "bool", "timestamp": "datetime64[us]", "date": "datetime64[us]",
}


def _coerce_to_schema(pdf, schema_ddl: str):
    """Coerce a pandas frame to a Spark DDL schema (names, order, dtypes)."""
    import pandas as pd

    fields = []
    for part in schema_ddl.split(","):
        name, _, typ = part.strip().partition(" ")
        fields.append((name, typ.strip().lower()))
    out = {}
    for name, typ in fields:
        col = pdf[name] if name in pdf.columns else pd.Series([None] * len(pdf))
        pd_type = _SPARK_TO_PANDAS.get(typ, "object")
        if typ in ("timestamp", "date"):
            col = pd.to_datetime(col)
        elif pd_type != "object":
            col = col.astype(pd_type)
        else:
            col = col.astype("object").where(col.notna(), None)
        out[name] = col
    return pd.DataFrame(out)


@dataclass(frozen=True)
class ArchiveReader:
    """Shared tar/zip logic; ``kind`` ∈ {"tar", "zip"}.

    ``member_pattern`` selects members (first inner "reader" — only
    pandas-CSV members are supported in-image, matching tsdat's most common
    inner reader); ``exclude`` mirrors tsdat's default exclusions
    (tar_reader.py:50-52).
    """

    kind: str
    schema: str  # required member DDL
    member_pattern: str = r".*\.csv$"
    sep: str = ","
    exclude: tuple[str, ...] = (r".*__MACOSX/.*", r".*DS_Store")
    add_member_col: bool = False

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        import io as _io
        import tarfile
        import zipfile
        from typing import Iterator

        import pandas as pd

        kind = self.kind
        schema_ddl = self.schema
        pattern, sep = self.member_pattern, self.sep
        exclude = self.exclude
        add_member = self.add_member_col
        out_schema = schema_ddl + (", __member string" if add_member else "")

        blobs = spark.read.format("binaryFile").load(path).select("path", "content")

        def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for blob in pdf["content"]:
                    buf = _io.BytesIO(bytes(blob))
                    if kind == "tar":
                        with tarfile.open(fileobj=buf) as tf:
                            members = [
                                (m.name, tf.extractfile(m).read())
                                for m in tf.getmembers() if m.isfile()
                            ]
                    else:
                        with zipfile.ZipFile(buf) as zf:
                            members = [(n, zf.read(n)) for n in zf.namelist()
                                       if not n.endswith("/")]
                    for name, data in members:
                        if any(re.match(e, name) for e in exclude):
                            continue
                        if not re.match(pattern, name):
                            continue
                        inner = pd.read_csv(_io.BytesIO(data), sep=sep)
                        out = _coerce_to_schema(inner, schema_ddl)
                        if add_member:
                            out["__member"] = name
                        yield out

        return blobs.mapInPandas(unpack, out_schema)


def TarReader(schema: str, **kw) -> ArchiveReader:
    return ArchiveReader(kind="tar", schema=schema, **kw)


def ZipReader(schema: str, **kw) -> ArchiveReader:
    return ArchiveReader(kind="zip", schema=schema, **kw)
