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


def _lazy(modname: str, clsname: str):
    """Deferred reader construction for the default dispatch table."""

    class _Lazy:
        def read(self, spark, path):
            import importlib

            mod = importlib.import_module(modname, package=__package__)
            return getattr(mod, clsname)().read(spark, path)

    return _Lazy()


#: default pattern -> reader mapping (a retrieval yaml overrides this)
DEFAULT_READERS: list[tuple[str, object]] = [
    (r".*\.csv$", CSVReader()),
    (r".*\.parquet$", ParquetReader()),
    (r".*\.json(l)?$", JSONReader()),
    (r".*\.nc$", _lazy(".netcdf3", "NetCDF3Reader")),
    (r".*\.zarr/?$", _lazy(".zarr2", "ZarrReader")),
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

# Spark simpleString -> pandas dtype. Integers and booleans use pandas
# NULLABLE extension dtypes ('Int64' etc.) so a member file with a missing
# declared column (all-None series) or NaN holes null-fills instead of
# raising TypeError/IntCastingNaNError and crashing the whole archive scan;
# Arrow transfers nullable ints losslessly to Spark's int types.
_SPARK_TO_PANDAS = {
    "bigint": "Int64", "int": "Int32", "smallint": "Int16", "tinyint": "Int8",
    "double": "float64", "float": "float32", "string": "object",
    "boolean": "boolean", "timestamp": "datetime64[us]", "date": "datetime64[us]",
}


def parse_ddl_fields(spark: SparkSession, schema_ddl: str) -> list[tuple[str, str]]:
    """DRIVER-side DDL parse via Catalyst (``StructType.fromDDL`` — handles
    parameterized types like decimal(10,2) that a naive split(',') breaks
    on). Returns picklable (name, simpleString) pairs for executor closures,
    where no JVM parser exists."""
    from pyspark.sql.types import StructType

    return [(f.name, f.dataType.simpleString()) for f in StructType.fromDDL(schema_ddl).fields]


def _coerce_to_schema(pdf, fields: list[tuple[str, str]]):
    """Coerce a pandas frame to parsed schema fields (names, order, dtypes).
    Missing columns null-fill; runs on executors (no Spark API calls)."""
    import decimal

    import pandas as pd

    out = {}
    for name, typ in fields:
        col = pdf[name] if name in pdf.columns else pd.Series([None] * len(pdf))
        if typ in ("timestamp", "date"):
            col = pd.to_datetime(col)
        elif typ.startswith("decimal"):
            col = col.map(lambda v: None if pd.isna(v) else decimal.Decimal(str(v)))
        else:
            pd_type = _SPARK_TO_PANDAS.get(typ, "object")
            if pd_type != "object":
                col = col.astype(pd_type)
            else:
                col = col.astype("object").where(col.notna(), None)
        out[name] = col
    return pd.DataFrame(out)


#: inner-member format dispatch: first regex match wins (tsdat's TarReader
#: dispatches members to ANY registered reader by regex, tar_reader.py:12-108;
#: formats are named by string so the closure stays picklable).
DEFAULT_MEMBER_FORMATS: tuple[tuple[str, str], ...] = (
    (r".*\.csv$", "csv"),
    (r".*\.jsonl$", "jsonl"),
    (r".*\.json$", "json"),
)


@dataclass(frozen=True)
class ArchiveReader:
    """Shared tar/zip logic; ``kind`` ∈ {"tar", "zip"}.

    ``member_pattern`` selects members; matched members are parsed by the
    first ``member_formats`` regex that accepts the name (csv / json /
    jsonl — tsdat's inner-reader dispatch). Filtering happens on member
    NAMES before any bytes are extracted, so a large excluded member is
    never read. ``exclude`` mirrors tsdat's default exclusions
    (tar_reader.py:50-52).
    """

    kind: str
    schema: str  # required member DDL
    member_pattern: str = r".*\.(csv|jsonl?)$"
    sep: str = ","
    exclude: tuple[str, ...] = (r".*__MACOSX/.*", r".*DS_Store")
    add_member_col: bool = False
    member_formats: tuple[tuple[str, str], ...] = DEFAULT_MEMBER_FORMATS

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        import io as _io
        import tarfile
        import zipfile
        from typing import Iterator

        import pandas as pd

        kind = self.kind
        fields = parse_ddl_fields(spark, self.schema)
        pattern, sep = self.member_pattern, self.sep
        exclude = self.exclude
        formats = self.member_formats
        add_member = self.add_member_col
        out_schema = self.schema + (", __member string" if add_member else "")

        blobs = spark.read.format("binaryFile").load(path).select("path", "content")

        def wanted(name: str) -> bool:
            return (
                not any(re.match(e, name) for e in exclude)
                and re.match(pattern, name) is not None
            )

        def parse_member(name: str, data: bytes) -> pd.DataFrame:
            # first matching format wins; a member that matches the caller's
            # member_pattern but no format regex (e.g. .dat/.txt with a
            # custom sep) parses as CSV — the pre-round-3 behavior
            fmt = next((f for p, f in formats if re.match(p, name)), "csv")
            if fmt == "csv":
                return pd.read_csv(_io.BytesIO(data), sep=sep)
            if fmt == "jsonl":
                return pd.read_json(_io.BytesIO(data), lines=True)
            if fmt == "json":
                return pd.read_json(_io.BytesIO(data))
            raise ValueError(f"unknown member format {fmt!r} for {name!r}")

        def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for blob in pdf["content"]:
                    buf = _io.BytesIO(bytes(blob))
                    # filter by NAME first; only matching members' bytes are
                    # ever extracted from the archive stream
                    if kind == "tar":
                        with tarfile.open(fileobj=buf) as tf:
                            members = [
                                (m.name, tf.extractfile(m).read())
                                for m in tf.getmembers()
                                if m.isfile() and wanted(m.name)
                            ]
                    else:
                        with zipfile.ZipFile(buf) as zf:
                            members = [
                                (n, zf.read(n)) for n in zf.namelist()
                                if not n.endswith("/") and wanted(n)
                            ]
                    for name, data in members:
                        out = _coerce_to_schema(parse_member(name, data), fields)
                        if add_member:
                            out["__member"] = name
                        yield out

        return blobs.mapInPandas(unpack, out_schema)


def TarReader(schema: str, **kw) -> ArchiveReader:
    return ArchiveReader(kind="tar", schema=schema, **kw)


def ZipReader(schema: str, **kw) -> ArchiveReader:
    return ArchiveReader(kind="zip", schema=schema, **kw)


# ---------------------------------------------------------------------------
# A2e CSV: metadata-header CSV files (a2e_csv_reader.py:14-84). Layout:
#   line 0:            header=<N>       (data column header is file line N)
#   lines 1..N-1:      key=value        global attributes
#                      var:attr=value   per-variable attributes (incl. dtype)
#   line N:            csv column header, data follows
# Dims ride in the filename: <...>.time.1d.a2e.csv / <...>.time.depth.2d...
# ---------------------------------------------------------------------------

_A2E_META_RE = re.compile(r"^([\w\s]+)=(.+)$", re.MULTILINE)
_A2E_VAR_RE = re.compile(r"^([\w\s]+):(\w+)=(.+)$", re.MULTILINE)


def a2e_dims_from_filename(input_key: str) -> list[str]:
    """buoy.z07.a0.20221117.001000.metocean.time.1d.a2e.csv → ['time']."""
    parts = input_key.split(".")
    n_dims = int(parts[-3][:-1])
    return parts[-3 - n_dims : -3]


def parse_a2e_metadata(text: str):
    """→ (global_attrs, var_attrs, dtypes) from the metadata block."""
    global_attrs: dict[str, str] = {}
    var_attrs: dict[str, dict[str, str]] = {}
    dtypes: dict[str, str] = {}
    for var, att, val in _A2E_VAR_RE.findall(text):
        val = val.strip('"')
        if att == "dtype":
            dtypes[var] = val
        else:
            var_attrs.setdefault(var, {})[att] = val
    for key, val in _A2E_META_RE.findall(text):
        if ":" not in key:
            global_attrs[key] = val.strip('"')
    return global_attrs, var_attrs, dtypes


def read_a2e_header(path: str):
    """Driver-side header read of ONE file (the metadata block is tiny;
    byte access goes through the ``io.fs`` seam, so an object-store path
    works once a filesystem is registered for its scheme).
    → (header_line_idx, global_attrs, var_attrs, dtypes, columns)."""
    from .fs import get_filesystem

    fs = get_filesystem(path)
    first = fs.read_head_lines(path, 1)[0]
    header_idx = int(first.split("=")[1])
    lines = fs.read_head_lines(path, header_idx + 1)[1:]
    meta_text = "".join(lines[: header_idx - 1])
    g, v, d = parse_a2e_metadata(meta_text)
    columns = [c.strip() for c in lines[header_idx - 1].strip().split(",")]
    return header_idx, g, v, d, columns


@dataclass(frozen=True)
class A2eCSVReader:
    """Distributed A2e reader: the schema comes from ONE file's metadata
    block (driver-side peek through the ``io.fs`` scheme registry — local
    by default, object stores via ``register_filesystem``); the data parse
    is a binaryFile scan + per-file pandas
    parse, so a directory of day-files fans out across executors. Global /
    variable attributes are exposed via :func:`read_a2e_header`."""

    time_col: str = "time"
    time_format: str = "%Y-%m-%d %H:%M:%S.%f"

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        import glob as _glob
        import io as _io
        import os
        from typing import Iterator

        import pandas as pd

        if os.path.isdir(path):
            candidates = sorted(_glob.glob(os.path.join(path, "*.csv")))
        else:
            candidates = sorted(_glob.glob(path)) or [path]
        header_idx, _, _, dtypes, columns = read_a2e_header(candidates[0])

        from ..config import spark_dtype

        def ddl_type(col: str) -> str:
            if col == self.time_col:
                return "timestamp"
            return spark_dtype(dtypes.get(col, "double"))

        schema = ", ".join(f"{c} {ddl_type(c)}" for c in columns)
        time_col, time_format = self.time_col, self.time_format
        # nullable pandas dtypes for integral columns: a declared int column
        # with missing values ("" cells) must null-fill, not crash the parse
        nullable = {"int64": "Int64", "int32": "Int32", "int16": "Int16",
                    "int8": "Int8", "uint8": "UInt8", "uint16": "UInt16",
                    "uint32": "UInt32", "bool": "boolean"}
        pd_dtypes = {c: nullable.get(dtypes[c], dtypes[c])
                     for c in columns if c in dtypes and c != time_col}

        blobs = spark.read.format("binaryFile").load(
            path if not os.path.isdir(path) else os.path.join(path, "*.csv")
        ).select("content")

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for blob in pdf["content"]:
                    text = bytes(blob).decode()
                    hdr = int(text.split("\n", 1)[0].split("=")[1])
                    inner = pd.read_csv(_io.StringIO(text), header=hdr, dtype=pd_dtypes)
                    if time_col in inner.columns:
                        inner[time_col] = pd.to_datetime(inner[time_col], format=time_format)
                    yield inner[columns]

        return blobs.mapInPandas(parse, schema)
