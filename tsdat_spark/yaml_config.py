"""Declarative YAML pipeline config — tsdat's UX surface on the Spark engine.

tsdat pipelines are driven by ``pipeline.yaml`` files that link retriever /
dataset / quality / storage configs (inline or by ``path:`` +
jsonpointer ``overrides:``) and instantiate plugin classes depth-first from
``classname:`` nodes:

- ``PipelineConfig.from_yaml`` + override merging —
  ``tsdat/config/pipeline/pipeline_config.py:96-140``
- ``recursive_instantiate`` — ``tsdat/config/utils/recursive_instantiate.py:17-82``
- per-input-key retrieval rules —
  ``tsdat/io/retrievers/input_key_retrieval_rules.py:13-36``

This module reads the same yaml shapes and instantiates *this* engine's
components: tsdat classnames are mapped onto the Spark-native registries
(readers, converters, checkers, handler actions, storage); unrecognized
classnames are imported as dotted paths so user extensions keep working
(the ``classname:`` plugin contract).

The result is a :class:`PipelineSpec` whose :meth:`PipelineSpec.run` executes
retrieve → standardize → QC → store as ONE lazy DataFrame program via
:func:`tsdat_spark.pipeline.run_ingest`.
"""

from __future__ import annotations

import importlib
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml
from jsonpointer import set_pointer

from .config import DatasetSpec, VariableSpec
from .io.converters import StringToDatetime, UnitsConverter
from .io.readers import CSVReader, JSONReader, ParquetReader
from .qc import checkers as qc_checkers
from .qc.manager import QualityManager, build_threshold_checker


class ConfigError(ValueError):
    pass


def read_yaml(path: str | Path) -> dict:
    with open(path) as f:
        data = yaml.safe_load(f)
    if not isinstance(data, dict):
        raise ConfigError(f"{path}: expected a yaml mapping")
    return data


def _apply_overrides(doc: dict, overrides: dict[str, Any] | None) -> dict:
    for pointer, value in (overrides or {}).items():
        set_pointer(doc, pointer, value)
    return doc


def _resolve_linked(node: Any, base_dir: Path) -> dict:
    """Resolve tsdat's Overrideable shape: ``{path: ..., overrides: {...}}``
    (pipeline_config.py:96-114); inline mappings pass through."""
    if isinstance(node, dict) and "path" in node and set(node) <= {"path", "overrides"}:
        p = Path(node["path"])
        if not p.is_absolute():
            p = (base_dir / p).resolve()
        return _apply_overrides(read_yaml(p), node.get("overrides"))
    if isinstance(node, dict):
        return node
    raise ConfigError(f"expected mapping or {{path, overrides}}, got {node!r}")


# ---------------------------------------------------------------------------
# classname registry: tsdat plugin names -> this engine's components
# ---------------------------------------------------------------------------

def _mk_csv_reader(params: dict) -> CSVReader:
    # tsdat CSVReader carries pandas read_csv kwargs (csv_reader.py:19-23);
    # map the common ones onto Spark csv options.
    kw = dict(params.get("read_csv_kwargs", {}))
    sep = kw.pop("sep", ",")
    header = kw.pop("header", 0) is not None
    return CSVReader(header=header, sep=sep, schema=params.get("schema"),
                     options=params.get("options", {}))


def _mk_archive_reader(kind: str):
    def make(params: dict):
        from .io.readers import ArchiveReader

        return ArchiveReader(
            kind=kind,
            schema=params["schema"],
            member_pattern=params.get("member_pattern", r".*\.csv$"),
            sep=params.get("sep", ","),
        )

    return make


_READER_FACTORIES = {
    "CSVReader": _mk_csv_reader,
    "ParquetReader": lambda p: ParquetReader(),
    "JSONReader": lambda p: JSONReader(schema=p.get("schema"), options=p.get("options", {})),
    "TarReader": _mk_archive_reader("tar"),
    "ZipReader": _mk_archive_reader("zip"),
    # classic-format sci readers (from-spec, no netCDF4/zarr libs needed)
    "NetCDFReader": lambda p: _nc3_reader(dim=p.get("dim", "time")),
    "ZarrReader": lambda p: _zarr_reader(dim=p.get("dim", "time")),
}


def _nc3_reader(**kw):
    from .io.netcdf3 import NetCDF3Reader

    return NetCDF3Reader(**kw)


def _zarr_reader(**kw):
    from .io.zarr2 import ZarrReader

    return ZarrReader(**kw)

_CONVERTER_FACTORIES = {
    "StringToDatetime": lambda p: StringToDatetime(
        format=p.get("format"), timezone=p.get("timezone")
    ),
    "UnitsConverter": lambda p: UnitsConverter(
        input_units=p.get("input_units"), output_units=p.get("output_units")
    ),
    # NearestNeighbor as an io converter is a grid transform; retrieval-time
    # application is a no-op column pass-through here (the transform layer
    # owns reindexing) — kept for config compatibility.
    "NearestNeighbor": lambda p: (lambda col: col),
}

_HANDLER_ACTIONS = {
    # tsdat handler classname -> (action tuple builder)
    "RecordQualityResults": lambda p: ("record", p.get("assessment", "Bad")),
    "RemoveFailedValues": lambda p: ("remove",),
    "FailPipeline": lambda p: ("fail", p.get("tolerance", 0.0)),
    "SortDatasetByCoordinate": lambda p: ("sort",),
    "CubicSplineInterp": lambda p: (
        "cubic_spline",
        p.get("n_points", 12),
        p.get("max_gap", 6),
    ),
    "DataQualityError": lambda p: ("fail", p.get("tolerance", 0.0)),
}


def _leaf(classname: str) -> str:
    return classname.rsplit(".", 1)[-1]


def _import_string(classname: str):
    mod, _, name = classname.rpartition(".")
    try:
        return getattr(importlib.import_module(mod), name)
    except Exception as exc:  # pragma: no cover - extension path
        raise ConfigError(f"cannot import classname {classname!r}: {exc}") from exc


def _instantiate_reader(node: dict):
    leaf = _leaf(node["classname"])
    params = node.get("parameters", {})
    if leaf in _READER_FACTORIES:
        return _READER_FACTORIES[leaf](params)
    return _import_string(node["classname"])(**params)


def _instantiate_converter(node: dict):
    leaf = _leaf(node["classname"])
    params = {k: v for k, v in node.items() if k not in ("classname", "parameters")}
    params.update(node.get("parameters", {}))
    if leaf in _CONVERTER_FACTORIES:
        return _CONVERTER_FACTORIES[leaf](params)
    return _import_string(node["classname"])(**params)


def _checker_factory(node: dict):
    """Map a tsdat checker classname to this engine's checker callable
    (signature: (df, ctx, var, spec) -> Column | None)."""
    leaf = _leaf(node["classname"])
    params = node.get("parameters", {})
    if leaf in qc_checkers.THRESHOLD_CHECKERS:
        return build_threshold_checker(leaf)
    if leaf == "CheckMissing":
        def _missing(df, ctx, var, spec):
            vspec = spec.variables.get(var)
            kind = "float"
            if vspec is not None and vspec.spark_type in ("string",):
                kind = "string"
            elif var == spec.ts_col or (vspec and vspec.spark_type == "timestamp"):
                kind = "timestamp"
            elif vspec and vspec.spark_type in ("int", "long", "smallint", "tinyint"):
                kind = "int"
            from pyspark.sql import functions as F
            fv = vspec.fill_value if vspec else None
            return qc_checkers.check_missing(F.col(var), fill_value=fv, kind=kind)
        return _missing
    if leaf == "CheckMonotonic":
        direction = "auto"
        if params.get("require_increasing"):
            direction = "increasing"
        elif params.get("require_decreasing"):
            direction = "decreasing"
        def _mono(df, ctx, var, spec, direction=direction):
            from pyspark.sql import functions as F
            return qc_checkers.check_monotonic(ctx, F.col(var), direction=direction)
        return _mono
    if leaf == "CheckArrayMaskThreshold":
        def _mask(df, ctx, var, spec):
            from pyspark.sql import functions as F
            return qc_checkers.check_mask_threshold(
                F.col(var), params["threshold"], params.get("comparator", ">=")
            )
        return _mask
    return _import_string(node["classname"])(**params)


# ---------------------------------------------------------------------------
# config section models
# ---------------------------------------------------------------------------

@dataclass
class VarRule:
    """One retrieval rule: candidate source names + converters, optionally
    restricted to input keys matching ``pattern`` (per-input-key rules)."""

    pattern: str | None  # None = applies to every input key
    source_names: list[str]
    converters: list = field(default_factory=list)

    def matches(self, input_key: str) -> bool:
        return self.pattern is None or re.match(self.pattern, input_key) is not None


@dataclass
class RetrieverSpec:
    readers: list[tuple[str, object]]  # (pattern, reader), first match wins
    rules: dict[str, list[VarRule]]  # output variable -> prioritized rules


@dataclass
class StorageSpec:
    kind: str = "filesystem"
    parameters: dict = field(default_factory=dict)
    #: storage file format, chosen by the yaml handler's writer classname
    #: (tsdat FileHandler reader+writer pairs, csv_handler.py:9-12)
    format: str = "parquet"
    writer_parameters: dict = field(default_factory=dict)

    @property
    def data_storage_path(self) -> str | None:
        return self.parameters.get("data_storage_path")


@dataclass
class PlotSpec:
    """The ``hook_plot_dataset`` lifecycle slot as a yaml section (the
    reference implements it as a method override on the pipeline subclass,
    ``ingest_pipeline.py:79-87``; declaratively: which variables to plot
    and where the ancillary files land). Rendering is scale-correct M4
    downsampling + SVG (:mod:`tsdat_spark.plot`)."""

    variables: list[str]
    ts_col: str | None = None
    width_px: int = 800
    bins: int = 256
    storage_root: str | None = None  # default: <data_storage_path>/ancillary


@dataclass
class PipelineSpec:
    classname: str
    triggers: list[str]
    retriever: RetrieverSpec
    dataset: DatasetSpec
    quality: list[QualityManager]
    storage: StorageSpec
    attrs: dict = field(default_factory=dict)
    plot: PlotSpec | None = None

    def matches_input(self, input_key: str) -> bool:
        return any(re.match(t, input_key) for t in self.triggers)

    def run(self, spark, input_keys: list[str], table_path: str | None = None):
        """retrieve → standardize → QC → store (tsdat IngestPipeline.run).
        The storage handler's writer classname picks the sink: CSVWriter →
        :class:`~tsdat_spark.io.writers.CSVDatasetWriter` with attrs
        sidecars; default → date-partitioned tier write."""
        from .pipeline import run_ingest
        from .qc.checkers import QCContext
        from .retrieval import perform_data_retrieval

        raw = perform_data_retrieval(spark, input_keys, self.retriever, self.dataset)
        ctx = QCContext(series_keys=tuple(self.dataset.series_keys), order_cols=(self.dataset.ts_col,))
        writer = None
        if self.storage.format in ("csv", "a2e_csv", "netcdf", "netcdf4", "zarr", "zarr3"):
            from .io.hdf5_write import NetCDF4DatasetWriter
            from .io.netcdf3 import NetCDF3DatasetWriter
            from .io.writers import A2eCSVDatasetWriter, CSVDatasetWriter
            from .io.zarr2 import ZarrDatasetWriter

            cls = {"csv": CSVDatasetWriter, "a2e_csv": A2eCSVDatasetWriter,
                   "netcdf": NetCDF3DatasetWriter, "netcdf4": NetCDF4DatasetWriter,
                   "zarr": ZarrDatasetWriter, "zarr3": ZarrDatasetWriter}[self.storage.format]
            params = dict(self.storage.writer_parameters)
            if self.storage.format == "zarr3":
                params.setdefault("zarr_format", 3)
            writer = cls(
                attrs=self.attrs,
                var_attrs={n: v.attrs for n, v in self.dataset.variables.items() if v.attrs},
                **params,
            )
        hook_plot = self._build_plot_hook() if self.plot else None
        return run_ingest(raw, self.dataset, ctx, self.quality, table_path=table_path,
                          writer=writer, hook_plot=hook_plot)

    def _build_plot_hook(self):
        """Compose :func:`tsdat_spark.plot.plot_dataset` +
        :class:`tsdat_spark.io.ancillary.AncillaryStorage` into the
        ``hook_plot`` observer ``run_ingest`` invokes after storage — the
        ``hook_plot_dataset`` slot, declared in yaml instead of a pipeline
        subclass. One bounded min/max agg finds the time range; per
        variable, ONE algebraic M4 groupBy reaches the driver with
        ≤ 4·bins points."""
        spec = self.plot
        root = spec.storage_root or (
            (self.storage.data_storage_path or "").rstrip("/") + "/ancillary"
            if self.storage.data_storage_path else None)
        if not root:
            raise ConfigError(
                "plot: needs storage_root (or storage data_storage_path)")
        attrs = self.attrs
        ts_default = self.dataset.ts_col

        def hook_plot(df):
            from pyspark.sql import functions as F

            from .io.ancillary import AncillaryStorage
            from .plot import plot_dataset

            ts = spec.ts_col or ts_default
            lo, hi = df.agg(F.min(ts), F.max(ts)).first()
            if lo is None:
                return  # empty dataset: nothing to plot (reference parity)
            storage = AncillaryStorage(root)
            with storage.uploadable_dir() as tmp:
                for col in spec.variables:
                    svg = plot_dataset(df, ts, col, lo, hi, title=col,
                                       width_px=spec.width_px, bins=spec.bins)
                    path = storage.get_ancillary_filepath(
                        title=col, root_dir=tmp, attrs=attrs, start=lo)
                    with open(path, "w", encoding="utf-8") as fh:
                        fh.write(svg)

        return hook_plot


def _parse_rules(section: dict, ts_col_hint: str | None = None) -> dict[str, list[VarRule]]:
    rules: dict[str, list[VarRule]] = {}
    for var, node in (section or {}).items():
        if node is None:
            node = {}
        var_rules: list[VarRule] = []
        is_per_key = node and all(isinstance(v, dict) and ("name" in v or "data_converters" in v)
                                  for v in node.values()) and "name" not in node
        items = node.items() if is_per_key else [(None, node)]
        for pattern, rule in items:
            names = rule.get("name", var)
            if isinstance(names, str):
                names = [names]
            convs = [_instantiate_converter(c) for c in rule.get("data_converters", [])]
            var_rules.append(VarRule(pattern, list(names), convs))
        rules[var] = var_rules
    return rules


def _parse_retriever(doc: dict) -> RetrieverSpec:
    readers = [(pat, _instantiate_reader(node)) for pat, node in (doc.get("readers") or {}).items()]
    rules = {**_parse_rules(doc.get("coords", {})), **_parse_rules(doc.get("data_vars", {}))}
    return RetrieverSpec(readers=readers, rules=rules)


_TIME_NAMES = ("time", "ts", "timestamp")


def _parse_dataset(doc: dict) -> DatasetSpec:
    attrs = doc.get("attrs", {})
    coords = doc.get("coords", {})
    data_vars = doc.get("data_vars", {})
    ts_col = next((c for c in coords if c.lower() in _TIME_NAMES), "time")
    series_keys = [c for c in coords if c != ts_col]
    variables: dict[str, VariableSpec] = {}
    for name, node in {**coords, **data_vars}.items():
        if name == ts_col:
            continue
        node = node or {}
        vattrs = dict(node.get("attrs") or {})
        fill = vattrs.pop("_FillValue", None)
        variables[name] = VariableSpec(
            name=name,
            dtype=node.get("dtype", "double"),
            fill_value=fill,
            attrs=vattrs,
            static_value=node.get("data"),
        )
    spec = DatasetSpec(
        name=attrs.get("dataset_name", doc.get("name", "dataset")),
        ts_col=ts_col,
        series_keys=series_keys,
        variables=variables,
    )
    spec.attrs = attrs  # type: ignore[attr-defined] — carried for datastream naming
    return spec


def _expand_apply_to(apply_to: list[str], dataset: DatasetSpec) -> list[str]:
    out: list[str] = []
    for a in apply_to:
        if a == "COORDS":
            out += [dataset.ts_col, *dataset.series_keys]
        elif a == "DATA_VARS":
            out += [v for v in dataset.variables if v not in dataset.series_keys]
        else:
            out.append(a)
    return out


def _parse_quality(doc: dict, dataset: DatasetSpec) -> list[QualityManager]:
    managers = []
    for m in doc.get("managers", []):
        checker = _checker_factory(m["checker"])
        actions = []
        for h in m.get("handlers", []):
            leaf = _leaf(h["classname"])
            params = h.get("parameters", {})
            if leaf in _HANDLER_ACTIONS:
                actions.append(_HANDLER_ACTIONS[leaf](params))
            else:
                actions.append(("custom", _import_string(h["classname"])(**params)))
        managers.append(
            QualityManager(
                name=m.get("name", _leaf(m["checker"]["classname"])),
                checker=checker,
                apply_to=_expand_apply_to(m.get("apply_to", []), dataset),
                exclude=m.get("exclude", []),
                handlers=actions,
            )
        )
    return managers


_WRITER_FORMATS = {
    # handler/writer classname leaf -> engine storage format
    "CSVHandler": "csv", "CSVWriter": "csv", "A2eCSVWriter": "a2e_csv",
    "ParquetHandler": "parquet", "ParquetWriter": "parquet",
    "NetCDFHandler": "netcdf", "NetCDFWriter": "netcdf",
    "SplitNetCDFWriter": "netcdf",
    "NetCDF4Writer": "netcdf4", "NetCDF4Handler": "netcdf4",
    "ZarrHandler": "zarr", "ZarrWriter": "zarr",
    "Zarr3Writer": "zarr3", "ZarrV3Writer": "zarr3",
}


def _parse_storage(doc: dict) -> StorageSpec:
    leaf = _leaf(doc.get("classname", "FileSystem"))
    kind = {"FileSystem": "filesystem", "FileSystemS3": "filesystem",
            "IcebergStorage": "iceberg"}.get(leaf, "filesystem")
    handler = doc.get("handler") or {}
    writer = handler.get("writer") or {}
    fmt_leaf = _leaf(writer.get("classname") or handler.get("classname") or "ParquetHandler")
    return StorageSpec(
        kind=kind,
        parameters=doc.get("parameters", {}),
        format=_WRITER_FORMATS.get(fmt_leaf, "parquet"),
        writer_parameters=writer.get("parameters", {}),
    )


def load_pipeline_yaml(path: str | Path, overrides: dict[str, Any] | None = None) -> PipelineSpec:
    """Read a tsdat-shape pipeline.yaml and instantiate this engine's
    pipeline components (see module docstring)."""
    path = Path(path)
    doc = _apply_overrides(read_yaml(path), overrides)
    base = path.parent
    try:
        dataset = _parse_dataset(_resolve_linked(doc["dataset"], base))
        retriever = _parse_retriever(_resolve_linked(doc["retriever"], base))
        quality = _parse_quality(_resolve_linked(doc.get("quality", {"managers": []}), base), dataset)
        storage = _parse_storage(_resolve_linked(doc.get("storage", {}), base))
        # retrieval rules carry candidate source names into the dataset spec
        for var, rules in retriever.rules.items():
            if var in dataset.variables and rules:
                dataset.variables[var].source_names = rules[0].source_names
        triggers = [str(t) for t in doc.get("triggers", [])]
        plot = None
        if doc.get("plot"):
            pnode = doc["plot"]
            variables = pnode.get("variables") or []
            if isinstance(variables, str):
                variables = [variables]
            if not variables:
                raise ConfigError("plot: section needs a variables list")
            plot = PlotSpec(
                variables=[str(v) for v in variables],
                ts_col=pnode.get("ts_col"),
                width_px=int(pnode.get("width_px", 800)),
                bins=int(pnode.get("bins", 256)),
                storage_root=pnode.get("storage_root"),
            )
        return PipelineSpec(
            classname=doc.get("classname", "tsdat_spark.PipelineSpec"),
            triggers=triggers,
            retriever=retriever,
            dataset=dataset,
            quality=quality,
            storage=storage,
            attrs=dict(getattr(dataset, "attrs", {}) or {}),
            plot=plot,
        )
    except ConfigError:
        raise
    except Exception as exc:
        raise ConfigError(f"error instantiating pipeline config {path}: {exc}") from exc
