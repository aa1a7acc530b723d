"""YAML pipeline config front end: linked configs + jsonpointer overrides +
classname instantiation (ported from tsdat's
test/config/test_pipeline_config.py and test/config/yaml/pipeline.yaml),
plus an end-to-end CSV ingest run driven entirely from yaml."""

import os

import pytest
from pyspark.sql import functions as F

from tsdat_spark.io.converters import StringToDatetime, UnitsConverter
from tsdat_spark.io.readers import CSVReader, ParquetReader, match_reader
from tsdat_spark.naming import get_datastream, storage_path
from tsdat_spark.yaml_config import ConfigError, load_pipeline_yaml

HERE = os.path.dirname(__file__)
PIPELINE_YAML = os.path.join(HERE, "config_yaml", "pipeline.yaml")


def test_pipeline_config_merges_overrides():
    spec = load_pipeline_yaml(PIPELINE_YAML)
    # jsonpointer overrides applied (pipeline_config.py:96-114 semantics)
    assert spec.attrs["location_id"] == "sgp"
    assert spec.dataset.variables["temp"].attrs["new_attribute"] == "please add this attribute"
    assert spec.quality[0].exclude == []  # /managers/0/exclude override
    # linked configs resolved relative to the pipeline yaml
    assert spec.dataset.ts_col == "time"
    assert spec.dataset.series_keys == ["conv_id"]
    assert spec.dataset.variables["temp"].fill_value == -9999
    assert spec.dataset.variables["temp"].attrs["units"] == "degC"
    # triggers
    assert spec.matches_input("2024/transcripts_day1.csv")
    assert not spec.matches_input("2024/metrics.parquet")
    # reader dispatch: first-regex-match (default_retriever.py:79-87)
    assert isinstance(match_reader("a/b.csv", spec.retriever.readers), CSVReader)
    assert isinstance(match_reader("a/b.parquet", spec.retriever.readers), ParquetReader)
    assert match_reader("a/b.nc", spec.retriever.readers) is None
    # converters instantiated from classname nodes
    time_rule = spec.retriever.rules["time"][0]
    assert isinstance(time_rule.converters[0], StringToDatetime)
    assert time_rule.converters[0].format == "%Y-%m-%d %H:%M:%S"
    temp_rule = spec.retriever.rules["temp"][0]
    assert temp_rule.pattern == ".*"  # per-input-key rule preserved
    assert isinstance(temp_rule.converters[0], UnitsConverter)
    assert temp_rule.converters[0].input_units == "degF"
    # multi-candidate source names
    assert spec.retriever.rules["text"][0].source_names == ["message", "text"]
    # quality managers wired onto the engine registries
    assert [m.name for m in spec.quality] == [
        "Require Valid Coordinate Variables", "Below Minimum Temp",
        "Above Maximum Temp", "Missing Text",
    ]
    assert spec.quality[0].apply_to == ["time", "conv_id"]  # COORDS expanded
    assert spec.quality[0].handlers == [("fail", 0.0)]
    assert spec.quality[1].handlers == [("record", "Bad")]
    # storage + datastream naming
    assert spec.storage.parameters["data_storage_path"] == "data/{datastream}"
    assert get_datastream(**spec.attrs) == "sgp.transcripts.b1"
    assert storage_path(spec.storage.data_storage_path, spec.attrs) == "data/sgp.transcripts.b1"


def test_pipeline_config_raises_config_error(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("dataset: {path: ./missing.yaml}\nretriever: {}\n")
    with pytest.raises((ConfigError, FileNotFoundError)):
        load_pipeline_yaml(bad)


def _write_csv(path) -> None:
    rows = [
        # timestamp, conversation, turn, role, message, tool, temperature_degF
        ("2024-01-01 00:00:00", "c1", 0, "user", "hello world", "", 32.0),
        ("2024-01-01 00:00:20", "c1", 1, "assistant", "hi", "", 212.0),
        ("2024-01-01 00:00:40", "c1", 2, "tool", "", "search", 50.0),
        ("2024-01-01 00:01:00", "c2", 0, "user", "question", "", -40.0),
        ("2024-01-01 00:01:30", "c2", 1, "assistant", "answer", "", 98.6),
    ]
    with open(path, "w") as f:
        f.write("timestamp,conversation,turn,role,message,tool,temperature_degF\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")


def test_yaml_pipeline_e2e_csv_ingest(spark, tmp_path):
    """pipeline.yaml → retrieve (CSV reader dispatch + StringToDatetime +
    UnitsConverter) → standardize → QC → store, all driven from yaml."""
    csv_path = str(tmp_path / "transcripts_day1.csv")
    _write_csv(csv_path)
    spec = load_pipeline_yaml(PIPELINE_YAML)
    assert spec.matches_input(csv_path)
    table = str(tmp_path / "out")

    res = spec.run(spark, [csv_path], table_path=table)
    rows = {(r["conv_id"], r["turn_idx"]): r for r in res.df.collect()}
    assert len(rows) == 5
    # degF -> degC conversion is pint-exact (test_retrievers.py:118-140 analog)
    assert abs(rows[("c1", 0)]["temp"] - 0.0) < 1e-9
    assert abs(rows[("c1", 1)]["temp"] - 100.0) < 1e-9
    assert abs(rows[("c2", 1)]["temp"] - 37.0) < 1e-9
    # StringToDatetime with explicit format
    assert str(rows[("c1", 1)]["time"]) == "2024-01-01 00:00:20"
    # QC bits: fail_range [0, 60] -> -40 degF (-40 degC) fails min (bit 1),
    # 212 degF (100 degC) fails max (bit 2)
    assert rows[("c2", 0)]["qc_temp"] == 1
    assert rows[("c1", 1)]["qc_temp"] == 2
    assert rows[("c1", 0)]["qc_temp"] == 0
    # missing-text check recorded on its own companion column
    assert rows[("c1", 2)]["qc_text"] == 1 and rows[("c1", 0)]["qc_text"] == 0
    # stored table + lineage manifest written
    assert res.manifests and res.manifests[0].n_rows == 5
    back = spark.read.parquet(table)
    assert back.count() == 5


def test_yaml_pipeline_zarr3_storage_roundtrip(spark, tmp_path):
    """zarr v3 as a yaml-selected storage format ('Zarr3Writer' classname →
    zarr_format=3): the stored group round-trips through the engine's own
    ZarrReader, string columns included (vlen-utf8)."""
    csv_path = str(tmp_path / "transcripts_z3.csv")
    _write_csv(csv_path)
    spec = load_pipeline_yaml(
        PIPELINE_YAML,
        overrides={
            "/storage/handler": {"writer": {
                "classname": "tsdat_spark.io.Zarr3Writer",
                "parameters": {"dim": "time", "order_by": ["time"],
                               "chunk_rows": 3},
            }}
        },
    )
    assert spec.storage.format == "zarr3"
    table = str(tmp_path / "out_z3")
    res = spec.run(spark, [csv_path], table_path=table)
    assert res.manifests and res.manifests[0].n_rows == 5

    import json as _json
    import os

    with open(os.path.join(table, "zarr.json")) as f:
        assert _json.load(f)["zarr_format"] == 3
    from tsdat_spark.io.zarr2 import ZarrReader

    back = ZarrReader(dim="time").read(spark, table).orderBy("time").collect()
    assert len(back) == 5
    assert back[0]["conv_id"] == "c1"


def test_yaml_pipeline_timezone_conversion(spark, tmp_path):
    """StringToDatetime timezone=US/Eastern input is normalized to UTC
    (string_to_datetime.py:63-68)."""
    csv_path = str(tmp_path / "transcripts_tz.csv")
    _write_csv(csv_path)
    spec = load_pipeline_yaml(
        PIPELINE_YAML,
        overrides=None,
    )
    # rebind the time converter to a non-UTC zone
    conv = spec.retriever.rules["time"][0].converters
    conv[0] = StringToDatetime(format=conv[0].format, timezone="America/New_York")
    res = spec.run(spark, [csv_path])
    first = res.df.where((F.col("conv_id") == "c1") & (F.col("turn_idx") == 0)).first()
    # 2024-01-01 00:00 EST == 2024-01-01 05:00 UTC
    assert str(first["time"]) == "2024-01-01 05:00:00"


def test_yaml_pipeline_csv_storage_roundtrip(spark, tmp_path):
    """CSVWriter as an engine sink (csv_writer.py:14-91 analog) registered
    via the yaml storage handler: PipelineSpec.run writes header CSV plus
    the global-attrs and per-variable-attrs sidecars (hidden '_' files), and
    the table round-trips through the engine's own CSVReader."""
    import csv as _csv
    import os

    csv_path = str(tmp_path / "transcripts_day2.csv")
    _write_csv(csv_path)
    spec = load_pipeline_yaml(
        PIPELINE_YAML,
        overrides={
            "/storage/handler": {"writer": {"classname": "tsdat.io.writers.CSVWriter"}}
        },
    )
    assert spec.storage.format == "csv"
    table = str(tmp_path / "out_csv")
    res = spec.run(spark, [csv_path], table_path=table)
    assert res.manifests and res.manifests[0].n_rows == 5

    # sidecars exist and carry the dataset attrs
    attrs = dict(r for r in _csv.reader(open(os.path.join(table, "_attrs.csv"))))
    assert attrs.get("location_id") == "sgp"
    var_rows = list(_csv.reader(open(os.path.join(table, "_var_attrs.csv"))))
    assert var_rows[0][0] == "name" and len(var_rows) > 1

    # round-trip through the engine CSV reader; '_' sidecars are invisible
    from tsdat_spark.io.readers import CSVReader

    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in res.df.schema.fields)
    back = CSVReader(schema=ddl, options={"timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"}).read(spark, table)
    assert back.count() == 5
    got = {(r["conv_id"], r["turn_idx"]): r for r in back.collect()}
    exp = {(r["conv_id"], r["turn_idx"]): r for r in res.df.collect()}
    assert got.keys() == exp.keys()
    for k in exp:
        assert abs(got[k]["temp"] - exp[k]["temp"]) < 1e-9
        assert got[k]["qc_temp"] == exp[k]["qc_temp"]
        assert got[k]["time"] == exp[k]["time"]


def test_cli_generate_schema(tmp_path, capsys):
    """tsdat CLI parity (tsdat/cli/cli.py:7-17): generate-schema writes the
    six yaml JSON schemas; acdd/ioos standards add required global attrs;
    the schemas validate the repo's own example pipeline yaml shape."""
    import json

    from tsdat_spark.cli import generate_schema, main

    written = generate_schema(str(tmp_path / "s"), "tsdat")
    assert len(written) == 6
    vap = json.load(open(tmp_path / "s" / "vap-retriever-schema.json"))
    fp = vap["properties"]["parameters"]["properties"]["fetch_parameters"]
    assert "time_padding" in fp["properties"]
    out = capsys.readouterr().out
    assert "tsdat dataset standards" in out and "Done!" in out

    main(["generate-schema", "--dir", str(tmp_path / "s2"), "--standards", "acdd"])
    assert "acdd dataset standards" in capsys.readouterr().out
    ds = json.load(open(tmp_path / "s2" / "dataset-schema.json"))
    assert "title" in ds["properties"]["attrs"]["required"]

    main(["generate-schema", "--dir", str(tmp_path / "s3"), "--standards", "ioos"])
    ds = json.load(open(tmp_path / "s3" / "dataset-schema.json"))
    assert "creator_country" in ds["properties"]["attrs"]["required"]

    # structural sanity: pipeline schema nests the others and requires the
    # sections load_pipeline_yaml requires
    pl = json.load(open(tmp_path / "s" / "pipeline-schema.json"))
    assert set(pl["required"]) == {"triggers", "retriever", "dataset", "storage"}


def test_yaml_plot_hook_renders_ancillary_svg(spark, tmp_path):
    """The hook_plot_dataset lifecycle slot as a yaml section
    (ingest_pipeline.py:79-87 analog, declared instead of subclassed):
    PipelineSpec.run M4-downsamples the stored dataset and lands SVG
    plots under the ancillary storage root at the templated datastream
    path."""
    import glob as _glob

    csv_path = str(tmp_path / "transcripts_day3.csv")
    _write_csv(csv_path)
    plot_root = str(tmp_path / "plots")
    spec = load_pipeline_yaml(
        PIPELINE_YAML,
        overrides={
            "/plot": {"variables": ["temp"], "bins": 16,
                      "storage_root": plot_root},
        },
    )
    assert spec.plot is not None and spec.plot.variables == ["temp"]
    res = spec.run(spark, [csv_path], table_path=str(tmp_path / "out"))
    assert res.manifests
    svgs = _glob.glob(f"{plot_root}/**/*.svg", recursive=True)
    assert len(svgs) == 1
    body = open(svgs[0], encoding="utf-8").read()
    assert body.startswith("<svg") and "temp" in body
    # the datastream template places it under <loc>.<name>.<level>/...
    assert "sgp.transcripts.b1" in svgs[0]


def test_yaml_plot_section_requires_variables():
    with pytest.raises(ConfigError):
        load_pipeline_yaml(PIPELINE_YAML, overrides={"/plot": {"bins": 8}})
