"""Retrieval: reader dispatch, per-input-key rules, multi-source priority
merge (perform_data_retrieval.py:20-99 semantics)."""

import pytest

from tsdat_spark.config import DatasetSpec, VariableSpec
from tsdat_spark.retrieval import perform_data_retrieval
from tsdat_spark.yaml_config import RetrieverSpec, VarRule


@pytest.fixture(scope="module")
def dataset():
    return DatasetSpec(
        name="merged",
        ts_col="time",
        series_keys=[],
        variables={
            "a": VariableSpec("a", "double"),
            "b": VariableSpec("b", "double"),
        },
    )


def _write_csv(path, header, rows):
    with open(path, "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")


def test_multi_source_priority_merge(spark, tmp_path, dataset):
    """Variable `a` exists in BOTH sources → the first input key supplies
    it; variable `b` only in the second → coalesced from there; rows align
    on the shared time coordinate via outer join."""
    k1 = str(tmp_path / "primary.csv")
    k2 = str(tmp_path / "secondary.csv")
    _write_csv(k1, "time,a", [(1, 10.0), (2, 20.0), (3, 30.0)])
    _write_csv(k2, "time,a,b", [(1, -1.0, 100.0), (2, -2.0, 200.0), (4, -4.0, 400.0)])

    retriever = RetrieverSpec(
        readers=[(r".*\.csv$", __import__("tsdat_spark.io.readers", fromlist=["CSVReader"]).CSVReader())],
        rules={
            "time": [VarRule(None, ["time"])],
            "a": [VarRule(None, ["a"])],
            "b": [VarRule(None, ["b"])],
        },
    )
    out = perform_data_retrieval(spark, [k1, k2], retriever, dataset)
    rows = {r["time"]: (r["a"], r["b"]) for r in out.collect()}
    # priority: `a` from k1 (never the -1/-2 in k2), `b` from k2
    assert rows[1] == (10.0, 100.0)
    assert rows[2] == (20.0, 200.0)
    assert rows[3] == (30.0, None)  # k2 has no t=3
    assert rows[4] == (None, 400.0)  # outer-join row only in k2


def test_per_input_key_rules(spark, tmp_path, dataset):
    """Per-key regex rules: the same output variable maps to different
    source columns depending on which input key is being read
    (input_key_retrieval_rules.py:13-36)."""
    k1 = str(tmp_path / "siteA.csv")
    k2 = str(tmp_path / "siteB.csv")
    _write_csv(k1, "time,temp_a", [(1, 1.5)])
    _write_csv(k2, "time,temp_b", [(2, 2.5)])

    from tsdat_spark.io.readers import CSVReader

    retriever = RetrieverSpec(
        readers=[(r".*\.csv$", CSVReader())],
        rules={
            "time": [VarRule(None, ["time"])],
            "a": [VarRule(r".*siteA.*", ["temp_a"]), VarRule(r".*siteB.*", ["temp_b"])],
        },
    )
    # priority assignment picks siteA's rule for `a`; swapping key order
    # flips the supplier — "first matching source supplies each variable"
    out1 = perform_data_retrieval(spark, [k1, k2], retriever, dataset)
    assert {r["a"] for r in out1.collect()} == {1.5}
    out2 = perform_data_retrieval(spark, [k2, k1], retriever, dataset)
    assert {r["a"] for r in out2.collect()} == {2.5}


def test_no_reader_match_raises(spark, tmp_path, dataset):
    from tsdat_spark.io.readers import read_input

    with pytest.raises(ValueError):
        read_input(spark, "input.netcdf", [(r".*\.csv$", None)])


def test_archive_readers_tar_and_zip(spark, tmp_path):
    """Tar/Zip archives of member CSVs, unpacked distributed-side
    (tar_reader.py:12-60 semantics incl. exclude patterns)."""
    import io
    import tarfile
    import zipfile

    member = "day1/data.csv"
    junk = "day1/__MACOSX/ignore.csv"
    csv_bytes = b"time,a\n1,10.5\n2,20.5\n"

    tar_path = str(tmp_path / "arch.tar")
    with tarfile.open(tar_path, "w") as tf:
        for name, data in ((member, csv_bytes), (junk, csv_bytes)):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    zip_path = str(tmp_path / "arch.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr(member, csv_bytes)
        zf.writestr(junk, csv_bytes)

    from tsdat_spark.io.readers import TarReader, ZipReader

    for reader, path in ((TarReader("time bigint, a double"), tar_path),
                         (ZipReader("time bigint, a double"), zip_path)):
        out = reader.read(spark, path).orderBy("time").collect()
        assert [(r["time"], r["a"]) for r in out] == [(1, 10.5), (2, 20.5)]  # junk excluded


def test_archive_reader_via_yaml_dispatch(spark, tmp_path):
    import zipfile

    zip_path = str(tmp_path / "bundle.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("x.csv", "time,a\n5,1.25\n")

    from tsdat_spark.io.readers import ZipReader, read_input

    readers = [(r".*\.zip$", ZipReader("time bigint, a double"))]
    out = read_input(spark, zip_path, readers).collect()
    assert len(out) == 1 and out[0]["a"] == 1.25


def test_winnow_fingerprints_shared_substring_guarantee(spark):
    """Winnowing guarantee (Schleimer et al. 2003): two documents sharing a
    run of >= window+n-1 tokens share at least one fingerprint; disjoint
    documents share none."""
    from tsdat_spark.text.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = window+n-1
    rows = [
        (1, f"intro words {shared} tail one"),
        (2, f"completely different start {shared}"),
        (3, "unrelated content with nothing matching at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps = winnow_fingerprints(df, n=3, window=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2]  # shared run detected
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_a2e_csv_reader(spark, tmp_path):
    """A2e metadata-header CSV (a2e_csv_reader.py:14-84): header=N pointer,
    key=value globals, var:attr=value metadata, dims from the filename."""
    from tsdat_spark.io.readers import A2eCSVReader, a2e_dims_from_filename, read_a2e_header

    content = "\n".join([
        "header=6",
        'title="Buoy met"',
        'location_id="z07"',
        "time:dtype=str",
        "temp:dtype=float64",
        'temp:units="degC"',
        "time,temp",
        "2022-11-17 00:10:00.000000,1.5",
        "2022-11-17 00:20:00.000000,2.5",
        "",
    ])
    name = "buoy.z07.a0.20221117.001000.metocean.time.1d.a2e.csv"
    path = str(tmp_path / name)
    with open(path, "w") as f:
        f.write(content)

    assert a2e_dims_from_filename(name) == ["time"]
    hdr, g, v, d, cols = read_a2e_header(path)
    assert hdr == 6 and g["title"] == "Buoy met" and g["location_id"] == "z07"
    assert v["temp"]["units"] == "degC" and d["temp"] == "float64"
    assert cols == ["time", "temp"]

    out = A2eCSVReader().read(spark, path).orderBy("time").collect()
    assert [r["temp"] for r in out] == [1.5, 2.5]
    assert str(out[0]["time"]) == "2022-11-17 00:10:00"
    assert dict(A2eCSVReader().read(spark, path).dtypes)["time"] == "timestamp"


def test_archive_mixed_members_and_prefilter(spark, tmp_path):
    """Inner-member dispatch (csv + json + jsonl members in one tar,
    tar_reader.py:12-108 inner-reader semantics) plus name-based
    pre-extraction filtering: an excluded member holds garbage bytes that
    would crash any parser — the scan succeeding proves it was filtered
    before extraction. A member missing a declared int column null-fills
    (nullable Int dtypes), and a parameterized decimal(10,2) DDL type
    parses via Catalyst fromDDL."""
    import io
    import tarfile

    members = {
        "a.csv": b"time,a,price\n1,10,1.25\n",
        "b.jsonl": b'{"time": 2, "a": 20, "price": 2.5}\n{"time": 3, "a": 30, "price": 3.75}\n',
        "c.json": b'[{"time": 4, "price": 4.5}]',  # missing int col a -> null
        "skip/huge.bin.csv": b"\x00\xff garbage not parseable as anything",
    }
    tar_path = str(tmp_path / "mixed.tar")
    with tarfile.open(tar_path, "w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    from tsdat_spark.io.readers import TarReader

    reader = TarReader(
        "time bigint, a int, price decimal(10,2)",
        exclude=(r"skip/.*",),
        add_member_col=True,
    )
    rows = reader.read(spark, tar_path).orderBy("time").collect()
    assert [(r["time"], r["a"], float(r["price"])) for r in rows] == [
        (1, 10, 1.25), (2, 20, 2.50), (3, 30, 3.75), (4, None, 4.50),
    ]
    assert {r["__member"] for r in rows} == {"a.csv", "b.jsonl", "c.json"}


def test_a2e_csv_writer_roundtrip(spark, tmp_path):
    """A2eCSVDatasetWriter (a2e_csv_writer.py:14-110 analog): every part is
    a self-describing metadata-header CSV that reads straight back through
    A2eCSVReader — attrs block layout (header=N, quoted string attrs,
    var:dtype lines) and microsecond timestamps round-trip exactly."""
    import datetime as dt

    from tsdat_spark.io.readers import A2eCSVReader, read_a2e_header
    from tsdat_spark.io.writers import A2eCSVDatasetWriter

    base = dt.datetime(2024, 6, 1, 12, 0, 0, 123456)
    rows = [(base + dt.timedelta(seconds=i), float(i) * 1.5, i * 10) for i in range(50)]
    df = spark.createDataFrame(rows, "time timestamp, temp double, qc bigint")

    out = str(tmp_path / "a2e_out")
    writer = A2eCSVDatasetWriter(
        attrs={"datastream": "sgp.metocean.b1", "header_rows": 3},
        var_attrs={"temp": {"units": "degC"}},
        partitions=3,
    )
    writer.write(df, out)

    # header block parses with the engine's own A2e header reader
    import glob
    part = sorted(glob.glob(f"{out}/*.csv"))[0]
    header_idx, gattrs, vattrs, dtypes, columns = read_a2e_header(part)
    assert gattrs["datastream"] == "sgp.metocean.b1"
    assert vattrs["temp"]["units"] == "degC"
    assert dtypes["temp"] == "float64" and dtypes["qc"] == "int64"
    assert columns == ["time", "temp", "qc"]

    back = A2eCSVReader().read(spark, out)
    got = sorted((r["time"], r["temp"], r["qc"]) for r in back.collect())
    exp = sorted(rows)
    assert len(got) == 50
    for g, e in zip(got, exp):
        assert g[0] == e[0] and g[1] == e[1] and g[2] == e[2]


def test_a2e_csv_writer_via_yaml_storage(spark, tmp_path):
    """storage handler writer: classname A2eCSVWriter selects the A2e sink
    in PipelineSpec.run (handler pairs, SURVEY §2.2 row 16)."""
    from tsdat_spark.yaml_config import _parse_storage

    spec = _parse_storage(
        {"classname": "tsdat.io.storage.FileSystem",
         "handler": {"writer": {"classname": "tsdat.io.writers.A2eCSVWriter"}}}
    )
    assert spec.format == "a2e_csv"
