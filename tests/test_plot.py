"""M4 downsample + SVG rendering + ancillary (plot) storage lifecycle.

Covers the reference's ``hook_plot_dataset`` slot end to end:
``m4_downsample`` (tsdat_spark.plot) → ``render_timeseries_svg`` →
``AncillaryStorage.uploadable_dir`` (tsdat/io/base/storage.py:253-300
semantics), including object-store routing through the io.fs seam.
"""

from __future__ import annotations

import datetime as dt
import os
import xml.etree.ElementTree as ET

import pytest

from tsdat_spark.io.ancillary import AncillaryStorage
from tsdat_spark.plot import m4_downsample, plot_dataset, render_timeseries_svg


def _series_df(spark):
    # 1000 points over 1000 s, one spike up and one down inside bin ranges
    rows = []
    base = dt.datetime(2024, 1, 1)
    for i in range(1000):
        v = float(i % 17)
        if i == 123:
            v = 500.0
        if i == 877:
            v = -500.0
        rows.append((base + dt.timedelta(seconds=i), v, "a" if i % 2 else "b"))
    return spark.createDataFrame(rows, "ts timestamp, value double, series string")


def test_m4_keeps_extremes_and_bounds_output(spark):
    df = _series_df(spark)
    m4 = m4_downsample(df, "ts", "value", "2024-01-01", "2024-01-01T00:16:40",
                       width=10, series_keys=["series"]).collect()
    # ≤ width bins per series, and every bin's four points are in range
    assert len(m4) <= 20
    by_series = {}
    for r in m4:
        assert 0 <= r["bin"] < 10
        assert r["t_first"] <= r["t_last"]
        assert r["v_min"] <= min(r["v_first"], r["v_last"])
        assert r["v_max"] >= max(r["v_first"], r["v_last"])
        by_series.setdefault(r["series"], []).append(r)
    # the global extremes survive downsampling (the M4 guarantee)
    assert max(r["v_max"] for r in m4) == 500.0
    assert min(r["v_min"] for r in m4) == -500.0
    # spike timestamps are preserved as the argmax/argmin points
    t123 = int((dt.datetime(2024, 1, 1, 0, 2, 3) - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
    assert any(r["t_max"] == t123 and r["v_max"] == 500.0 for r in m4)


def test_m4_declared_range_filters_and_bins(spark):
    df = _series_df(spark)
    # narrow declared window: only points in [100 s, 200 s) survive
    m4 = m4_downsample(df, "ts", "value", "2024-01-01T00:01:40",
                       "2024-01-01T00:03:20", width=4).collect()
    assert sum(r["n_points"] for r in m4) == 100
    assert {r["bin"] for r in m4} == {0, 1, 2, 3}


def test_m4_rejects_empty_range(spark):
    with pytest.raises(ValueError):
        m4_downsample(_series_df(spark), "ts", "value",
                      "2024-01-02", "2024-01-01")


def test_svg_renderer_well_formed_and_deterministic(spark):
    df = _series_df(spark)
    rows = [r.asDict() for r in m4_downsample(
        df, "ts", "value", "2024-01-01", "2024-01-01T00:16:40",
        width=16, series_keys=["series"]).collect()]
    svg1 = render_timeseries_svg(rows, title="demo", series_key="series")
    svg2 = render_timeseries_svg(list(reversed(rows)), title="demo",
                                 series_key="series")
    assert svg1 == svg2  # input order never changes the rendering
    root = ET.fromstring(svg1)
    polylines = [e for e in root.iter() if e.tag.endswith("polyline")]
    assert len(polylines) == 2  # one per series
    # every coordinate inside the canvas
    for p in polylines:
        for pair in p.attrib["points"].split():
            x, y = map(float, pair.split(","))
            assert 0 <= x <= 800 and 0 <= y <= 240
    assert "demo" in svg1


def test_svg_empty_input():
    svg = render_timeseries_svg([])
    assert "no data" in svg and ET.fromstring(svg) is not None


def test_plot_dataset_end_to_end(spark):
    svg = plot_dataset(_series_df(spark), "ts", "value", "2024-01-01",
                       "2024-01-01T00:16:40", series_key="series",
                       title="values")
    assert svg.startswith("<svg") and "polyline" in svg


def test_ancillary_uploadable_dir_templates_and_uploads(tmp_path):
    store = AncillaryStorage(str(tmp_path / "rootdir"))
    attrs = {"location_id": "sgp", "dataset_name": "turns", "data_level": "a1"}
    start = dt.datetime(2024, 3, 4, 5, 6, 7)
    with store.uploadable_dir() as tmp:
        p = store.get_ancillary_filepath("wind_speed", tmp, extension="svg",
                                         attrs=attrs, start=start)
        with open(p, "w") as f:
            f.write("<svg/>")
    expect = (tmp_path / "rootdir" / "ancillary" / "sgp" / "sgp.turns.a1" /
              "sgp.turns.a1.20240304.050607.wind_speed.svg")
    assert expect.is_file() and expect.read_text() == "<svg/>"


def test_ancillary_upload_routes_through_fs_seam(tmp_path):
    """An object-store storage_root goes through the registered scheme
    filesystem — the same seam as the data sinks."""
    from tsdat_spark.io import fs as fsmod

    writes: dict[str, bytes] = {}

    class StubFS(fsmod.FileSystem):
        def write_bytes(self, path, data):
            writes[path] = data

        def makedirs(self, path):
            pass

    fsmod.register_filesystem("memplot", StubFS())
    try:
        store = AncillaryStorage("memplot://bucket/root")
        attrs = {"location_id": "nsa", "dataset_name": "ts", "data_level": "b1"}
        with store.uploadable_dir() as tmp:
            p = store.get_ancillary_filepath("t", tmp, attrs=attrs,
                                             start=dt.datetime(2024, 1, 1))
            with open(p, "w") as f:
                f.write("x")
    finally:
        fsmod._REGISTRY.pop("memplot", None)
    assert list(writes) == [
        "memplot://bucket/root/ancillary/nsa/nsa.ts.b1/"
        "nsa.ts.b1.20240101.000000.t.svg"
    ]
    assert writes[list(writes)[0]] == b"x"


def test_pipeline_hook_plot_receives_final_df(spark, tmp_path):
    """The hook_plot slot + AncillaryStorage compose into the reference's
    plot lifecycle: plot AFTER storage, artifact lands under storage_root."""
    from tsdat_spark.pipeline import run_ingest
    from tsdat_spark.config import DatasetSpec, VariableSpec
    from tsdat_spark.qc.checkers import QCContext

    df = _series_df(spark).withColumnRenamed("series", "conv_id")
    spec = DatasetSpec(
        name="plotdemo", ts_col="ts",
        variables={"value": VariableSpec("value", "double")},
    )
    store = AncillaryStorage(str(tmp_path / "store"))
    attrs = {"location_id": "loc", "dataset_name": "plotdemo", "data_level": "a1"}

    def hook_plot(final_df):
        with store.uploadable_dir() as tmp:
            p = store.get_ancillary_filepath(
                "value", tmp, attrs=attrs, start=dt.datetime(2024, 1, 1))
            with open(p, "w") as f:
                f.write(plot_dataset(final_df, "ts", "value", "2024-01-01",
                                     "2024-01-01T00:16:40"))

    run_ingest(df, spec, QCContext(), [], hook_plot=hook_plot)
    found = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path / "store")
             for f in fs]
    assert len(found) == 1 and found[0].endswith("value.svg")
    assert open(found[0]).read().startswith("<svg")
