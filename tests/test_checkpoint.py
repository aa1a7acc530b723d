"""Checkpoint/resume: manifests, partition-layout invariance, incremental
invalidation."""

import pytest
from pyspark.sql import functions as F

from tsdat_spark.io.checkpoint import (
    completed_partitions,
    partition_manifests,
    resume_remaining,
    write_manifests,
)
from tsdat_spark.io.writers import read_tier, write_tier
from tsdat_spark.synth import SynthSpec, generate_transcripts


@pytest.fixture(scope="module")
def days_df(spark):
    df = generate_transcripts(spark, SynthSpec(n_convs=20, base_turns=30, n_mega=0, mega_turns=0,
                                               conv_spacing_s=9000, turn_gap_s=1800))
    df.persist(); df.count()
    yield df
    df.unpersist()


def test_manifest_layout_invariance(days_df):
    m1 = {m.partition: m for m in partition_manifests(days_df, "ts")}
    m2 = {m.partition: m for m in partition_manifests(days_df.repartition(17), "ts")}
    assert m1.keys() == m2.keys()
    for k in m1:
        assert m1[k].content_hash == m2[k].content_hash
        assert m1[k].n_rows == m2[k].n_rows


def test_resume_skips_done_and_detects_changes(days_df, tmp_path):
    table = str(tmp_path / "tier")
    manifests = partition_manifests(days_df, "ts")
    assert len(manifests) >= 2
    # pretend the first day completed
    write_manifests(table, manifests[:1])
    assert set(completed_partitions(table)) == {manifests[0].partition}

    remaining, todo, skipped = resume_remaining(days_df, table, "ts")
    assert skipped == [manifests[0].partition]
    assert {m.partition for m in todo} == {m.partition for m in manifests[1:]}
    got_days = {r[0] for r in remaining.select(F.to_date("ts").cast("string")).distinct().collect()}
    assert got_days == {m.partition for m in manifests[1:]}

    # change the input for the "done" day → it must be invalidated
    changed = days_df.withColumn(
        "text", F.when(F.to_date("ts").cast("string") == manifests[0].partition, F.lit("CHANGED")).otherwise(F.col("text"))
    )
    _, todo2, skipped2 = resume_remaining(changed, table, "ts")
    assert manifests[0].partition in {m.partition for m in todo2}
    assert skipped2 == []


def test_fingerprint_sensitive_to_duplicate_multiplicity(spark):
    # {A,A,C} -> {B,B,C}: a bare XOR of row hashes cancels the identical
    # pair and misses the change; the sum component must catch it.
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    df_a = spark.createDataFrame([("A", t0), ("A", t0), ("C", t0)], "text string, ts timestamp")
    df_b = spark.createDataFrame([("B", t0), ("B", t0), ("C", t0)], "text string, ts timestamp")
    (ma,) = partition_manifests(df_a, "ts")
    (mb,) = partition_manifests(df_b, "ts")
    assert ma.n_rows == mb.n_rows == 3
    assert ma.content_hash != mb.content_hash
    assert ma.input_snapshot_id != mb.input_snapshot_id


def test_write_read_tier_roundtrip(days_df, tmp_path):
    path = str(tmp_path / "t1m")
    agg = days_df.groupBy("conv_id", F.date_trunc("hour", "ts").alias("bin_start")).count()
    write_tier(agg, path, ts_col="bin_start")
    back = read_tier(days_df.sparkSession, path)
    assert back.count() == agg.count()
    # partition pruning predicate works
    days = sorted(r[0] for r in back.select("p_date").distinct().collect())
    some = read_tier(days_df.sparkSession, path, start=str(days[-1]))
    assert 0 < some.count() < back.count()


def test_write_tier_injectable_table_writer(spark, tmp_path):
    """The catalog-table branch of write_tier is injectable (file_system_s3
    analog, untestable with real jars in-image): the stub receives the frame
    WITH the partition column, and the default parquet path is unaffected."""
    import datetime as dt

    from tsdat_spark.io.writers import (
        PARTITION_COL, iceberg_table_writer, read_tier, write_tier,
    )

    df = spark.createDataFrame(
        [("c1", dt.datetime(2024, 1, 2, 3), 5)],
        "conv_id string, bin_start timestamp, n_turns int",
    )

    calls = []
    write_tier(df, "cat.db.tier_1m", table_writer=lambda out, p: calls.append((out, p)))
    assert len(calls) == 1
    out, path = calls[0]
    assert path == "cat.db.tier_1m"
    assert PARTITION_COL in out.columns
    assert out.first()[PARTITION_COL] == dt.date(2024, 1, 2)

    # iceberg_table_writer itself: duck-typed writeTo chain, no jars needed
    chain = []
    class FakeWriter:
        def partitionedBy(self, col):
            chain.append("partitionedBy"); return self
        def createOrReplace(self):
            chain.append("createOrReplace")
    class FakeDF:
        def writeTo(self, table):
            chain.append(("writeTo", table)); return FakeWriter()
    iceberg_table_writer(FakeDF(), "cat.db.t")
    assert chain == [("writeTo", "cat.db.t"), "partitionedBy", "createOrReplace"]

    # parquet fallback still round-trips
    p = str(tmp_path / "tier")
    write_tier(df, p)
    assert read_tier(spark, p).count() == 1


def test_engine_sinks_write_through_registered_filesystem(spark, tmp_path):
    """Object-store readiness: registering a filesystem for a scheme ON THE
    DRIVER makes every sink PUT whole objects through it — including the
    binary part files now written INSIDE Spark tasks (the resolved FS
    object is pickled into the task closure, so no executor-side
    registration is needed). The stub models an object store the realistic
    way: scheme-path translation + whole-object PUTs to a backing store
    that worker processes can reach (a directory here; S3 in deployment)."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from tsdat_spark.io import fs as fsmod
    from tsdat_spark.io.checkpoint import PartitionManifest, write_manifests
    from tsdat_spark.io.hdf5_write import NetCDF4DatasetWriter

    root = str(tmp_path / "objstore")

    class StubObjectStore(fsmod.FileSystem):
        def _local(self, path):
            assert path.startswith("memsink://"), path
            return os.path.join(root, path[len("memsink://"):])
        def write_bytes(self, path, data):
            lp = self._local(path)
            os.makedirs(os.path.dirname(lp), exist_ok=True)
            with open(lp, "wb") as f:
                f.write(data)
        def makedirs(self, path):
            pass  # flat object store: no directory objects
        def exists(self, path):
            return os.path.exists(self._local(path))
        def read_bytes(self, path, length=None):
            with open(self._local(path), "rb") as f:
                return f.read() if length is None else f.read(length)
        def listdir(self, path):
            return sorted(os.listdir(self._local(path)))

    fsmod.register_filesystem("memsink", StubObjectStore())

    df = spark.range(100).select(
        F.col("id").alias("time"), (F.col("id") * 2.0).alias("v")
    )
    manifest = NetCDF4DatasetWriter(dim="time", partitions=2).write(
        df, "memsink://bucket/out"
    )
    # task-side writes return only (path, nbytes, rows) manifest rows
    assert len(manifest) == 2
    assert sum(r["rows"] for r in manifest) == 100
    assert all(r["path"].startswith("memsink://bucket/out/part-") for r in manifest)
    parts = [p for p in os.listdir(f"{root}/bucket/out") if p.endswith(".nc")]
    assert len(parts) == 2
    # the objects are real HDF5 files
    from tsdat_spark.io.hdf5 import read_hdf5

    total = 0
    for p in parts:
        with open(f"{root}/bucket/out/{p}", "rb") as f:
            total += len(read_hdf5(f.read())[2]["v"]["array"])
    assert total == 100

    write_manifests("memsink://bucket/tier", [
        PartitionManifest(partition="p0", n_rows=10, content_hash="h",
                          qc_counters={"missing": 1}, input_snapshot_id="s1"),
    ])
    with open(f"{root}/bucket/tier/_manifests/p0.json", "rb") as f:
        assert _json.loads(f.read().decode())["n_rows"] == 10

    # resume READS the same registry: manifests written to the object
    # store must be visible to completed_partitions (regression: the read
    # half used os.path.isdir and silently returned {} on s3-like paths)
    from tsdat_spark.io.checkpoint import completed_partitions

    done = completed_partitions("memsink://bucket/tier")
    assert set(done) == {"p0"} and done["p0"].input_snapshot_id == "s1"
