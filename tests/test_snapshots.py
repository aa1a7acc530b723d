"""Snapshot-versioned table layer (io/snapshots.py): append/overwrite
snapshots, one-manifest time travel, rollback-as-new-snapshot, expiry of
unreferenced files (including orphans from crashed commits), and the
lineage hook a resumable pipeline stamps into its manifests.
"""

from __future__ import annotations

import json
import os

import pytest

from tsdat_spark.io.snapshots import SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "v")


def test_append_time_travel_and_counts(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    assert t.current_snapshot_id() is None
    s1 = t.append(_df(spark, 0, 10), timestamp=1000.0)
    s2 = t.append(_df(spark, 10, 15), timestamp=2000.0)
    assert (s1.snapshot_id, s2.snapshot_id) == (1, 2)
    assert s2.parent_id == 1
    assert (s1.n_rows_total, s2.n_rows_total) == (10, 15)
    assert t.read(spark).count() == 15
    assert t.read(spark, snapshot_id=1).count() == 10           # time travel
    assert sorted(r["v"] for r in t.read(spark, 1).collect()) == list(range(10))
    hist = t.snapshots()
    assert [s.snapshot_id for s in hist] == [1, 2]
    assert all(s.operation == "append" for s in hist)


def test_overwrite_and_rollback(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_df(spark, 0, 10), timestamp=1.0)
    t.overwrite(_df(spark, 100, 103), timestamp=2.0)
    assert t.read(spark).count() == 3
    s3 = t.rollback(1, timestamp=3.0)
    assert s3.operation == "rollback" and s3.summary["rolled_back_to"] == 1
    assert t.read(spark).count() == 10                          # restored
    # history is never rewritten: the overwrite snapshot is still readable
    assert t.read(spark, snapshot_id=2).count() == 3


def test_expire_keeps_live_files_only(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root)
    t.append(_df(spark, 0, 5), timestamp=1.0)
    t.overwrite(_df(spark, 5, 8), timestamp=2.0)   # snap-1 files now dead
    # simulate a crashed commit: orphan data dir without a manifest
    orphan = os.path.join(root, "data", "snap-000099")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "wb") as f:
        f.write(b"x")
    out = t.expire(keep_last=1)
    assert out["deleted"] and out["data_dirs_removed"] == 2     # snap-1 + orphan
    assert t.read(spark).count() == 3                            # live data intact
    assert [s.snapshot_id for s in t.snapshots()] == [2]
    assert not os.path.exists(orphan)
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)


def test_manifest_is_full_state_single_read(tmp_path, spark):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_df(spark, 0, 2), timestamp=1.0)
    t.append(_df(spark, 2, 4), timestamp=2.0)
    m = json.load(open(os.path.join(str(tmp_path / "tbl"), "metadata", "snap-000002.json")))
    # one manifest carries the whole file list — time travel never walks history
    assert set(m["added_files"]) < set(m["files"])
    assert m["n_rows_total"] == 4 and m["n_rows_added"] == 2


def test_lineage_snapshot_id_stamp(spark, tmp_path):
    """The resume contract: a pipeline reading from a SnapshotTable stamps
    the snapshot id it consumed; re-running against the same snapshot is a
    no-op decision the caller can make from equality alone."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_df(spark, 0, 10), timestamp=1.0)
    consumed = t.current_snapshot_id()
    t.append(_df(spark, 10, 20), timestamp=2.0)
    assert t.current_snapshot_id() != consumed   # new data -> re-trigger
    df = t.read(spark, snapshot_id=consumed)     # but the old run's input
    assert df.count() == 10                      # is still exactly readable


def test_rollup_job_snapshot_short_circuit_and_incremental(spark, tmp_path):
    """Two-level resume: unchanged snapshot id -> zero Spark work; a new
    append re-triggers only via the normal per-day fingerprint path."""
    from pyspark.sql import functions as F

    from tsdat_spark.pipeline import run_rollup_job_snapshot

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select(F.col("user_id").cast("string").alias("conv_id"),
                  F.lit("toolA").alias("tool"), F.lit("user").alias("role"),
                  F.col("ts").cast("timestamp").alias("ts"),
                  F.col("value"), F.lit(3).alias("token_len"),
                  F.lit(1000).alias("latency_us")))
    tbl = SnapshotTable(str(tmp_path / "in"))
    tbl.append(ev.where(F.dayofmonth("ts") <= 5), timestamp=1.0)
    out = str(tmp_path / "tiers")

    r1 = run_rollup_job_snapshot(tbl, spark, out, tiers=("1h", "1d"))
    assert r1.written_days and r1.metrics["snapshot_unchanged"] is False
    assert r1.metrics["snapshot_id"] == 1

    r2 = run_rollup_job_snapshot(tbl, spark, out, tiers=("1h", "1d"))
    assert r2.metrics["snapshot_unchanged"] is True      # O(1): no Spark job
    assert not r2.written_days

    tbl.append(ev.where(F.dayofmonth("ts") == 6), timestamp=2.0)
    r3 = run_rollup_job_snapshot(tbl, spark, out, tiers=("1h", "1d"))
    assert r3.metrics["snapshot_unchanged"] is False
    assert r3.written_days == ["2024-01-06"]             # only the new day
    assert set(r3.skipped_days) >= {"2024-01-01", "2024-01-05"}


def test_stream_append_snapshots(spark, tmp_path):
    """Each micro-batch commits one snapshot; time travel sees the feed's
    history and the rollup short-circuit works between batches."""
    import pandas as pd

    from tsdat_spark.streaming import stream_append_snapshots

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({"conv_id": ["a", "b"], "v": [1, 2]}).to_parquet(src / "f1.parquet")
    tbl = SnapshotTable(str(tmp_path / "tbl"))
    q = stream_append_snapshots(
        spark, str(src), "conv_id string, v bigint", tbl,
        str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert tbl.read(spark).count() == 2
    sid1 = tbl.current_snapshot_id()
    assert tbl.snapshot(sid1).summary["stream_batch_id"] == 0

    pd.DataFrame({"conv_id": ["c"], "v": [3]}).to_parquet(src / "f2.parquet")
    q = stream_append_snapshots(
        spark, str(src), "conv_id string, v bigint", tbl,
        str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert tbl.read(spark).count() == 3           # only the new file landed
    assert tbl.read(spark, sid1).count() == 2     # history intact
