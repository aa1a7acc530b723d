"""Tier-table storage.

tsdat stores one file per day with templated names
(``tsdat/io/storage/file_system.py:27-59,161-179``) and re-discovers them
by filename-date filtering (``:228-268``). The relational equivalent is a
date-partitioned table: the partition column IS the filename date, and
Catalyst partition pruning replaces the glob+filter.

Canonical format is Iceberg on a real deployment (snapshot ids give the
lineage manifests true input fingerprints; incremental reads replace
tsdat's ``modified_since``). The sandbox image has no Iceberg jars, so the
writer degrades to date-partitioned parquet with identical layout and an
explicit manifest sidecar (``checkpoint.py``) standing in for the snapshot
metadata. The code path is chosen at runtime behind an import/config probe.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "p_date"


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_tier(
    df: DataFrame,
    path: str,
    ts_col: str = "bin_start",
    mode: str = "overwrite",
    partition_overwrite: bool = True,
) -> None:
    """Write a tier table partitioned by days(ts_col).

    Dynamic partition overwrite makes re-runs idempotent per day-partition —
    the resume unit of the checkpoint protocol.
    """
    spark = df.sparkSession
    out = df.withColumn(PARTITION_COL, F.to_date(F.col(ts_col)))
    if _iceberg_available(spark):  # pragma: no cover - no jars in sandbox
        out.writeTo(path).partitionedBy(F.col(PARTITION_COL)).createOrReplace()
        return
    writer = out.write.partitionBy(PARTITION_COL).mode(mode)
    if partition_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def read_tier(
    spark: SparkSession,
    path: str,
    start: datetime | str | None = None,
    end: datetime | str | None = None,
) -> DataFrame:
    """Scan a tier table; the date predicate prunes partitions (tsdat's
    fetch_data time-range file filtering, for free from Catalyst)."""
    df = spark.read.parquet(path)
    if start is not None:
        df = df.where(F.col(PARTITION_COL) >= F.to_date(F.lit(start)))
    if end is not None:
        df = df.where(F.col(PARTITION_COL) <= F.to_date(F.lit(end)))
    return df
