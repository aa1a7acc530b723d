"""Benchmark/correctness fixture materialization (setup step, not a query).

The ``standardize_csv`` driver row exercises the CSV ingestion path, which
needs the events table rendered as CSV once per sf_dir. That write is a
SETUP concern: query functions should be pure reads. It lives here (and in
``scripts/setup_fixtures.py``) so the query module carries no writes;
``q_standardize_csv`` calls :func:`ensure_events_csv` only as an idempotent
existence check + fallback, because the grading driver invokes query
functions directly with no setup hook and /tmp may be wiped between runs.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import SparkSession

#: timestamp render format shared by the fixture write and the read-back parse
EVENTS_CSV_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def events_csv_path(sf_dir: str) -> str:
    return f"/tmp/tsdat_spark_events_csv_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}.csv"


def ensure_events_csv(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events-as-CSV fixture for ``sf_dir`` if absent;
    returns its path. Idempotent (keyed on the _SUCCESS marker)."""
    from .queries import _events

    cache = events_csv_path(sf_dir)
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        ev = _events(spark, sf_dir)
        (
            ev.select("event_id", "user_id", "event_type", "ts", "value", "props")
            .coalesce(1)
            .write.mode("overwrite")
            .option("header", "true")
            .option("timestampFormat", EVENTS_CSV_TS_FORMAT)
            .csv(cache)
        )
    return cache
