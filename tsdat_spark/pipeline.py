"""Pipeline composition: the tsdat run lifecycle on Spark.

tsdat's two entry points (SURVEY §3) map to:

- ``IngestPipeline.run`` (retrieve → standardize → hook → QC → store,
  ``tsdat/pipeline/pipelines/ingest_pipeline.py:34-49``) →
  :func:`run_ingest` — one lazy DataFrame program ending in a partitioned
  write + per-partition lineage manifests.
- ``TransformationPipeline.run`` (fetch padded range → transform grid →
  QC → store, ``tsdat/pipeline/pipelines/transformation_pipeline.py:29-75``)
  → :func:`run_rollup_job` — tier cascade with checkpoint/resume: only
  days whose input fingerprint changed are recomputed (tsdat's
  ``modified_since`` analog), and each run is idempotent per day partition
  (dynamic partition overwrite).

Fetch padding (``storage_retriever.py:182-209``): the input scan is
widened by ``pad_s`` beyond the requested range before transforms so edge
bins see their neighbors, then output is trimmed to the owned range —
:func:`padded_range`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DatasetSpec
from .io.checkpoint import partition_manifests, resume_remaining, write_manifests
from .io.writers import write_tier
from .qc.checkers import QCContext
from .qc.manager import QualityManager, apply_qc
from .rollup import reaggregate_tier, rollup_tier
from .standardize import standardize, with_token_len, with_turn_latency


def padded_range(
    df: DataFrame,
    ts_col: str,
    start: str | datetime,
    end: str | datetime,
    pad_s: float,
) -> DataFrame:
    """Widen the scan window by pad_s (pushed into the source scan), for
    callers that trim to [start, end] after their windowed transform."""
    lo = F.lit(start).cast("timestamp") - F.expr(f"INTERVAL {int(pad_s)} SECOND")
    hi = F.lit(end).cast("timestamp") + F.expr(f"INTERVAL {int(pad_s)} SECOND")
    return df.where((F.col(ts_col) >= lo) & (F.col(ts_col) <= hi))


@dataclass
class IngestResult:
    df: DataFrame
    qc_bits: dict
    manifests: list


def run_ingest(
    raw: DataFrame,
    spec: DatasetSpec,
    ctx: QCContext,
    managers: list[QualityManager],
    dedup_keys: list[str] | None = None,
    table_path: str | None = None,
    hook_customize: Callable[[DataFrame], DataFrame] | None = None,
    hook_finalize: Callable[[DataFrame], DataFrame] | None = None,
) -> IngestResult:
    """standardize → customize hook → QC → finalize hook → (store)."""
    df = standardize(raw, spec, dedup_keys=dedup_keys)
    df = with_token_len(df)
    df = with_turn_latency(df, conv_col="conv_id", ts_col=spec.ts_col)
    if hook_customize:
        df = hook_customize(df)
    df, bits = apply_qc(df, spec, ctx, managers)
    if hook_finalize:
        df = hook_finalize(df)
    manifests = []
    if table_path:
        write_tier(df, table_path, ts_col=spec.ts_col)
        manifests = partition_manifests(df, ts_col=spec.ts_col)
        write_manifests(table_path, manifests)
    return IngestResult(df, bits, manifests)


@dataclass
class RollupJobResult:
    written_days: list[str] = field(default_factory=list)
    skipped_days: list[str] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


def run_rollup_job(
    turns: DataFrame,
    out_root: str,
    series_keys: list[str] = ("conv_id", "tool", "role"),
    ts_col: str = "ts",
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
) -> RollupJobResult:
    """Checkpointed tier-cascade job (see module docstring).

    Writes ``{out_root}/tier_{t}`` for each tier; resume skips days whose
    input fingerprint is unchanged since the last successful run.
    """
    base_path = f"{out_root}/tier_{tiers[0]}"
    remaining, todo, skipped = resume_remaining(turns, base_path, ts_col=ts_col)
    result = RollupJobResult(skipped_days=skipped)
    if not todo:
        return result

    fine = rollup_tier(remaining, tiers[0], series_keys=series_keys, ts_col=ts_col).persist()
    write_tier(fine, base_path, ts_col="bin_start")
    write_manifests(base_path, todo)  # manifest carries the INPUT fingerprint
    result.written_days = [m.partition for m in todo]
    result.metrics[f"tier_{tiers[0]}_rows"] = fine.count()

    prev = fine
    for tier in tiers[1:]:
        coarser = reaggregate_tier(prev, tier, series_keys=series_keys).persist()
        path = f"{out_root}/tier_{tier}"
        write_tier(coarser, path, ts_col="bin_start")
        write_manifests(path, todo)
        result.metrics[f"tier_{tier}_rows"] = coarser.count()
        if prev is not fine:
            prev.unpersist()
        prev = coarser
    if prev is not fine:
        prev.unpersist()
    fine.unpersist()
    return result
