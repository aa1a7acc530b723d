"""Snapshot-versioned parquet tables: append-only snapshots, manifest
lists, time-travel reads, rollback, orphan expiry.

The north rule's storage model is an Iceberg table — every write is a
snapshot whose manifest list pins the exact file set, readers bind to a
snapshot id, and lineage records ``input_snapshot_id``. The real Iceberg
runtime needs JVM jars this image doesn't ship, so this module implements
the *concepts* from the public Iceberg table-spec (snapshots, manifest
lists, a version-hint current pointer, time travel, expiry) as a minimal
from-scratch layer:

- data files are ordinary parquet written by Spark's own writer into an
  immutable per-snapshot directory ``data/snap-<seq>/`` — the 100 TB path
  stays entirely on Spark's distributed write/scan machinery;
- metadata is tiny JSON through the :mod:`tsdat_spark.io.fs` scheme
  registry (``metadata/snap-<seq>.json`` + ``metadata/version-hint.text``),
  so an object-store deployment is one ``register_filesystem`` call;
- each snapshot manifest carries the table's FULL file list (like an
  Iceberg manifest list), so time travel and rollback read exactly one
  JSON object regardless of history length;
- row counts ride an ``Observation`` on the write job — no second scan.

Commit protocol (single writer, documented like Iceberg without a
catalog lock): (1) write data files into a fresh snapshot dir, (2) PUT
the immutable manifest, (3) flip ``version-hint.text``. A crash between
(1) and (3) leaves an unreferenced dir/manifest that ``expire()`` sweeps;
readers never see partial state because they resolve files only through
a committed manifest.
"""

from __future__ import annotations

import json
import posixpath
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .fs import get_filesystem


@dataclass
class Snapshot:
    snapshot_id: int            # monotonically increasing sequence number
    parent_id: int | None
    operation: str              # append | overwrite | rollback
    timestamp: float
    files: list[str]            # FULL table state at this snapshot
    added_files: list[str]
    n_rows_added: int
    n_rows_total: int
    summary: dict = field(default_factory=dict)


class SnapshotTable:
    """A snapshot-versioned parquet table rooted at ``root``."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")
        self.fs = get_filesystem(self.root)
        self.fs.makedirs(self._meta_dir)

    # ------------------------------------------------------------ layout
    @property
    def _meta_dir(self) -> str:
        return posixpath.join(self.root, "metadata")

    def _manifest_path(self, sid: int) -> str:
        return posixpath.join(self._meta_dir, f"snap-{sid:06d}.json")

    @property
    def _hint_path(self) -> str:
        return posixpath.join(self._meta_dir, "version-hint.text")

    def _data_dir(self, sid: int) -> str:
        return posixpath.join(self.root, "data", f"snap-{sid:06d}")

    # ------------------------------------------------------------ reads
    def current_snapshot_id(self) -> int | None:
        if not self.fs.exists(self._hint_path):
            return None
        return int(self.fs.read_text(self._hint_path).strip())

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            raise FileNotFoundError(f"{self.root}: no committed snapshot")
        d = json.loads(self.fs.read_text(self._manifest_path(sid)))
        return Snapshot(**d)

    def snapshots(self) -> list[Snapshot]:
        """Committed history, oldest first (ancestry of the current hint)."""
        out: list[Snapshot] = []
        sid = self.current_snapshot_id()
        while sid is not None:
            s = self.snapshot(sid)
            out.append(s)
            sid = s.parent_id
        return list(reversed(out))

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Scan the table as of a snapshot (default: current). The file
        list comes from ONE manifest; the scan itself is Spark's ordinary
        distributed parquet read."""
        s = self.snapshot(snapshot_id)
        if not s.files:
            raise FileNotFoundError(f"{self.root}@{s.snapshot_id}: empty table")
        return spark.read.parquet(*s.files)

    # ------------------------------------------------------------ writes
    def _commit(self, snap: Snapshot) -> Snapshot:
        self.fs.write_text(self._manifest_path(snap.snapshot_id),
                           json.dumps(asdict(snap), indent=1))
        self.fs.write_text(self._hint_path, str(snap.snapshot_id))
        return snap

    def _next_id(self) -> int:
        cur = self.current_snapshot_id()
        return 1 if cur is None else cur + 1

    def _write_data(self, df: DataFrame, sid: int) -> tuple[list[str], int]:
        obs = Observation(f"snap-{sid}")
        out_dir = self._data_dir(sid)
        (df.observe(obs, F.count(F.lit(1)).alias("n"))
           .write.mode("errorifexists").parquet(out_dir))
        files = [posixpath.join(out_dir, f)
                 for f in self.fs.listdir(out_dir)
                 if f.endswith(".parquet")]
        return files, int(obs.get["n"])

    def append(self, df: DataFrame, timestamp: float | None = None,
               summary: dict | None = None) -> Snapshot:
        sid = self._next_id()
        parent = self.current_snapshot_id()
        prev_files, prev_rows = ([], 0)
        if parent is not None:
            p = self.snapshot(parent)
            prev_files, prev_rows = p.files, p.n_rows_total
        files, n = self._write_data(df, sid)
        return self._commit(Snapshot(
            snapshot_id=sid, parent_id=parent, operation="append",
            timestamp=timestamp if timestamp is not None else time.time(),
            files=prev_files + files, added_files=files,
            n_rows_added=n, n_rows_total=prev_rows + n,
            summary=summary or {}))

    def overwrite(self, df: DataFrame, timestamp: float | None = None,
                  summary: dict | None = None) -> Snapshot:
        """Replace the table contents; old files stay until ``expire``."""
        sid = self._next_id()
        files, n = self._write_data(df, sid)
        return self._commit(Snapshot(
            snapshot_id=sid, parent_id=self.current_snapshot_id(),
            operation="overwrite",
            timestamp=timestamp if timestamp is not None else time.time(),
            files=files, added_files=files,
            n_rows_added=n, n_rows_total=n, summary=summary or {}))

    def rollback(self, snapshot_id: int, timestamp: float | None = None) -> Snapshot:
        """New snapshot that restores an older file list (history is
        never rewritten — same contract as Iceberg rollback)."""
        target = self.snapshot(snapshot_id)
        sid = self._next_id()
        return self._commit(Snapshot(
            snapshot_id=sid, parent_id=self.current_snapshot_id(),
            operation="rollback",
            timestamp=timestamp if timestamp is not None else time.time(),
            files=list(target.files), added_files=[],
            n_rows_added=0, n_rows_total=target.n_rows_total,
            summary={"rolled_back_to": snapshot_id}))

    # ------------------------------------------------------------ expiry
    def expire(self, keep_last: int = 1) -> dict:
        """Drop all but the last ``keep_last`` snapshots from the reachable
        history and delete data files no kept snapshot references —
        including orphans from crashed commits. Local-scheme only for the
        actual deletes (object stores get the manifest of deletable keys
        back and delete out of band)."""
        import os
        import shutil

        history = self.snapshots()
        kept = history[-keep_last:] if keep_last > 0 else []
        keep_ids = {s.snapshot_id for s in kept}
        live = {f for s in kept for f in s.files}
        dropped_manifests, dropped_dirs = [], []
        for name in self.fs.listdir(self._meta_dir):
            if name.startswith("snap-") and int(name[5:11]) not in keep_ids:
                dropped_manifests.append(posixpath.join(self._meta_dir, name))
        data_root = posixpath.join(self.root, "data")
        if self.fs.exists(data_root):
            for d in self.fs.listdir(data_root):
                full = posixpath.join(data_root, d)
                refs = [f for f in live if f.startswith(full + "/")]
                if not refs:
                    dropped_dirs.append(full)
        # re-parent the oldest kept snapshot so the chain stays resolvable
        if kept and kept[0].parent_id is not None:
            oldest = kept[0]
            oldest.parent_id = None
            self.fs.write_text(self._manifest_path(oldest.snapshot_id),
                               json.dumps(asdict(oldest), indent=1))
        from .fs import LocalFileSystem

        deleted = isinstance(self.fs, LocalFileSystem)
        if deleted:
            for p in dropped_manifests:
                os.remove(p)
            for d in dropped_dirs:
                shutil.rmtree(d)
        return {"manifests_removed": len(dropped_manifests),
                "data_dirs_removed": len(dropped_dirs),
                "deleted": deleted,
                "deletable_manifests": dropped_manifests,
                "deletable_dirs": dropped_dirs}
