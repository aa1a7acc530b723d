"""Ancillary-file storage: the reference's plot-upload lifecycle.

Mirrors ``tsdat/io/base/storage.py:150-300``:

- ``Storage.Parameters.ancillary_storage_path`` (default
  ``ancillary/{location_id}/{datastream}``) and
  ``ancillary_filename_template`` (default
  ``{datastream}.{yyyy}{mm}{dd}.{HH}{MM}{SS}.{title}.{extension}``) —
  rendered here with :func:`tsdat_spark.naming.render_template`, so the
  same ``[optional]`` bracket semantics apply.
- ``Storage.get_ancillary_filepath`` (``storage.py:156-…``) — resolves the
  templated path under a caller-supplied root dir.
- ``Storage.uploadable_dir`` (``storage.py:253-300``) — context manager
  yielding a temp dir; on exit every file written under it is copied to
  ``storage_root`` at its relative path. The copy goes through the
  ``tsdat_spark.io.fs`` scheme registry, so an object-store storage_root
  is one ``register_filesystem`` adapter away (same seam as data sinks).
"""

from __future__ import annotations

import contextlib
import os
import tempfile
from datetime import datetime
from typing import Generator

from ..naming import get_datastream, render_template
from .fs import get_filesystem

ANCILLARY_STORAGE_PATH = "ancillary/{location_id}/{datastream}"
ANCILLARY_FILENAME_TEMPLATE = "{datastream}.{yyyy}{mm}{dd}.{HH}{MM}{SS}.{title}.{extension}"


class AncillaryStorage:
    """Templated ancillary (plot) file storage over the FS seam."""

    def __init__(
        self,
        storage_root: str,
        ancillary_storage_path: str = ANCILLARY_STORAGE_PATH,
        filename_template: str = ANCILLARY_FILENAME_TEMPLATE,
    ):
        self.storage_root = storage_root.rstrip("/")
        self.ancillary_storage_path = ancillary_storage_path
        self.filename_template = filename_template

    def get_ancillary_filepath(
        self,
        title: str,
        root_dir: str,
        extension: str = "svg",
        attrs: dict | None = None,
        start: datetime | None = None,
    ) -> str:
        """Templated filepath under ``root_dir`` (typically the yield value
        of :meth:`uploadable_dir`). ``attrs`` supplies ``location_id`` /
        ``dataset_name`` / ``data_level`` etc.; ``datastream`` is derived
        when absent; ``start`` fills the timestamp fields."""
        mapping = dict(attrs or {})
        if "datastream" not in mapping:
            mapping["datastream"] = get_datastream(**mapping)
        if start is not None:
            mapping.update(
                yyyy=f"{start.year:04d}", mm=f"{start.month:02d}",
                dd=f"{start.day:02d}", HH=f"{start.hour:02d}",
                MM=f"{start.minute:02d}", SS=f"{start.second:02d}",
                date_time=start.strftime("%Y%m%d.%H%M%S"),
                year=f"{start.year:04d}", month=f"{start.month:02d}",
                day=f"{start.day:02d}",
            )
        mapping.update(title=title, extension=extension)
        subdir = render_template(self.ancillary_storage_path, mapping)
        fname = render_template(self.filename_template, mapping)
        path = os.path.join(root_dir, subdir, fname)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return path

    @contextlib.contextmanager
    def uploadable_dir(self) -> Generator[str, None, None]:
        """Yield a temp dir; on exit, copy every file under it to
        ``storage_root`` at its relative path (reference semantics:
        ``storage.py:294-300``)."""
        with tempfile.TemporaryDirectory(prefix="ancillary_") as tmp:
            yield tmp
            fs = get_filesystem(self.storage_root)
            for dirpath, _dirs, files in os.walk(tmp):
                for name in sorted(files):
                    src = os.path.join(dirpath, name)
                    rel = os.path.relpath(src, tmp)
                    target = f"{self.storage_root}/{rel}"
                    fs.makedirs(os.path.dirname(target))
                    with open(src, "rb") as f:
                        fs.write_bytes(target, f.read())

    def save_ancillary_file(self, filepath: str, target_path: str) -> None:
        """Copy one local file to ``target_path`` through the FS seam."""
        fs = get_filesystem(target_path)
        fs.makedirs(os.path.dirname(target_path))
        with open(filepath, "rb") as f:
            fs.write_bytes(target_path, f.read())
