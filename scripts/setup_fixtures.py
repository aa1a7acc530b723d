"""Materialize benchmark/correctness fixtures ahead of query runs, so every
``queries()`` entry is a pure read at execution time.

Usage: python scripts/setup_fixtures.py [sf_dir ...]
       (default: all three driver sf dirs)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from tsdat_spark.fixtures import ensure_events_csv  # noqa: E402
from tsdat_spark.session import get_spark  # noqa: E402


def main(sf_dirs: list[str]) -> None:
    spark = get_spark(cores=8, shuffle_partitions=8)
    for sf_dir in sf_dirs:
        path = ensure_events_csv(spark, sf_dir)
        print(f"{sf_dir} -> {path}")


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"
    ]
    main(dirs)
