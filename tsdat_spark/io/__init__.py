"""Storage: partitioned tier tables, lineage manifests, checkpoint/resume,
gorilla cold store."""

from .writers import (  # noqa: F401
    A2eCSVDatasetWriter,
    CSVDatasetWriter,
    iceberg_table_writer,
    read_tier,
    write_tier,
)
from .checkpoint import (  # noqa: F401
    completed_partitions,
    partition_manifests,
    resume_remaining,
    write_manifests,
)
from .coldstore import decode_cold_blocks, encode_cold_blocks  # noqa: F401
