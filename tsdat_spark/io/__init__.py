"""Storage: partitioned tier tables, lineage manifests, checkpoint/resume,
gorilla cold store."""

from .writers import read_tier, write_tier  # noqa: F401
from .checkpoint import (  # noqa: F401
    completed_partitions,
    partition_manifests,
    resume_remaining,
    write_manifests,
)
from .coldstore import decode_cold_blocks, encode_cold_blocks  # noqa: F401
