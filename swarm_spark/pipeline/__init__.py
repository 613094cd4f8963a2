from .enqueue import (
    EnqueueResult,
    FileDumpPublisher,
    MemoryPublisher,
    Publisher,
    enqueue,
    list_local_objects,
)
from .ingest import META_DEST, IngestPartialFailure, IngestPipeline, IngestStats
from .migrate import apply_schema, migrate

__all__ = [
    "META_DEST",
    "EnqueueResult",
    "FileDumpPublisher",
    "IngestPartialFailure",
    "IngestPipeline",
    "IngestStats",
    "MemoryPublisher",
    "Publisher",
    "apply_schema",
    "enqueue",
    "list_local_objects",
    "migrate",
]
