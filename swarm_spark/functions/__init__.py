from .ids import canonical_id_column, canonical_json, fast_id_column, log_id
from .timeutils import (
    PARTITION_COL,
    partition_value,
    timestamp_from_unix,
    validate_partition_unit,
)

__all__ = [
    "PARTITION_COL",
    "canonical_id_column",
    "canonical_json",
    "fast_id_column",
    "log_id",
    "partition_value",
    "timestamp_from_unix",
    "validate_partition_unit",
]
